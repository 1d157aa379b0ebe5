package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Corpus, Scale}

/** Round-5 wave 10: distributed global numbering, cross-source quantile
  * normalization, deterministic weighted sampling.
  */
object R5jQueries {

  /** Global corpus numbering + quartile buckets WITHOUT a single-task
    * global window: Scale.globalRowNumber's telescoped bucketing, with
    * the quartile as exact integer math over (rank, N). */
  private val q168 = QueryDef(
    "q168_global_rank",
    (s, d) => {
      val ranked = Scale.globalRowNumber(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        "n_chars", "doc_id")
      val n = ranked.agg(count(lit(1)).as("__N"))
      ranked.crossJoin(broadcast(n))
        .withColumn("quartile",
          expr("cast(((global_rn - 1) * 4) div __N as int) + 1"))
        .drop("__N")
    },
    Some("""
      WITH r AS (SELECT doc_id, n_chars,
              row_number() OVER (ORDER BY n_chars, doc_id) AS global_rn
            FROM documents WHERE n_chars IS NOT NULL),
      n AS (SELECT count(*) AS N FROM r)
      SELECT doc_id, n_chars, CAST(global_rn AS BIGINT) AS global_rn,
             CAST(((global_rn - 1) * 4) // N AS INT) + 1 AS quartile
      FROM r CROSS JOIN n"""))

  /** Cross-source quantile normalization of the n_chars score: every
    * source mapped onto the pooled distribution by integer rank math
    * (see Corpus.quantileNormalizeScores). */
  private val q169 = QueryDef(
    "q169_quantile_normalize",
    (s, d) => Corpus.quantileNormalizeScores(Tables.documents(s, d),
      "doc_id", "source", col("n_chars")),
    Some("""
      WITH s AS (SELECT doc_id, source, n_chars AS score FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY source
                ORDER BY score, doc_id) AS rs,
              count(*) OVER (PARTITION BY source) AS ns
            FROM s),
      g AS (SELECT score AS normalized_score,
              row_number() OVER (ORDER BY score, doc_id) AS grn
            FROM s),
      n AS (SELECT count(*) AS N FROM s),
      i AS (SELECT r.*, CASE WHEN ns > 1
                THEN 1 + ((rs - 1) * (N - 1)) // (ns - 1)
                ELSE 1 + (N - 1) // 2 END AS idx
            FROM r CROSS JOIN n)
      SELECT doc_id, source, score, normalized_score
      FROM i JOIN g ON i.idx = g.grn"""))

  private val SampleK = 20

  /** Deterministic weighted per-source sample (A-ES with the md5 draw):
    * exactly k docs per source, heavier docs proportionally favored,
    * bit-identical across engines and re-runs. */
  private val q170 = QueryDef(
    "q170_weighted_sample",
    (s, d) => Corpus.weightedSampleK(
      Tables.documents(s, d).select("doc_id", "source", "n_chars"),
      "doc_id", "source", col("n_chars"), SampleK, seed = "r5j"),
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(h, $j, 1)) - 1)"
      val hash48 = (0 until 12)
        .map(k => s"${BigInt(16).pow(11 - k)}*${nib(k + 1)}")
        .mkString(" + ")
      s"""
      WITH t AS (SELECT doc_id, source, n_chars,
              md5('r5j:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0),
      u AS (SELECT doc_id, source, n_chars,
              CAST(floor(ln((CAST($hash48 AS BIGINT) + 1.0)
                / 281474976710656.0) * 1073741824.0) AS BIGINT) AS lp
            FROM t),
      k AS (SELECT *, CAST(lp AS DOUBLE) / CAST(n_chars AS DOUBLE)
              AS wkey FROM u),
      r AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY wkey DESC, doc_id) AS rn FROM k)
      SELECT doc_id, source, n_chars, wkey FROM r WHERE rn <= $SampleK"""
    })

  val all: Seq[QueryDef] = Seq(q168, q169, q170)
}
