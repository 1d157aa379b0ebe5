package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.{Cdc, Stats}

/** Round-6 wave 19: incremental view maintenance, corpus-shape fitting,
  * and dictionary-free readability.
  *
  * q235 maintains a materialized fact⋈dim join under insert-only deltas
  * without ever re-joining old×old (the delta-rule identity every
  * warehouse's incremental MV refresh runs on); q236 fits the Zipf
  * slope of the term-frequency head (the one-number "does this corpus
  * still look like natural language" diagnostic); q237 scores documents
  * with the Flesch reading-ease formula on a vowel-group syllable
  * heuristic.
  */
object R6qQueries {

  private val DeltaCut = "2001-01-01"
  private val JoinCols = Seq("o_orderkey", "o_custkey", "o_totalprice",
    "c_name", "c_mktsegment")

  /** Insert-only delta maintenance of orders⋈customer: late orders and
    * every-20th customer arrive as deltas; output must equal the full
    * re-join (the oracle). */
  private val q235 = QueryDef(
    "q235_delta_join_maintenance",
    (s, d) => {
      val orders = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val isDeltaF = col("o_orderdate").isNotNull &&
        col("o_orderdate") >= lit(DeltaCut).cast("timestamp")
      val isDeltaD = coalesce(col("c_custkey") % 20 === 0, lit(false))
      val fOld = orders.filter(!isDeltaF)
      val fNew = orders.filter(isDeltaF)
      val dOld = cust.filter(!isDeltaD)
      val dNew = cust.filter(isDeltaD)
      val cond = (f: DataFrame, dd: DataFrame) =>
        f("o_custkey") === dd("c_custkey")
      val materialized = fOld
        .join(dOld, fOld("o_custkey") === dOld("c_custkey"))
        .select(JoinCols.map(col): _*)
      Cdc.deltaJoinMaintain(materialized, fOld, fNew, dOld, dNew, cond,
        JoinCols)
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
      FROM orders JOIN customer ON o_custkey = c_custkey"""))

  private val ZipfTopN = 2000

  /** Zipf head fit over document unigrams (grid-snapped logs, exact
    * integer OLS, floor-scaled slope ratio). */
  private val q236 = QueryDef(
    "q236_zipf_fit",
    (s, d) => Stats.zipfFit(Tables.documents(s, d), "text", ZipfTopN),
    Some(s"""
      WITH tk AS (SELECT unnest(${ExtQueries.oToks("text")}) AS term
             FROM documents),
      c AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
            FROM tk GROUP BY 1),
      top AS (SELECT term, freq,
                CAST(row_number() OVER (ORDER BY freq DESC, term)
                  AS BIGINT) AS rank
              FROM c ORDER BY freq DESC, term LIMIT $ZipfTopN),
      g AS (SELECT
              CAST(floor(ln(CAST(rank AS DOUBLE)) * 1048576.0) AS BIGINT)
                AS lx,
              CAST(floor(ln(CAST(freq AS DOUBLE)) * 1048576.0) AS BIGINT)
                AS ly
            FROM top),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(lx) AS HUGEINT) AS sx,
              CAST(sum(ly) AS HUGEINT) AS sy,
              CAST(sum(lx * ly) AS HUGEINT) AS sxy,
              CAST(sum(lx * lx) AS HUGEINT) AS sxx
            FROM g),
      s AS (SELECT n, sx, sy,
              ((n * sxy - sx * sy) * 1073741824)
                // (n * sxx - sx * sx) AS slope_scaled
            FROM a)
      SELECT n AS n_terms,
        CAST(slope_scaled AS DOUBLE) / 1073741824.0 AS slope,
        (CAST(sy AS DOUBLE) / 1048576.0
          - (CAST(slope_scaled AS DOUBLE) / 1073741824.0)
            * (CAST(sx AS DOUBLE) / 1048576.0)) / CAST(n AS DOUBLE)
          AS intercept
      FROM s"""))

  /** Flesch reading ease per document (vowel-group syllable heuristic;
    * per-row fixed-shape arithmetic only — no cross-row float sums). */
  private val q237 = QueryDef(
    "q237_readability",
    (s, d) => {
      val toks = TextFunctions.tokens(col("text"))
      val base = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(toks).as("n_words"),
          size(TextFunctions.sentences(col("text"))).as("n_sentences"),
          TextFunctions.syllableCount(toks).as("n_syllables"))
      base.withColumn("flesch",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double")
              / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double")
              / col("n_words").cast("double"))))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, text, ${ExtQueries.oToks("text")} AS w
             FROM documents WHERE text IS NOT NULL),
      r AS (SELECT doc_id,
              CAST(len(w) AS INT) AS n_words,
              CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                s -> trim(s) <> '')) AS INT) AS n_sentences,
              CAST(COALESCE(list_sum(list_transform(w,
                x -> len(regexp_extract_all(lower(x), '[aeiouy]+')))), 0)
                AS INT) AS n_syllables
            FROM t)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        CASE WHEN n_words > 0 AND n_sentences > 0
          THEN 206.835
            - 1.015 * (CAST(n_words AS DOUBLE)
              / CAST(n_sentences AS DOUBLE))
            - 84.6 * (CAST(n_syllables AS DOUBLE)
              / CAST(n_words AS DOUBLE)) END AS flesch
      FROM r"""))

  val all: Seq[QueryDef] = Seq(q235, q236, q237)
}
