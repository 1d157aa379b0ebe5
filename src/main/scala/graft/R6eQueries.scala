package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.{Corpus, Quality, Similarity}

/** Round-6 wave 7: curriculum ordering, coreset representatives, and
  * deterministic bootstrap confidence intervals.
  *
  * q200 is the data-ORDERING step between curation and sharding
  * (difficulty bands cycled so every training slice sees the full
  * mix); q201 selects the budgeted labeling/distillation subset per
  * IVF cell; q202 closes the experimentation stack with reproducible
  * Poisson-bootstrap CIs (hash draws — a real RNG would differ per
  * engine and partitioning).
  */
object R6eQueries {

  /** Interleaved difficulty-curriculum order over documents, score =
    * whitespace token count (Corpus.curriculumOrder). */
  private val q200 = QueryDef(
    "q200_curriculum_order",
    (s, d) => Corpus.curriculumOrder(
      Tables.documents(s, d).filter(col("text").isNotNull),
      "doc_id", size(TextFunctions.tokens(col("text")))),
    Some(s"""
      WITH t AS (SELECT doc_id,
              CAST(len(${ExtQueries.oToks("text")}) AS INT) AS score
            FROM documents WHERE text IS NOT NULL),
      r AS (SELECT doc_id, score,
              row_number() OVER (ORDER BY score, doc_id) AS rn,
              COUNT(*) OVER () AS tot
            FROM t),
      b AS (SELECT doc_id, score,
              CAST(((rn - 1) * 10) // tot AS INT) AS band
            FROM r),
      rr AS (SELECT doc_id, score, band,
              row_number() OVER (PARTITION BY band
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS round
            FROM b)
      SELECT doc_id, score, band, round,
        CAST(row_number() OVER (ORDER BY round * 10 + band, doc_id)
          AS BIGINT) AS curriculum_pos
      FROM rr"""))

  private val IvfK = 8

  /** Top-3 most-central members per IVF cell — the labeling/distillation
    * coreset (Similarity.clusterRepresentatives). */
  private val q201 = QueryDef(
    "q201_cluster_medoids",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.clusterRepresentatives(e, "vec_id", "embedding",
        Similarity.ivfCentroids(e, "vec_id", "embedding", IvfK), k = 3)
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS centroid_id, embedding AS cemb
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $IvfK),
      sc AS (SELECT e.vec_id, c.centroid_id,
              ${ExtQueries.oCos("e.embedding", "c.cemb")} AS cos
            FROM embeddings e CROSS JOIN cent c),
      rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY cos DESC, centroid_id) AS rn
            FROM sc),
      a AS (SELECT vec_id, centroid_id, cos AS centroid_cos
            FROM rk WHERE rn = 1),
      g AS (SELECT *,
              CAST(COUNT(*) OVER (PARTITION BY centroid_id) AS BIGINT)
                AS n_members,
              CAST(row_number() OVER (PARTITION BY centroid_id
                ORDER BY centroid_cos DESC, vec_id) AS INT) AS rep_rank
            FROM a)
      SELECT centroid_id, rep_rank, vec_id, centroid_cos, n_members
      FROM g WHERE rep_rank <= 3"""))

  /** Hash-deterministic Poisson-bootstrap CIs of order value per
    * experiment arm (Quality.bootstrapCi; arms = the q58-style md5
    * split of customers). */
  private val q202 = QueryDef(
    "q202_bootstrap_ci",
    (s, d) => {
      val bucket = conv(substring(md5(col("o_custkey").cast("string")),
        1, 4), 16, 10).cast("int") % 100
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        when(bucket < 50, "A").otherwise("B").as("arm"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
      Quality.bootstrapCi(o, col("arm"), col("o_orderkey"), col("v"),
          reps = 100)
        .withColumnRenamed("grp", "arm")
    },
    Some {
      val nibC = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(o_custkey AS " +
          s"VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nibC(1)} + 256*${nibC(2)} + 16*${nibC(3)} + " +
          s"${nibC(4)} AS INT) % 100"
      val nibH = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(hh, $j, 1)) - 1)"
      val hash48 = (0 until 12)
        .map(k => s"${BigInt(16).pow(11 - k)}*${nibH(k + 1)}")
        .mkString(" + ")
      val cdf = Quality.PoissonCdf1
      val wCase = "CASE " + cdf.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString(" ") + " ELSE 7 END"
      s"""
      WITH o AS (SELECT o_orderkey,
              CASE WHEN $bucket < 50 THEN 'A' ELSE 'B' END AS arm,
              CAST(o_totalprice AS DECIMAL(18,2)) AS x
            FROM orders),
      r AS (SELECT arm, o_orderkey, x,
              unnest(generate_series(0, 99)) AS rep
            FROM o),
      h AS (SELECT arm, rep, x,
              md5('bs:' || CAST(o_orderkey AS VARCHAR) || ':'
                || CAST(rep AS VARCHAR)) AS hh
            FROM r),
      uu AS (SELECT arm, rep, x,
              CAST($hash48 AS BIGINT) / 281474976710656.0 AS u
            FROM h),
      ww AS (SELECT arm, rep, x, CAST($wCase AS BIGINT) AS w FROM uu),
      rm AS (SELECT arm, rep,
              CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS m
            FROM ww GROUP BY 1, 2 HAVING SUM(w) > 0),
      ord AS (SELECT arm, m,
              row_number() OVER (PARTITION BY arm ORDER BY m, rep) AS r,
              CAST(COUNT(*) OVER (PARTITION BY arm) AS BIGINT) AS nr
            FROM rm),
      sel AS (SELECT arm, m, r, nr,
              CAST(floor(0.025 * (nr - 1)) AS BIGINT) + 1 AS ilo,
              CAST(floor(0.975 * (nr - 1)) AS BIGINT) + 1 AS ihi
            FROM ord),
      b AS (SELECT arm, MAX(CASE WHEN r = ilo THEN m END) AS ci_lo,
              MAX(CASE WHEN r = ihi THEN m END) AS ci_hi,
              MAX(nr) AS n_reps
            FROM sel GROUP BY 1),
      p AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
            FROM o GROUP BY 1)
      SELECT p.arm, p.n, p.mean, b.ci_lo, b.ci_hi, b.n_reps
      FROM p LEFT JOIN b USING (arm)"""
    })

  val all: Seq[QueryDef] = Seq(q200, q201, q202)
}
