package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Similarity, Sketches}

/** Round-6 wave 18: compressed-representation serving — product
  * quantization for vectors and HyperLogLog registers for distinct
  * counts.
  *
  * q232/q233 are the PQ pair: assign every embedding M subspace codes
  * (a dim·4/M storage cut), then serve top-k with asymmetric-distance
  * lookups against those codes; q234 is the mergeable distinct-count
  * sketch (per-source registers max-merge into the global estimate —
  * the rollup no exact counter can do without a re-scan), audited
  * against exact counts.
  */
object R6pQueries {

  private val PqK = 16
  private val PqM = 4
  private val Dim = ExtQueries.OracleEmbDim
  private val SubDim = Dim / PqM
  private val AdcQueryVec = 1
  private val AdcTopK = 50

  /** Unrolled exact-shape squared-L2 over subspace `m` (the oDot
    * discipline: leading 0.0, left-assoc sum). */
  private def oSubDist(a: String, c: String, m: Int): String =
    "0.0 + " + (1 to SubDim).map { i =>
      val idx = m * SubDim + i
      val d = s"(CAST($a[$idx] AS DOUBLE) - CAST($c[$idx] AS DOUBLE))"
      s"$d * $d"
    }.mkString(" + ")

  // shared CTE chain: deterministic codebook + per-(vector, subspace)
  // nearest-code selection
  private def oPqSel = {
    val cand = (0 until PqM).map { m =>
      s"""SELECT e.vec_id, $m AS subspace, cb.code,
            (${oSubDist("e.embedding", "cb.c", m)}) AS dist
          FROM e CROSS JOIN cb"""
    }.mkString("\n          UNION ALL ")
    s"""
      e AS (SELECT vec_id, embedding FROM embeddings
            WHERE embedding IS NOT NULL),
      cb AS (SELECT CAST(row_number() OVER (ORDER BY hh, cid) - 1 AS INT)
                AS code, c
             FROM (SELECT vec_id AS cid, embedding AS c,
                     md5(CAST(vec_id AS VARCHAR)) AS hh
                   FROM e ORDER BY hh, cid LIMIT $PqK)),
      cand AS ($cand),
      sel AS (SELECT vec_id, subspace, code, dist,
                row_number() OVER (PARTITION BY vec_id, subspace
                  ORDER BY dist, code) AS rk
              FROM cand)"""
  }

  /** PQ code assignment over the embeddings corpus (K=16 codes drawn by
    * md5 order, M=4 subspaces of 16 dims). */
  private val q232 = QueryDef(
    "q232_pq_assign",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqAssign(emb, "vec_id", "embedding",
        Similarity.pqCodebook(emb, "vec_id", "embedding", PqK), Dim, PqM)
    },
    Some(s"""
      WITH ${oPqSel}
      SELECT vec_id, subspace, code, dist FROM sel WHERE rk = 1"""))

  /** PQ-ADC top-k for one full-precision query against the coded
    * corpus (fixed-order 4-term distance sum). */
  private val q233 = QueryDef(
    "q233_pq_adc_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        Similarity.pqCodebook(emb, "vec_id", "embedding", PqK), Dim, PqM,
        col("vec_id") === AdcQueryVec, AdcTopK)
    },
    Some {
      val adc = (0 until PqM).map { m =>
        s"""SELECT q_id, $m AS subspace, cb.code,
              (${oSubDist("q.qe", "cb.c", m)}) AS qdist
            FROM q CROSS JOIN cb"""
      }.mkString("\n          UNION ALL ")
      val dCols = (0 until PqM).map(m =>
        s"sum(CASE WHEN subspace = $m THEN qdist END) AS d$m").mkString(", ")
      val dSum = (0 until PqM).map(m => s"d$m").mkString(" + ")
      s"""
      WITH ${oPqSel},
      q AS (SELECT vec_id AS q_id, embedding AS qe FROM e
            WHERE vec_id = $AdcQueryVec),
      adc AS ($adc),
      codes AS (SELECT vec_id AS n_id, subspace, code FROM sel
                WHERE rk = 1),
      j AS (SELECT q_id, n_id, $dCols
            FROM codes JOIN adc USING (subspace, code)
            WHERE n_id <> q_id GROUP BY 1, 2),
      r AS (SELECT q_id, n_id, $dSum AS approx_dist FROM j)
      SELECT q_id, n_id, approx_dist,
        CAST(row_number() OVER (PARTITION BY q_id
          ORDER BY approx_dist, n_id) AS INT) AS rank
      FROM r QUALIFY rank <= $AdcTopK"""
    })

  /** HLL distinct-token estimate per source + max-merged `__all__` row,
    * audited against exact distinct counts. */
  private val q234 = QueryDef(
    "q234_hll_distinct",
    (s, d) => Sketches.hllDistinctAudit(
      Tables.documents(s, d)
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("token")),
      "source", "token"),
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(v), $j, 1)) - 1)"
      val ladder = (1 to 20)
        .map(r => s"WHEN w >= ${1L << (20 - r)} THEN $r").mkString(" ")
      val m = 256
      val estNumerator = (0.7213 / (1.0 + 1.079 / m)) * m * m * 2097152.0
      s"""
      WITH tok AS (SELECT source AS g, unnest(${ExtQueries.oToks("text")})
                AS v
             FROM documents WHERE source IS NOT NULL),
      b0 AS (SELECT g, v FROM tok WHERE v IS NOT NULL),
      hx AS (SELECT g,
               CAST(16 * ${nib(1)} + ${nib(2)} AS INT) AS bucket,
               CAST(65536 * ${nib(3)} + 4096 * ${nib(4)} + 256 * ${nib(5)}
                 + 16 * ${nib(6)} + ${nib(7)} AS BIGINT) AS w
             FROM b0),
      rr AS (SELECT g, bucket, CASE $ladder ELSE 21 END AS rho FROM hx),
      pg AS (SELECT g, bucket, max(rho) AS r FROM rr GROUP BY 1, 2),
      mg AS (SELECT '__all__' AS g, bucket, max(r) AS r FROM pg GROUP BY 2),
      regs AS (SELECT * FROM pg UNION ALL SELECT * FROM mg),
      st AS (SELECT g, CAST(count(*) AS BIGINT) AS present,
               CAST(sum(CAST(1 AS BIGINT) << (21 - r)) AS BIGINT) AS zsum
             FROM regs GROUP BY 1),
      s2 AS (SELECT g, ($m - present) AS v_zero,
               zsum + ($m - present) * 2097152 AS zscaled FROM st),
      s3 AS (SELECT g, v_zero,
               $estNumerator / CAST(zscaled AS DOUBLE) AS raw_est FROM s2),
      s4 AS (SELECT g, v_zero,
               CASE WHEN raw_est <= ${2.5 * m} AND v_zero > 0
                 THEN ${m.toDouble}
                   * (CAST(CAST(floor(ln(${m.toDouble}
                         / CAST(v_zero AS DOUBLE)) * 1073741824.0)
                       AS BIGINT) AS DOUBLE) / 1073741824.0)
                 ELSE raw_est END AS est
             FROM s3),
      ex AS (SELECT g, CAST(count(DISTINCT v) AS BIGINT) AS n_exact
             FROM b0 GROUP BY 1
             UNION ALL
             SELECT '__all__' AS g, CAST(count(DISTINCT v) AS BIGINT)
             FROM b0)
      SELECT s4.g AS "group", n_exact, $m AS m, v_zero, est,
        (est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
          AS rel_err
      FROM s4 JOIN ex ON ex.g = s4.g"""
    })

  val all: Seq[QueryDef] = Seq(q232, q233, q234)
}
