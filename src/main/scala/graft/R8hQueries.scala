package graft

import graft.Queries.QueryDef
import graft.operators.{Corpus, NearDup}

/** Round-8 wave 8: capped/candidate-fed twins for the last uncapped pair
  * paths (the q260 pattern — a scale-safe variant, separately oracled,
  * identical semantics wherever the cap doesn't bite).
  *
  * q299 re-runs q274's common-run explanation on band-bucket-capped
  * SimHash candidates: saturated (band, value) buckets — replica cliques
  * whose duplicate status exact dedup should settle — are dropped before
  * the self-join, so candidate cost is ≤ maxBucket × docs × bands.
  *
  * q300/q301 re-run the q290 LSH planner and q294 auto-threshold
  * histograms over hot-shingle-capped (maxDf) pair joins — the q68
  * posture; Σ bucket² ≤ maxDf × postings, linear in the corpus.
  */
object R8hQueries {

  private val CapBucket = 12
  private val CapDf = 25

  private val q299 = QueryDef(
    "q299_common_runs_capped",
    (s, d) => {
      val docs = Tables.documents(s, d)
      NearDup.commonRunLengths(docs, "doc_id", "text",
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3,
          maxBucket = CapBucket),
        shingleN = 3)
    },
    Some(s"""
      WITH ${ExtQueries.oSimHashCtes},
      bspine AS (SELECT unnest([0, 1, 2, 3]) AS band_id),
      bands AS (SELECT doc_id, simhash, band_id,
                  (simhash >> (band_id * 8)) & 255 AS band_val
                FROM sims CROSS JOIN bspine),
      bc AS (SELECT band_id, band_val, count(*) AS c
             FROM bands GROUP BY 1, 2),
      kept AS (SELECT b.doc_id, b.simhash, b.band_id, b.band_val
               FROM bands b JOIN bc USING (band_id, band_val)
               WHERE bc.c <= $CapBucket),
      prs AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
              FROM kept x JOIN kept y
                ON x.band_id = y.band_id AND x.band_val = y.band_val
                  AND x.doc_id < y.doc_id
              WHERE bit_count(xor(x.simhash, y.simhash)) <= 3),
      t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ps AS (SELECT doc_id,
               unnest(${ExtQueries.oShingles("w", 3)}) AS sh,
               unnest(generate_series(1, len(w) - 2)) AS pos
             FROM t WHERE len(w) >= 3),
      m AS (SELECT p.a_id, p.b_id, a.pos AS i, b.pos AS j
            FROM prs p
            JOIN ps a ON a.doc_id = p.a_id
            JOIN ps b ON b.doc_id = p.b_id AND b.sh = a.sh),
      isl AS (SELECT a_id, b_id, i - j AS diag, i,
              i - row_number() OVER (PARTITION BY a_id, b_id, i - j
                ORDER BY i) AS grp
              FROM m),
      runs AS (SELECT a_id, b_id, CAST(count(*) AS BIGINT) AS run
               FROM isl GROUP BY a_id, b_id, diag, grp)
      SELECT a_id, b_id, CAST(sum(run) AS BIGINT) AS n_matches,
             CAST(max(run) AS BIGINT) AS max_run
      FROM runs GROUP BY 1, 2"""))

  private val Budget = 24
  private val Bins = 20
  private val MinSim = 0.2
  private val SimThreshold = 0.7

  /** Shared capped-pair histogram CTEs (the q68 capped-df semantics):
    * df over distinct postings, postings with df > cap removed from both
    * intersections and set sizes. Final CTE `h` is the one-row pivoted
    * bin-count table the planner/threshold SQL consumes. */
  private def cappedHistCtes(minSim: Double): String = {
    val pivots = (0 until Bins).map(i =>
      s"COALESCE(SUM(CASE WHEN bin = $i THEN 1 END), 0) AS n$i")
      .mkString(",\n               ")
    s"""t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS MATERIALIZED (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)})
               AS sh
             FROM t WHERE len(w) >= 3),
      posting AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM ws),
      df AS (SELECT s, COUNT(*) AS c FROM posting GROUP BY s),
      capped AS MATERIALIZED (SELECT p.doc_id, p.s FROM posting p JOIN df USING (s)
                 WHERE c <= $CapDf),
      sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  CAST(COUNT(*) AS BIGINT) AS i
                FROM capped a JOIN capped b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id),
      simed AS (
        SELECT p.i, sa.n_sh + sb.n_sh - p.i AS u
        FROM pairs p
        JOIN sz sa ON p.a_id = sa.doc_id
        JOIN sz sb ON p.b_id = sb.doc_id
        WHERE CAST(p.i AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - p.i AS DOUBLE) >= $minSim),
      binned AS (
        SELECT LEAST((i * $Bins) // u, ${Bins - 1}) AS bin FROM simed),
      h AS (SELECT $pivots FROM binned)"""
  }

  private val q300 = QueryDef(
    "q300_lsh_planner_capped",
    (s, d) => NearDup.lshPlanner(Tables.documents(s, d), "doc_id", "text",
      n = 3, minSim = MinSim, simThreshold = SimThreshold,
      budget = Budget, bins = Bins, maxDf = CapDf),
    Some {
      val tBin = math.ceil(SimThreshold * Bins).toInt
      val configs = (1 to Budget).filter(Budget % _ == 0)
        .map(b => (b, Budget / b))
      def pCurve(b: Int, r: Int, sMid: Double): Double = {
        var sr = 1.0; (1 to r).foreach(_ => sr *= sMid)
        var q = 1.0; (1 to b).foreach(_ => q *= (1.0 - sr))
        1.0 - q
      }
      val outs = configs.map { case (b, r) =>
        def chain(idx: Seq[Int]): String =
          idx.map(i => s"CAST(n$i AS DOUBLE) * ${pCurve(b, r, (i + 0.5) / Bins)}")
            .mkString(" + ")
        val above = (tBin until Bins)
        val near = (0 until tBin)
        s"""SELECT $b AS bands, $r AS rows_per_band,
             CAST(${above.map(i => s"n$i").mkString(" + ")} AS BIGINT)
               AS n_pairs_above,
             CAST(${near.map(i => s"n$i").mkString(" + ")} AS BIGINT)
               AS n_pairs_near,
             CASE WHEN ${above.map(i => s"n$i").mkString(" + ")} = 0
                  THEN 0.0
                  ELSE (${chain(above)})
                    / CAST(${above.map(i => s"n$i").mkString(" + ")}
                        AS DOUBLE) END AS exp_recall,
             CASE WHEN ${near.map(i => s"n$i").mkString(" + ")} = 0
                  THEN 0.0
                  ELSE (${chain(near)})
                    / CAST(${near.map(i => s"n$i").mkString(" + ")}
                        AS DOUBLE) END AS exp_fp_rate
      FROM h"""
      }.mkString("\n      UNION ALL ")
      s"""
      WITH ${cappedHistCtes(MinSim)}
      $outs"""
    })

  private val ThreshBins = 20
  private val ThreshMinSim = 0.0

  private val q301 = QueryDef(
    "q301_auto_threshold_capped",
    (s, d) => NearDup.autoThreshold(Tables.documents(s, d), "doc_id",
      "text", n = 3, minSim = ThreshMinSim, bins = ThreshBins,
      maxDf = CapDf),
    Some(s"""
      WITH ${cappedHistCtes(ThreshMinSim)},
      spine AS (SELECT unnest(generate_series(0, ${ThreshBins - 1}))
                  AS bin),
      hl AS (SELECT s.bin,
               COALESCE(CASE s.bin
                 ${(0 until ThreshBins).map(i => s"WHEN $i THEN h.n$i")
                   .mkString(" ")} END, 0) AS n
             FROM spine s CROSS JOIN h),
      lo AS (SELECT bin FROM hl WHERE bin < ${ThreshBins / 2} AND n > 0
             ORDER BY n DESC, bin LIMIT 1),
      hi AS (SELECT bin FROM hl WHERE bin >= ${ThreshBins / 2} AND n > 0
             ORDER BY n DESC, bin LIMIT 1),
      va AS (SELECT COALESCE(
               (SELECT hl.bin FROM hl, lo, hi
                WHERE hl.bin > lo.bin AND hl.bin < hi.bin
                ORDER BY hl.n, hl.bin LIMIT 1),
               (SELECT bin FROM hi)) AS bin),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM hl)
      SELECT CAST(lo.bin AS INT) AS low_mode_bin,
             CAST(hi.bin AS INT) AS high_mode_bin,
             CAST(va.bin AS INT) AS valley_bin,
             CAST(2 * va.bin + 1 AS DOUBLE) / ${2 * ThreshBins}.0
               AS threshold,
             tot.t AS n_pairs
      FROM lo, hi, va, tot"""))

  val all: Seq[QueryDef] = Seq(q299, q300, q301)
}
