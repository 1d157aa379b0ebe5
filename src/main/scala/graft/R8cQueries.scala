package graft

import graft.Queries.QueryDef
import graft.operators.NearDup

/** Round-8 wave 3: let the corpus pick its own dedup threshold.
  *
  * q294 finds the valley between the near-miss and true-duplicate modes
  * of the pair-similarity histogram — the data-driven cut point that
  * replaces a hand-picked 0.7, computed on the same exact integer bins
  * as the q290 planner (the two together design the whole LSH + verify
  * stage from measured structure).
  */
object R8cQueries {

  private val Bins = 20
  private val MinSim = 0.0

  /** EXACT-histogram form — verification twin by contract (`_exact`
    * suffix + `uncapped = true` opt-in); the hot-shingle-capped
    * production form is q301. */
  private val q294 = QueryDef(
    "q294_auto_threshold_exact",
    (s, d) => NearDup.autoThreshold(Tables.documents(s, d), "doc_id",
      "text", n = 3, minSim = MinSim, bins = Bins, maxDf = 0,
      uncapped = true),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)})
               AS sh
             FROM t WHERE len(w) >= 3),
      sh AS (SELECT doc_id, unnest(sh) AS s FROM ws),
      sz AS (SELECT doc_id, len(sh) AS n_sh FROM ws),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  CAST(COUNT(*) AS BIGINT) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id),
      simed AS (
        SELECT p.i, sa.n_sh + sb.n_sh - p.i AS u
        FROM pairs p
        JOIN sz sa ON p.a_id = sa.doc_id
        JOIN sz sb ON p.b_id = sb.doc_id
        WHERE CAST(p.i AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - p.i AS DOUBLE) >= $MinSim),
      binned AS (
        SELECT LEAST((i * $Bins) // u, ${Bins - 1}) AS bin FROM simed),
      spine AS (SELECT unnest(generate_series(0, ${Bins - 1})) AS bin),
      h AS (SELECT s.bin, COALESCE(x.n, 0) AS n
            FROM spine s LEFT JOIN (
              SELECT bin, CAST(count(*) AS BIGINT) AS n FROM binned
              GROUP BY 1) x USING (bin)),
      lo AS (SELECT bin FROM h WHERE bin < ${Bins / 2} AND n > 0
             ORDER BY n DESC, bin LIMIT 1),
      hi AS (SELECT bin FROM h WHERE bin >= ${Bins / 2} AND n > 0
             ORDER BY n DESC, bin LIMIT 1),
      va AS (SELECT COALESCE(
               (SELECT h.bin FROM h, lo, hi
                WHERE h.bin > lo.bin AND h.bin < hi.bin
                ORDER BY h.n, h.bin LIMIT 1),
               (SELECT bin FROM hi)) AS bin),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM h)
      SELECT CAST(lo.bin AS INT) AS low_mode_bin,
             CAST(hi.bin AS INT) AS high_mode_bin,
             CAST(va.bin AS INT) AS valley_bin,
             CAST(2 * va.bin + 1 AS DOUBLE) / ${2 * Bins}.0 AS threshold,
             tot.t AS n_pairs
      FROM lo, hi, va, tot"""))

  val all: Seq[QueryDef] = Seq(q294)
}
