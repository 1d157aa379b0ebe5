package graft

import graft.Queries.QueryDef
import graft.operators.Linkage

/** Round-7 wave 3: exact-integer Jaro–Winkler linkage.
  *
  * q249 scores blocked part-name pairs with the codegen
  * `jaro_winkler_ppm` expression (integer parts-per-million — float JW
  * can never be hash-compared across engines; the ppm rational can).
  * The oracle replays the greedy match window as a recursive CTE, so
  * what it checks is the full matching algorithm, not a lookup. q250
  * keeps only reciprocal-best pairs — the mutual-argmax precision filter
  * every linkage pipeline ends with.
  */
object R7cQueries {

  /** CTE chain ending at `scored(a_value, b_value, jw_ppm)`: blocked
    * pairs, recursive-CTE greedy Jaro matching (state = list of used
    * b-positions), transpositions via the sorted matched-position list,
    * Winkler prefix boost as an exact rational. Validated cell-for-cell
    * against an independent reference implementation. */
  private[graft] val oJwCtes = """
      voc AS (SELECT DISTINCT p_name AS v FROM part
              WHERE p_name IS NOT NULL AND len(p_name) > 0),
      pairs AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY a.v, b.v) AS pid,
               a.v AS a, b.v AS b, len(a.v) AS la, len(b.v) AS lb,
               GREATEST(GREATEST(len(a.v), len(b.v)) // 2 - 1, 0) AS w
        FROM voc a JOIN voc b
          ON lower(substr(a.v, 1, 2)) = lower(substr(b.v, 1, 2))
         AND a.v < b.v AND abs(len(a.v) - len(b.v)) <= 2),
      st AS (
        SELECT pid, 0 AS i, CAST([] AS BIGINT[]) AS used, 0 AS m
        FROM pairs
        UNION ALL
        SELECT pid, i + 1,
               CASE WHEN bj IS NULL THEN used
                    ELSE list_append(used, bj) END,
               m + CASE WHEN bj IS NULL THEN 0 ELSE 1 END
        FROM (
          SELECT s.pid, s.i, s.used, s.m,
            list_min(list_filter(
              generate_series(GREATEST(1, s.i + 1 - p.w),
                              LEAST(p.lb, s.i + 1 + p.w)),
              j -> substr(p.b, CAST(j AS INT), 1)
                     = substr(p.a, s.i + 1, 1)
                   AND NOT list_contains(s.used, j))) AS bj
          FROM st s JOIN pairs p USING (pid)
          WHERE s.i < p.la)),
      fin AS (
        SELECT p.pid, p.a, p.b, p.la, p.lb, s.m, s.used,
               list_sort(s.used) AS su
        FROM st s JOIN pairs p USING (pid) WHERE s.i = p.la),
      calc AS (
        SELECT pid, a, b, la, lb, m,
          CASE WHEN m = 0 THEN 0 ELSE
            len(list_filter(generate_series(1, m), k ->
              substr(b, CAST(used[CAST(k AS INT)] AS INT), 1)
                <> substr(b, CAST(su[CAST(k AS INT)] AS INT), 1))) END AS t,
          COALESCE(list_min(list_filter(generate_series(1, 4), k ->
            k > LEAST(la, lb)
            OR substr(a, CAST(k AS INT), 1)
                 <> substr(b, CAST(k AS INT), 1))), 5) - 1 AS l
        FROM fin),
      scored AS (
        SELECT a AS a_value, b AS b_value,
          CASE WHEN m = 0 THEN 0 ELSE
            ((10 * (2*m*m*(la+lb) + (2*m - t)*la*lb)
              + l * (6*la*lb*m - (2*m*m*(la+lb) + (2*m - t)*la*lb)))
             * 1000000) // (10 * 6*la*lb*m) END AS jw_ppm
        FROM calc)"""

  private val q249 = QueryDef(
    "q249_jaro_winkler",
    (s, d) => Linkage.jaroWinklerPairs(Tables.part(s, d), "p_name",
      blockLen = 2, maxLenDiff = 2, minPpm = 0L),
    Some(s"""
      WITH RECURSIVE $oJwCtes
      SELECT a_value, b_value, CAST(jw_ppm AS BIGINT) AS jw_ppm
      FROM scored"""))

  private val q250 = QueryDef(
    "q250_reciprocal_match",
    (s, d) => Linkage.reciprocalBestMatch(
      Linkage.jaroWinklerPairs(Tables.part(s, d), "p_name",
        blockLen = 2, maxLenDiff = 2, minPpm = 0L)),
    Some(s"""
      WITH RECURSIVE $oJwCtes,
      sym AS (
        SELECT a_value AS src, b_value AS dst, jw_ppm FROM scored
        UNION ALL
        SELECT b_value, a_value, jw_ppm FROM scored),
      best AS (
        SELECT src, dst, jw_ppm FROM (
          SELECT src, dst, jw_ppm, row_number() OVER (
            PARTITION BY src ORDER BY jw_ppm DESC, dst) AS rn
          FROM sym) WHERE rn = 1)
      SELECT x.src AS a_value, x.dst AS b_value,
             CAST(x.jw_ppm AS BIGINT) AS jw_ppm
      FROM best x JOIN best y ON x.src = y.dst AND x.dst = y.src
      WHERE x.src < x.dst"""))

  val all: Seq[QueryDef] = Seq(q249, q250)
}
