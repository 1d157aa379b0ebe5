package graft

import graft.Queries.QueryDef
import graft.operators.{Corpus, Linkage}

/** Round-7 wave 10: iterated assignment and coverage selection.
  *
  * q261 runs mutual-best matching to a maximal assignment (round 1 is
  * q250; later rounds match records whose best partner was already
  * taken — the distributed stand-in for sequential greedy matching);
  * q262 picks the data-mixture sources that jointly cover the corpus
  * shingle vocabulary by greedy set cover — the (1−1/e) coverage
  * maximizer, the principled version of "take the biggest sources".
  */
object R7jQueries {

  private val MatchRounds = 3

  private val q261 = QueryDef(
    "q261_iterative_matching",
    (s, d) => Linkage.iterativeMatching(
      Linkage.jaroWinklerPairs(Tables.part(s, d), "p_name",
        blockLen = 2, maxLenDiff = 2, minPpm = 0L),
      "jw_ppm", rounds = MatchRounds),
    Some {
      val rounds = (1 to MatchRounds).map { r =>
        s"""
      sym$r AS (SELECT a_value AS src, b_value AS dst, jw_ppm
               FROM rem${r - 1}
               UNION ALL
               SELECT b_value, a_value, jw_ppm FROM rem${r - 1}),
      best$r AS (SELECT src, dst, jw_ppm FROM (
               SELECT src, dst, jw_ppm, row_number() OVER (
                 PARTITION BY src ORDER BY jw_ppm DESC, dst) AS rn
               FROM sym$r) WHERE rn = 1),
      m$r AS MATERIALIZED (
               SELECT x.src AS a_value, x.dst AS b_value, x.jw_ppm
               FROM best$r x JOIN best$r y
                 ON x.src = y.dst AND x.dst = y.src
               WHERE x.src < x.dst),
      used$r AS (SELECT a_value AS v FROM m$r
                 UNION SELECT b_value FROM m$r),
      rem$r AS MATERIALIZED (
               SELECT a_value, b_value, jw_ppm FROM rem${r - 1}
               WHERE a_value NOT IN (SELECT v FROM used$r)
                 AND b_value NOT IN (SELECT v FROM used$r))"""
      }.mkString(",")
      val out = (1 to MatchRounds).map(r =>
        s"SELECT a_value, b_value, CAST(jw_ppm AS BIGINT) AS jw_ppm, CAST($r AS INT) AS round FROM m$r")
        .mkString("\n      UNION ALL ")
      s"""
      WITH RECURSIVE ${R7cQueries.oJwCtes},
      rem0 AS MATERIALIZED (SELECT a_value, b_value, jw_ppm FROM scored),
      $rounds
      $out"""
    })

  private val CoverRounds = 5

  private val q262 = QueryDef(
    "q262_greedy_cover",
    (s, d) => Corpus.greedySourceCover(Tables.documents(s, d), "source",
      "text", shingleN = 2, rounds = CoverRounds),
    Some {
      val rounds = (2 to CoverRounds).map { r =>
        val pickedSoFar = (1 until r).map(i => s"SELECT source FROM p$i")
          .mkString(" UNION ALL ")
        s"""
      g$r AS (SELECT st.source, CAST(count(*) AS BIGINT) AS gain
             FROM st LEFT JOIN c${r - 1} c ON c.sh = st.sh
             WHERE c.sh IS NULL
               AND st.source NOT IN ($pickedSoFar)
             GROUP BY 1),
      p$r AS MATERIALIZED (SELECT source, gain FROM g$r WHERE gain > 0
             ORDER BY gain DESC, source LIMIT 1),
      c$r AS MATERIALIZED (SELECT sh FROM c${r - 1}
             UNION SELECT st.sh FROM st JOIN p$r USING (source))"""
      }.mkString(",")
      val out = (1 to CoverRounds).map(r =>
        s"SELECT CAST($r AS INT) AS round, source, gain AS new_elements, (SELECT CAST(count(*) AS BIGINT) FROM c$r) AS covered_total FROM p$r")
        .mkString("\n      UNION ALL ")
      s"""
      WITH t AS (SELECT source, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      st AS MATERIALIZED (SELECT DISTINCT source,
               unnest(${ExtQueries.oShingles("w", 2)}) AS sh FROM t),
      g1 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain FROM st
             GROUP BY 1),
      p1 AS MATERIALIZED (SELECT source, gain FROM g1 WHERE gain > 0
             ORDER BY gain DESC, source LIMIT 1),
      c1 AS MATERIALIZED (SELECT DISTINCT st.sh FROM st
             JOIN p1 USING (source)),
      $rounds
      $out"""
    })

  val all: Seq[QueryDef] = Seq(q261, q262)
}
