package graft

import graft.Queries.QueryDef
import graft.operators.EventOps

/** Round-7 wave 7: Shapley-value attribution.
  *
  * q256 splits conversion credit across channels by exact Shapley values
  * over exposure subsets — the axiomatic counterpart to q238's Markov
  * removal effects and the position rules (q144/q212): unique split
  * satisfying efficiency, symmetry, and the dummy axiom. Both engines
  * evaluate the same fixed-shape arithmetic over the 2^4 subset lattice,
  * so the doubles agree bit for bit.
  */
object R7gQueries {

  private val Channels = Seq("click", "error", "signup", "view")
  private val ConvType = "purchase"

  private val q256 = QueryDef(
    "q256_shapley_attribution",
    (s, d) => EventOps.shapleyAttribution(Tables.events(s, d),
      "user_id", "ts", "event_type", ConvType, Channels),
    Some {
      val k = Channels.size
      val full = (1 << k) - 1
      def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
      val bitCase = "CASE event_type " + Channels.zipWithIndex.map {
        case (c, i) => s"WHEN '$c' THEN ${1L << i}"
      }.mkString(" ") + " ELSE 0 END"
      val subsetSums = (0 to full).flatMap { sub =>
        Seq(
          s"COALESCE(SUM(n) FILTER (WHERE (mask & ${full & ~sub}) = 0), 0) AS b$sub",
          s"COALESCE(SUM(c) FILTER (WHERE (mask & ${full & ~sub}) = 0), 0) AS a$sub")
      } ++ (0 until k).map(i =>
        s"COALESCE(SUM(n) FILTER (WHERE (mask & ${1 << i}) <> 0), 0) AS t$i")
      def vSql(sub: Int) =
        s"(CASE WHEN b$sub = 0 THEN 0.0 ELSE CAST(a$sub AS DOUBLE) / CAST(b$sub AS DOUBLE) END)"
      val rows = Channels.zipWithIndex.map { case (ch, i) =>
        val c = 1 << i
        val phi = (0 to full).filter(sub => (sub & c) == 0).map { sub =>
          val ss = java.lang.Integer.bitCount(sub)
          val w = s"(CAST(${fact(ss) * fact(k - 1 - ss)} AS DOUBLE) / CAST(${fact(k)} AS DOUBLE))"
          s"$w * (${vSql(sub | c)} - ${vSql(sub)})"
        }.mkString(" + ")
        s"SELECT '$ch' AS channel, CAST(t$i AS BIGINT) AS n_users_touched, $phi AS shapley FROM agg"
      }.mkString("\n      UNION ALL ")
      val typesIn = (ConvType +: Channels).map(c => s"'$c'").mkString(", ")
      s"""
      WITH evs AS (
        SELECT user_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_type) AS rn
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
          AND event_type IN ($typesIn)),
      crn AS (SELECT user_id, min(rn) AS crn FROM evs
              WHERE event_type = '$ConvType' GROUP BY 1),
      pre AS (SELECT e.user_id, e.event_type
              FROM evs e LEFT JOIN crn USING (user_id)
              WHERE crn.crn IS NULL OR e.rn < crn.crn),
      um AS (SELECT user_id, bit_or($bitCase) AS mask
             FROM pre GROUP BY 1),
      umc AS (
        SELECT um.user_id, um.mask,
               CASE WHEN crn.crn IS NULL THEN 0 ELSE 1 END AS conv
        FROM um LEFT JOIN crn USING (user_id)
        UNION ALL
        SELECT crn.user_id, 0, 1 FROM crn
        WHERE crn.user_id NOT IN (SELECT user_id FROM um)),
      grp AS (SELECT mask, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(conv) AS BIGINT) AS c
              FROM umc GROUP BY 1),
      agg AS (SELECT ${subsetSums.mkString(",\n        ")} FROM grp)
      $rows"""
    })

  val all: Seq[QueryDef] = Seq(q256)
}
