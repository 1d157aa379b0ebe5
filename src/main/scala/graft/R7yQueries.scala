package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.EventOps

/** Round-7 wave 25: event-study profile.
  *
  * q288 aligns every user's activity to their first purchase and
  * reports mean daily activity at relative days −5..+5 — the
  * event-study curve behind any before/after claim, and the visual
  * pre-trend check q222's two-period DiD assumes away.
  */
object R7yQueries {

  private val Radius = 5

  private val q288 = QueryDef(
    "q288_event_study",
    (s, d) => EventOps.eventStudy(Tables.events(s, d), "user_id", "ts",
      col("event_type") === "purchase", Radius),
    Some(s"""
      WITH t0 AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS t0
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type = 'purchase'
        GROUP BY 1),
      daily AS (
        SELECT e.user_id, CAST(e.ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events e
        WHERE e.user_id IS NOT NULL AND e.ts IS NOT NULL
        GROUP BY 1, 2),
      rel AS (
        SELECT d.user_id, datediff('day', t0.t0, d.day) AS r, d.n
        FROM daily d JOIN t0 USING (user_id)
        WHERE abs(datediff('day', t0.t0, d.day)) <= $Radius)
      SELECT CAST(r AS INT) AS rel_day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(sum(n) AS BIGINT) AS n_events,
             CAST(sum(n) AS DOUBLE) / CAST(count(DISTINCT user_id)
               AS DOUBLE) AS mean_events
      FROM rel GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q288)
}
