package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{EventOps, Scale, Windows}

/** Round-5 wave 9: CUSUM change-point detection, nested serving export,
  * per-user cadence (bot) profiling.
  */
object R5iQueries {

  private val CusumTarget = 70L
  private val CusumThreshold = 100L

  /** One-sided CUSUM over daily per-type event counts: the sequential
    * recurrence reflected into two associative windows (running sum +
    * running min) — see Windows.cusum. */
  private val q165 = QueryDef(
    "q165_cusum",
    (s, d) => Windows.cusum(
      Tables.events(s, d)
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      Seq("event_type"), "day", col("n"), lit(CusumTarget),
      lit(CusumThreshold)),
    Some(s"""
      WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
              count(*) AS n
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
            GROUP BY 1, 2),
      c AS (SELECT *, sum(n - $CusumTarget) OVER (
              PARTITION BY event_type ORDER BY day) AS cs FROM dc),
      m AS (SELECT *, least(0, min(cs) OVER (
              PARTITION BY event_type ORDER BY day)) AS mn FROM c)
      SELECT event_type, day, CAST(n AS BIGINT) AS n,
             CAST(cs - mn AS BIGINT) AS cusum,
             (cs - mn) > $CusumThreshold AS alarm
      FROM m"""))

  /** Nested serving export of orders with their line items as a sorted
    * array<struct>, verified cross-engine through a deterministic
    * fingerprint over the integer item keys (nested arrays themselves
    * don't canonicalize identically across engines; the md5 of the
    * sorted item strings pins BOTH membership and order). */
  private val q166 = QueryDef(
    "q166_nested_export",
    (s, d) => {
      val nested = Scale.nestedChildren(
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus"),
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        "o_orderkey", Seq("l_linenumber", "l_partkey", "l_suppkey"))
      nested.select(col("o_orderkey"), col("o_orderstatus"),
        col("n_items").cast("long").as("n_items"),
        when(col("n_items") > 0,
          md5(array_join(transform(col("items"), it =>
            concat_ws(":", it.getField("l_linenumber"),
              it.getField("l_partkey"), it.getField("l_suppkey"))),
            ","))).as("items_md5"))
    },
    Some("""
      WITH li AS (SELECT l_orderkey,
              CAST(l_linenumber AS VARCHAR) || ':' ||
                CAST(l_partkey AS VARCHAR) || ':' ||
                CAST(l_suppkey AS VARCHAR) AS item,
              (l_linenumber, l_partkey, l_suppkey) AS sk
            FROM lineitem),
      g AS (SELECT l_orderkey AS o_orderkey, count(*) AS n_items,
              md5(string_agg(item, ',' ORDER BY sk)) AS items_md5
            FROM li GROUP BY 1)
      SELECT o.o_orderkey, o.o_orderstatus,
             CAST(coalesce(g.n_items, 0) AS BIGINT) AS n_items,
             g.items_md5
      FROM orders o LEFT JOIN g USING (o_orderkey)"""))

  /** Per-user cadence/bot profile: median inter-event gap in exact
    * integer microseconds, burst fraction, and the bot flag. */
  private val q167 = QueryDef(
    "q167_cadence_profile",
    (s, d) => EventOps.cadenceProfile(Tables.events(s, d),
      "user_id", "ts"),
    Some("""
      WITH e AS (SELECT user_id AS "user", epoch_us(ts) AS t,
              CAST(ts AS DATE) AS day
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      ev AS (SELECT "user", count(*) AS n_events,
               count(DISTINCT day) AS n_active_days
             FROM e GROUP BY 1),
      g AS (SELECT "user",
              t - lag(t) OVER (PARTITION BY "user" ORDER BY t) AS gap
            FROM e),
      gn AS (SELECT "user", gap,
               row_number() OVER (PARTITION BY "user" ORDER BY gap) AS rn,
               count(*) OVER (PARTITION BY "user") AS n
             FROM g WHERE gap IS NOT NULL),
      gs AS (SELECT "user", count(*) AS n_gaps,
               max(CASE WHEN rn <= ceil(0.5 * n - 1e-9) THEN gap END)
                 AS median_gap_us,
               sum(CASE WHEN gap < 1000000 THEN 1 ELSE 0 END) AS nb
             FROM gn GROUP BY 1)
      SELECT ev."user", CAST(ev.n_events AS BIGINT) AS n_events,
             CAST(ev.n_active_days AS BIGINT) AS n_active_days,
             CAST(gs.n_gaps AS BIGINT) AS n_gaps,
             CAST(gs.median_gap_us AS BIGINT) AS median_gap_us,
             CAST(gs.nb AS DOUBLE) / CAST(gs.n_gaps AS DOUBLE)
               AS burst_frac,
             coalesce(CAST(gs.nb AS DOUBLE) / CAST(gs.n_gaps AS DOUBLE)
                 > 0.5 AND ev.n_events >= 20, false) AS bot_like
      FROM ev LEFT JOIN gs USING ("user")"""))

  val all: Seq[QueryDef] = Seq(q165, q166, q167)
}
