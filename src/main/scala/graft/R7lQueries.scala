package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{AsOf, Windows}

/** Round-7 wave 12: temporal fill and flow.
  *
  * q265 is gap-capped LOCF over a daily spine ("what did we last know,
  * and is it still fresh" — the staleness-honest complement to q152's
  * interpolation); q266 is the FORWARD as-of join (first shipment at or
  * after the order — q45/q123 only look backward); q267 computes a
  * floor-at-zero running balance via the reflection identity
  * `b_t = p_t − min(0, min p_s)` — sequential-looking state turned into
  * two windows, which is what keeps it distributable.
  */
object R7lQueries {

  private val LocfMaxGap = 3

  private val q265 = QueryDef(
    "q265_locf_fill",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull
          && col("value").isNotNull && col("user_id") % 50 === 0)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      Windows.locfFill(daily, Seq("user_id"), "day", "cents", LocfMaxGap)
        .withColumn("day", col("day").cast("string"))
    },
    Some(s"""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL AND user_id % 50 = 0
        GROUP BY 1, 2),
      spine AS (
        SELECT user_id,
               unnest(generate_series(min(day), max(day),
                 INTERVAL 1 DAY)) AS day
        FROM daily GROUP BY user_id),
      j AS (
        SELECT s.user_id, CAST(s.day AS DATE) AS day, d.cents AS obs,
               last_value(d.cents IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS carried,
               last_value(CASE WHEN d.cents IS NOT NULL
                   THEN CAST(s.day AS DATE) END IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS obs_day
        FROM spine s LEFT JOIN daily d
          ON d.user_id = s.user_id AND d.day = CAST(s.day AS DATE))
      SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
             CASE WHEN datediff('day', obs_day, day) <= $LocfMaxGap
                  THEN carried END AS value,
             (obs IS NULL AND datediff('day', obs_day, day) <= $LocfMaxGap
               AND carried IS NOT NULL) AS is_filled,
             CAST(datediff('day', obs_day, day) AS INT) AS gap_days
      FROM j"""))

  private val LeadDays = 90L

  private val q266 = QueryDef(
    "q266_asof_forward",
    (s, d) => AsOf.joinForward(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
      Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "o_orderkey"),
      Seq("o_orderkey"),
      col("o_orderdate"), col("l_shipdate"), col("l_linenumber"),
      payload = Seq("l_linenumber", "l_shipdate"),
      maxLeadSec = Some(LeadDays * 86400L))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("asof_l_linenumber"),
        date_format(col("asof_l_shipdate"), "yyyy-MM-dd").as("ship_day")),
    Some(s"""
      WITH l AS (SELECT l_orderkey AS o_orderkey, l_linenumber, l_shipdate
                 FROM lineitem WHERE l_shipdate IS NOT NULL),
      cand AS (
        SELECT o.o_orderkey, l.l_linenumber, l.l_shipdate,
               row_number() OVER (PARTITION BY o.o_orderkey
                 ORDER BY l.l_shipdate, l.l_linenumber) AS rn
        FROM orders o JOIN l USING (o_orderkey)
        WHERE l.l_shipdate >= o.o_orderdate),
      best AS (SELECT o_orderkey, l_linenumber, l_shipdate FROM cand
               WHERE rn = 1)
      SELECT o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
             CASE WHEN epoch_us(b.l_shipdate) - epoch_us(o.o_orderdate)
                    <= ${LeadDays * 86400L * 1000000L}
                  THEN b.l_linenumber END AS asof_l_linenumber,
             CASE WHEN epoch_us(b.l_shipdate) - epoch_us(o.o_orderdate)
                    <= ${LeadDays * 86400L * 1000000L}
                  THEN strftime(b.l_shipdate, '%Y-%m-%d') END AS ship_day
      FROM orders o LEFT JOIN best b USING (o_orderkey)"""))

  private val q267 = QueryDef(
    "q267_clamped_balance",
    (s, d) => {
      // the synthetic lineitem holds duplicate (orderkey, linenumber)
      // groups; pre-aggregating deltas onto the full natural key makes
      // every row's sort position UNIQUE, so the prefix sums are a
      // total order in any engine (ties under a non-total order would
      // make the running-min pairing nondeterministic)
      val flows = Tables.lineitem(s, d)
        .filter(col("l_suppkey") % 10 === 0 && col("l_shipdate").isNotNull)
        .groupBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .agg(sum(when(col("l_returnflag") === "R",
          -col("l_quantity").cast("long"))
          .otherwise(col("l_quantity").cast("long"))).as("delta"))
      Windows.clampedRunningBalance(flows, Seq("l_suppkey"),
        Seq(col("ship_day"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey")),
        col("delta"))
        .select(col("l_suppkey"), col("ship_day"), col("l_orderkey"),
          col("l_linenumber"), col("delta"), col("balance"))
    },
    Some("""
      WITH f AS (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
               CAST(sum(CASE WHEN l_returnflag = 'R'
                    THEN -CAST(l_quantity AS BIGINT)
                    ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT)
                 AS delta
        FROM lineitem
        WHERE l_suppkey % 10 = 0 AND l_shipdate IS NOT NULL
        GROUP BY 1, 2, 3, 4, 5),
      pf AS (
        SELECT l_suppkey, ship_day, l_orderkey, l_linenumber, l_partkey,
               delta,
               CAST(sum(delta) OVER (PARTITION BY l_suppkey
                 ORDER BY ship_day, l_orderkey, l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS p
        FROM f),
      pm AS (
        SELECT *, CAST(min(p) OVER (PARTITION BY l_suppkey
                 ORDER BY ship_day, l_orderkey, l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS m
        FROM pf)
      SELECT l_suppkey, ship_day, l_orderkey, l_linenumber, delta,
             p - LEAST(m, 0) AS balance
      FROM pm"""))

  val all: Seq[QueryDef] = Seq(q265, q266, q267)
}
