package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{EventOps, Windows}

/** Round-7 wave 20: local trends and time-in-state capacity numbers.
  *
  * q278 reads a 30-day rolling OLS slope per priority series — the
  * trend-NOW signal q146's whole-history slope smooths away; q279
  * reports the concurrency level the system sits at 50/95/99% of the
  * TIME (duration-weighted, from the q134 sweep) — the capacity answer
  * peak concurrency alone overstates.
  */
object R7tQueries {

  private val SlopeWindow = 30

  private val q278 = QueryDef(
    "q278_rolling_slope",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
        .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("long"))
      Windows.rollingSlope(daily, Seq("prio"), col("x"), col("cents"),
        SlopeWindow)
        .select(col("prio"), col("day").cast("string").as("day"),
          col("n_days"), col("slope"))
    },
    Some(s"""
      WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                 AS BIGINT) AS cents,
               datediff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) AS x
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1, 2),
      s AS (
        SELECT prio, day,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) OVER w AS HUGEINT) AS sx,
               CAST(sum(CAST(cents AS HUGEINT)) OVER w AS HUGEINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * cents) OVER w AS HUGEINT)
                 AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY prio ORDER BY x
                 RANGE BETWEEN ${SlopeWindow - 1} PRECEDING
                 AND CURRENT ROW))
      SELECT prio, strftime(day, '%Y-%m-%d') AS day, n AS n_days,
             CASE WHEN n * sxx - sx * sx <> 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
      FROM s"""))

  private val q279 = QueryDef(
    "q279_concurrency_profile",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("value").isNotNull)
      val dur = lit(1) + pmod(floor(col("value") * lit(10.0)).cast("long"),
        lit(7200L))
      val spans = ev.select(col("event_type"), col("event_id"), col("ts"),
        (col("ts") + make_dt_interval(lit(0), lit(0), lit(0), dur))
          .as("ts_end"))
      EventOps.concurrencyTimeProfile(spans, "event_type", "ts", "ts_end",
        "event_id", Seq(0.5, 0.95, 0.99))
    },
    Some("""
      WITH sp AS (SELECT event_type, event_id, ts,
              ts + to_seconds(1 + ((CAST(floor(value * 10) AS BIGINT)
                % 7200) + 7200) % 7200) AS te
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      d AS (SELECT event_type AS g, ts AS t, 1 AS dlt, event_id AS tb
            FROM sp
            UNION ALL
            SELECT event_type, te, -1, event_id FROM sp),
      r AS (SELECT g, t,
              sum(dlt) OVER w AS c,
              lead(t) OVER (PARTITION BY g ORDER BY t, dlt, tb) AS nt
            FROM d
            WINDOW w AS (PARTITION BY g ORDER BY t, dlt, tb
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      iv AS (SELECT g, c,
               epoch_us(nt) - epoch_us(t) AS dt
             FROM r WHERE nt IS NOT NULL AND epoch_us(nt) - epoch_us(t) > 0),
      pc AS (SELECT g, c, CAST(sum(dt) AS BIGINT) AS w FROM iv
             GROUP BY 1, 2),
      cum AS (SELECT g, c, w,
               CAST(sum(w) OVER (PARTITION BY g) AS BIGINT) AS total,
               CAST(sum(w) OVER (PARTITION BY g ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
             FROM pc)
      SELECT g AS event_type,
             CAST(max(total) AS BIGINT) AS total_us,
             CAST(max(c) AS BIGINT) AS peak,
             CAST(min(CASE WHEN cum >= ceil(0.5 * total - 0.000000001)
               THEN c END) AS BIGINT) AS p50,
             CAST(min(CASE WHEN cum >= ceil(0.95 * total - 0.000000001)
               THEN c END) AS BIGINT) AS p95,
             CAST(min(CASE WHEN cum >= ceil(0.99 * total - 0.000000001)
               THEN c END) AS BIGINT) AS p99
      FROM cum GROUP BY g"""))

  val all: Seq[QueryDef] = Seq(q278, q279)
}
