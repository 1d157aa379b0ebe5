package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Cdc, EventOps, Sketches}

/** Round-5 wave 1: mergeable distinct sketches, trailing-window distinct
  * counts, a distributed sweep-line, and change-log compaction — the
  * profiling / incremental-maintenance layer a 100 TB warehouse runs
  * between loads.
  */
object R5Queries {

  private def dstr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")

  private val KmvK = 64

  /** KMV distinct-user sketch per event type, with the exact count
    * alongside for error measurement. The oracle replays the sketch —
    * kth-smallest md5 and the (k-1)/frac estimator — in DuckDB, nibble-
    * decoding the 48-bit hash prefix, so the approximation itself is
    * differentially verified, not just the exact path. */
  private val q132 = QueryDef(
    "q132_kmv_distinct",
    (s, d) => Sketches.kmvDistinct(
      Tables.events(s, d).filter(col("event_type").isNotNull),
      Seq("event_type"), "user_id", KmvK),
    Some {
      // frac(kth) from the first 12 hex nibbles: exact BIGINT, < 2^48
      val v = (1 to 12).map { i =>
        val w = BigInt(16).pow(12 - i)
        s"(strpos('0123456789abcdef', substr(kth_hash, $i, 1)) - 1) * $w"
      }.mkString("\n               + ")
      s"""
      WITH h AS (SELECT DISTINCT event_type,
              md5(CAST(user_id AS VARCHAR)) AS h
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      r AS (SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
              count(*) OVER (PARTITION BY event_type) AS nd
            FROM h),
      k AS (SELECT event_type,
              CAST(max(nd) AS BIGINT) AS n_distinct_exact,
              max(CASE WHEN rn = $KmvK THEN h END) AS kth_hash
            FROM r WHERE rn <= $KmvK GROUP BY event_type)
      SELECT event_type, n_distinct_exact, kth_hash,
             CASE WHEN kth_hash IS NULL
                  THEN CAST(n_distinct_exact AS DOUBLE)
                  ELSE CAST(${KmvK - 1} AS DOUBLE) /
                       (CAST($v AS DOUBLE) / 281474976710656.0)
             END AS approx_distinct
      FROM k"""
    })

  /** 7-day trailing distinct active customers per market segment (orders
    * joined to the broadcast customer dim). */
  private val q133 = QueryDef(
    "q133_rolling_distinct",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      EventOps.rollingDistinct(joined, Seq("c_mktsegment"),
          "o_custkey", "o_orderdate", windowDays = 7)
        .select(col("c_mktsegment").as("segment"), dstr(col("day")).as("day"),
          col("distinct_entities").as("distinct_customers"))
    },
    Some("""
      WITH a AS (SELECT DISTINCT c_mktsegment AS segment,
              o_custkey AS ent, CAST(o_orderdate AS DATE) AS d
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
      cov AS (SELECT DISTINCT segment, ent, d + CAST(i AS INT) AS day
            FROM a CROSS JOIN range(0, 7) t(i))
      SELECT segment, strftime(day, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS distinct_customers
      FROM cov GROUP BY segment, day"""))

  /** Daily peak concurrency of synthetic event spans (start = ts, length
    * = 1 + (floor(value*10) mod 7200) seconds — floor, not cast, because
    * double→int CASTs round in DuckDB but truncate in Spark). */
  private val q134 = QueryDef(
    "q134_peak_concurrency",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("value").isNotNull)
      val dur = lit(1) + pmod(floor(col("value") * lit(10.0)).cast("long"),
        lit(7200L))
      val spans = ev.select(col("event_id"), col("ts"),
        (col("ts") + make_dt_interval(lit(0), lit(0), lit(0), dur))
          .as("ts_end"))
      EventOps.peakConcurrencyDaily(spans, "ts", "ts_end", "event_id")
        .select(dstr(col("day")).as("day"), col("peak_concurrency"),
          col("n_boundaries"))
    },
    Some("""
      WITH sp AS (SELECT event_id, ts,
              ts + to_seconds(1 + ((CAST(floor(value * 10) AS BIGINT) % 7200)
                + 7200) % 7200) AS te
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      d AS (SELECT ts AS t, 1 AS delta, event_id AS tb FROM sp
            UNION ALL
            SELECT te AS t, -1 AS delta, event_id AS tb FROM sp),
      r AS (SELECT t, sum(delta) OVER (ORDER BY t, delta, tb
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
            FROM d)
      SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS day,
             CAST(max(c) AS BIGINT) AS peak_concurrency,
             CAST(count(*) AS BIGINT) AS n_boundaries
      FROM r GROUP BY 1"""))

  /** Change-log compaction: events replayed as a CDC stream on user_id
    * (every 11th event_id a delete), collapsed to the net final state. */
  private val q135 = QueryDef(
    "q135_cdc_compact",
    (s, d) => {
      val log = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("op",
          when(pmod(col("event_id"), lit(11)) === 0, "D").otherwise("U"))
      Cdc.compactLog(log, Seq("user_id"),
          Seq(col("ts"), col("event_id")), "op", deleteOp = "D")
        .select(col("user_id"), col("event_type").as("last_event_type"),
          col("value").as("last_value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"),
          col("n_changes"))
    },
    Some("""
      WITH lg AS (SELECT user_id, ts, event_id, event_type, value,
              CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn,
              count(*) OVER (PARTITION BY user_id) AS n_changes
            FROM lg)
      SELECT user_id, event_type AS last_event_type, value AS last_value,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
             CAST(n_changes AS BIGINT) AS n_changes
      FROM r WHERE rn = 1 AND op <> 'D'"""))

  val all: Seq[QueryDef] = Seq(q132, q133, q134, q135)
}
