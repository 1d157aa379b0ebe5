package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{EventOps, Quality, Scale, Sketches}

/** Round-5 wave 3: sketch-pruned exact heavy hitters, dirty-partition
  * incremental rollup refresh, and conversion analytics (time-to-convert
  * cohort percentiles, session conversion by entry channel).
  */
object R5cQueries {

  private def dstr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")

  private val HhK = 200

  /** Exact tokens above N/200 global support, Misra-Gries-pruned. The
    * oracle is the plain exact answer — what the differential proves is
    * the LOSSLESSNESS of the sketch pruning (every true heavy hitter
    * nominated), the same contract shape as the prefix-filter join. */
  private val q147 = QueryDef(
    "q147_heavy_hitters",
    (s, d) => Sketches.heavyHitters(
      Tables.documents(s, d)
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token")),
      "token", HhK),
    Some(s"""
      WITH t AS (SELECT unnest(${ExtQueries.oToks("text")}) AS value
            FROM documents),
      tot AS (SELECT count(*) AS n FROM t),
      c AS (SELECT value, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM t GROUP BY 1)
      SELECT value, n_occurrences
      FROM c CROSS JOIN tot WHERE n_occurrences * $HhK > n"""))

  /** Dirty-partition rollup refresh: every 7th event arrives late; the
    * incremental path rebuilds only the touched days and must equal the
    * full recompute BIT-FOR-BIT (decimal sums) — which is exactly what
    * the full-recompute DuckDB oracle checks. */
  private val q148 = QueryDef(
    "q148_incremental_rollup",
    (s, d) => {
      val facts = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("event_type"),
          col("value"))
      // split on a value hash: every row lands in exactly one side, and
      // NULL values fall to base (a NULL predicate must not drop rows)
      val isLate = pmod(col("value").cast("int"), lit(7)) === 0
      val late = facts.filter(coalesce(isLate, lit(false)))
      val base = facts.filter(!coalesce(isLate, lit(false)))
      val baseAgg = Scale.rollup(base, "day", Seq("event_type"), "value")
      Scale.incrementalRollup(baseAgg, base, late, "day",
          Seq("event_type"), "value")
        .select(dstr(col("day")).as("day"), col("event_type"),
          col("n_rows"), col("sum_measure").cast("double").as("sum_value"))
    },
    Some("""
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** Signup→purchase time-to-convert percentiles per signup-day cohort:
    * ordered funnel deltas in exact integer microseconds, nearest-rank
    * p50/p90 (Quality.exactPercentiles). */
  private val q149 = QueryDef(
    "q149_time_to_convert",
    (s, d) => {
      val ev = Tables.events(s, d)
      val f = EventOps.funnel(ev, col("user_id"), col("ts"), Seq(
        EventOps.Step("signup", col("event_type") === "signup"),
        EventOps.Step("purchase", col("event_type") === "purchase")))
      val deltas = f
        .filter(col("purchase_ts").isNotNull)
        .select(to_date(col("signup_ts")).as("cohort_day"),
          (unix_micros(col("purchase_ts")) - unix_micros(col("signup_ts")))
            .as("delta_us"))
      Quality.exactPercentiles(deltas, Seq("cohort_day"), "delta_us",
          Seq(0.5, 0.9))
        .select(dstr(col("cohort_day")).as("cohort_day"), col("n"),
          col("p50"), col("p90"))
    },
    Some("""
      WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s_us
            FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
             FROM events e JOIN su USING (user_id)
             WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s_us
             GROUP BY 1),
      d AS (SELECT strftime(CAST(make_timestamp(s_us) AS DATE), '%Y-%m-%d')
              AS cohort_day, p_us - s_us AS delta_us
            FROM su JOIN pu USING (user_id)),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY cohort_day ORDER BY delta_us)
                AS rn,
              count(*) OVER (PARTITION BY cohort_day) AS n
            FROM d)
      SELECT cohort_day, CAST(max(n) AS BIGINT) AS n,
             max(CASE WHEN rn <= ceil(CAST(0.5 AS DOUBLE) * n
                 - CAST(1e-9 AS DOUBLE)) THEN delta_us END) AS p50,
             max(CASE WHEN rn <= ceil(CAST(0.9 AS DOUBLE) * n
                 - CAST(1e-9 AS DOUBLE)) THEN delta_us END) AS p90
      FROM r GROUP BY cohort_day"""))

  /** Conversion rate by session entry channel: sessions keyed by their
    * deterministic first event type; a session converts if it contains a
    * purchase. */
  private val q150 = QueryDef(
    "q150_session_conversion",
    (s, d) => {
      val sess = EventOps.sessionize(Tables.events(s, d), col("user_id"),
        col("ts"), col("event_id"), gapSec = 1800)
      sess
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          min(struct(unix_micros(col("ts")).as("us"), col("event_id"),
            col("event_type").as("ty"))).getField("ty").as("entry_type"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("__conv"))
        .groupBy(col("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("__conv").cast("long")).as("n_converted"))
        .withColumn("conversion_rate",
          col("n_converted").cast("double") / col("n_sessions").cast("double"))
    },
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events),
      l AS (SELECT *, lag(us) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS prev FROM e),
      f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                           THEN 1 ELSE 0 END AS flag FROM l),
      sess AS (SELECT *, SUM(flag) OVER (PARTITION BY user_id
                 ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                 AS session_id FROM f),
      w2 AS (SELECT *, first_value(event_type) OVER (
               PARTITION BY user_id, session_id ORDER BY us, event_id)
               AS entry FROM sess),
      g AS (SELECT user_id, session_id, min(entry) AS entry_type,
              max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS conv
            FROM w2 GROUP BY 1, 2)
      SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(conv) AS BIGINT) AS n_converted,
             CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS conversion_rate
      FROM g GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q147, q148, q149, q150)
}
