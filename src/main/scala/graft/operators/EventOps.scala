package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators, batch form (SURVEY §2.10 extension; the
  * Structured Streaming variants live in graft.streaming.StreamOps and
  * share these semantics).
  *
  * Windows are epoch-aligned (origin 1970-01-01), matching Spark's native
  * `window()` grid, so the batch results are directly comparable to the
  * streaming output.
  */
object EventOps {

  /** Cap on the Markov state space collected to the driver by
    * [[markovAttribution]]: the transition matrix is (|channels| + 3)²
    * cells, a model not data, but a caller wiring a raw high-cardinality
    * type vocabulary into `channels` would OOM the driver at |states|²
    * — fail fast BEFORE any job runs (the similarity-broadcast-guard
    * discipline). Default 1024 states ≈ 1M cells ≈ tens of MB. */
  val MaxMarkovStatesKey = "spark.graft.events.maxMarkovStates"
  val DefaultMaxMarkovStates: Int = 1024

  /** Epoch-second-aligned tumbling window start. */
  def tumblingStart(ts: Column, sizeSec: Int): Column = {
    val sec = unix_timestamp(ts)
    timestamp_seconds(sec - pmod(sec, lit(sizeSec.toLong)))
  }

  /** Tumbling-window aggregation at `sizeSec` granularity. */
  def tumblingAgg(events: DataFrame, ts: Column, sizeSec: Int,
                  keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy(tumblingStart(ts, sizeSec).as("window_start") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding windows: each event lands in size/slide windows; implemented
    * by exploding the per-event window-start list (same grid as Spark's
    * `window(ts, size, slide)`). */
  def slidingStarts(ts: Column, sizeSec: Int, slideSec: Int): Column = {
    require(sizeSec % slideSec == 0, "size must be a multiple of slide")
    val sec = unix_timestamp(ts)
    val starts = (0 until sizeSec / slideSec).map { k =>
      val shifted = sec - lit(k.toLong * slideSec)
      shifted - pmod(shifted, lit(sizeSec.toLong)) + lit(k.toLong * slideSec)
    }
    array(starts.map(timestamp_seconds): _*)
  }

  def slidingAgg(events: DataFrame, ts: Column, sizeSec: Int, slideSec: Int,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events
      .withColumn("window_start", explode(slidingStarts(ts, sizeSec, slideSec)))
      .groupBy(col("window_start") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Gap-based sessionization: a new session starts when the gap from the
    * previous event (per user) exceeds `gapSec`. Returns one row per event
    * with a dense per-user session id; aggregate on (user, session_id) for
    * per-session rollups. Ordering includes a unique tiebreak column so the
    * session assignment is total and reproducible. */
  def sessionize(events: DataFrame, userCol: Column, ts: Column,
                 tiebreak: Column, gapSec: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(ts, tiebreak)
    val us = unix_micros(ts)
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gapSec.toLong * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One funnel step: a display name plus the event predicate that
    * qualifies an event for the step. */
  final case class Step(name: String, predicate: Column)

  /** Ordered-funnel analysis: per user, the earliest timestamp at which
    * each step was reached IN ORDER — step i counts only from events at
    * or after the user's step i-1 timestamp (the classic "signup →
    * click → purchase" conversion question; an unordered count would
    * credit a purchase that happened before the signup).
    *
    * Returns one row per user who completed step 1, with one nullable
    * `<step.name>_ts` column per step; a NULL means the funnel stopped
    * there. Aggregate `count(step_ts)` for the conversion report, or use
    * [[funnelCounts]].
    *
    * Scale shape: one `filter → groupBy(user).min` per step plus an
    * equi-join per step, ALL keyed on the user column — every stage
    * shuffles on the same key, so Catalyst reuses one exchange per side
    * and the join degenerates to co-partitioned sort-merge. Steps are
    * few and static (a funnel definition), so the chain length is a
    * constant, not a data-dependent loop. No window over all of a
    * user's events is ever materialized.
    */
  def funnel(events: DataFrame, userCol: Column, ts: Column,
             steps: Seq[Step], withinSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.map(_.name).distinct.size == steps.size,
      "step names must be distinct")
    withinSec.foreach(w => require(w >= 0, s"withinSec must be >= 0, got $w"))
    val user = userCol.as("user_id")
    def stepMin(st: Step, colName: String) =
      events.filter(st.predicate)
        .groupBy(user).agg(min(ts).as(colName))
    val head = stepMin(steps.head, s"${steps.head.name}_ts")
    steps.tail.foldLeft((head, s"${steps.head.name}_ts")) {
      case ((acc, prevCol), st) =>
        val cur = s"${st.name}_ts"
        // events qualify from the prior step's instant onward; with a
        // conversion window, only up to `withinSec` after it (the "click
        // within 24 h of signup" question)
        // cast("double") = epoch seconds (micro-exact fraction) for
        // timestamps, value-preserving for numeric time columns — the
        // window check stays type-agnostic WITHOUT truncating: a long
        // cast would floor both sides and let events up to 1 s past the
        // window still convert
        val inWindow = withinSec match {
          case Some(w) => col("__ts") >= col("__prev") &&
            col("__ts").cast("double") <= col("__prev").cast("double") + w
          case None => col("__ts") >= col("__prev")
        }
        val next = events.filter(st.predicate)
          .select(user, ts.as("__ts"))
          .join(acc.select(col("user_id"), col(prevCol).as("__prev")), "user_id")
          .filter(inWindow)
          .groupBy(col("user_id")).agg(min(col("__ts")).as(cur))
        (acc.join(next, Seq("user_id"), "left"), cur)
    }._1
  }

  /** Funnel conversion report: one row per step with the number of users
    * who reached it (in order) and the conversion rate vs step 1. */
  def funnelCounts(events: DataFrame, userCol: Column, ts: Column,
                   steps: Seq[Step],
                   withinSec: Option[Long] = None): DataFrame = {
    val perUser = funnel(events, userCol, ts, steps, withinSec)
    val counts = perUser.select(
      steps.zipWithIndex.map { case (st, i) =>
        count(col(s"${st.name}_ts")).as(s"__n$i") }: _*)
    val rows = steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("step"), lit(st.name).as("step_name"),
        col(s"__n$i").as("n_users"),
        (col(s"__n$i") * lit(1.0) / nullif(col("__n0"), lit(0)))
          .as("conversion")) }
    counts.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** N-day retention matrix: users bucketed by their first-activity date
    * (cohort), then for each (cohort, day offset) the number of distinct
    * users active that day. `day_offset` 0 is the cohort day itself.
    *
    * Two shuffles total: distinct (user, day) activity, then the cohort
    * join keyed on user — the aggregate to (cohort, offset) grain is a
    * partial-agg-friendly groupBy. Never materializes per-user event
    * lists.
    */
  def retention(events: DataFrame, userCol: Column, ts: Column,
                maxOffsetDays: Int = 30): DataFrame = {
    val user = userCol.as("user_id")
    val activity = events.select(user, to_date(ts).as("day")).distinct()
    val cohorts = activity.groupBy("user_id").agg(min("day").as("cohort_day"))
    activity.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Pairwise audience overlap between event types: for every pair of
    * types, how many DISTINCT users did both, each side's audience size,
    * and the Jaccard overlap — the behavioral form of the cross-source
    * contamination audit.
    *
    * Scale: the stream collapses to distinct (type, user) rows FIRST, so
    * the self-join key is the user and each user's row count is bounded
    * by the number of types (a handful) — the pair explosion is
    * users × types², never events². */
  def audienceOverlap(events: DataFrame, typeCol: String,
                      userCol: String): DataFrame = {
    val audience = events
      .select(col(typeCol).as("t"), col(userCol).as("u"))
      .filter(col("t").isNotNull && col("u").isNotNull)
      .distinct()
    val sizes = audience.groupBy(col("t"))
      .agg(count(lit(1)).as("n"))
    val both = audience.as("a")
      .join(audience.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(sizes).withColumnRenamed("t", "type_a")
        .withColumnRenamed("n", "n_a"), "type_a")
      .join(broadcast(sizes).withColumnRenamed("t", "type_b")
        .withColumnRenamed("n", "n_b"), "type_b")
      .withColumn("jaccard", col("n_both").cast("double") /
        (col("n_a") + col("n_b") - col("n_both")).cast("double"))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"),
        col("n_b"), col("jaccard"))
  }

  /** First-order transition matrix over each user's event sequence:
    * counts of (event type → next event type) steps, the Markov view of
    * a clickstream. One lead window + one map-combined count — both on
    * the user key, one exchange. The ordering must be totalized by
    * `tiebreakCol` so same-timestamp events transition deterministically. */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Burst dedup: keep only the FIRST event of every burst per key,
    * where a burst chains events each within `gapSec` of the previous
    * one (the gaps-and-islands session rule — the event-stream analogue
    * of near-dup collapse, for retry storms, double-clicks, and
    * crawler re-fires that would otherwise inflate counts downstream).
    * Emits the kept rows with `n_suppressed` (burst size − 1) attached.
    *
    * Deterministic: the within-key order is totalized by
    * (`tsCol`, `tiebreakCol`), so burst boundaries and the kept row are
    * engine-exact. Scale: one key-partitioned window pass (lag) + one
    * map-combined count on (key, burst) — both on the key exchange,
    * the q41 sessionize posture. */
  def burstDedup(events: DataFrame, keyCols: Seq[String], tsCol: String,
                 tiebreakCol: String, gapSec: Long): DataFrame = {
    require(keyCols.nonEmpty, "burstDedup needs at least one key column")
    require(gapSec >= 1, s"gapSec must be >= 1, got $gapSec")
    val ks = keyCols.map(c => col(s"`$c`"))
    val w = Window.partitionBy(ks: _*)
      .orderBy(col(tsCol), col(s"`$tiebreakCol`"))
    val marked = events
      .filter(col(tsCol).isNotNull)
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("__new_burst",
        (col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") > gapSec * 1000000L)
          .cast("int"))
      .withColumn("__burst",
        sum(col("__new_burst")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wB = Window.partitionBy(ks :+ col("__burst"): _*)
    marked
      .withColumn("__n", count(lit(1)).over(wB))
      .withColumn("__rn", row_number().over(
        wB.orderBy(col(tsCol), col(s"`$tiebreakCol`"))))
      .filter(col("__rn") === 1)
      .withColumn("n_suppressed", (col("__n") - 1L).cast("long"))
      .drop("__prev_us", "__new_burst", "__burst", "__n", "__rn")
  }

  /** Time-weighted average of a sampled value per key: each observation
    * holds until the NEXT observation, so its weight is that interval's
    * length (the right mean for irregularly-sampled gauges — prices,
    * queue depths, temperatures — where the arithmetic mean over-weights
    * bursts). The last observation per key carries no interval and drops
    * out, the standard open-ended convention.
    *
    * Exactness: durations are integer MICROSECONDS, values go through an
    * exact decimal product/sum, and the average is ONE final double
    * division — hash-stable across engines. Emits
    * (key, n_intervals, total_dur_us, twa) for keys with >= 2
    * observations. Scale: one window (lead) + one groupBy on the same
    * key — one exchange. */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tiebreak: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreak))
    val spans = events
      .filter(col(tsCol).isNotNull)
      .withColumn("__dur",
        unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
      .filter(col("__dur").isNotNull)
    spans.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dur")).as("total_dur_us"),
        sum(col(valCol).cast(D) * col("__dur")).as("__wsum"))
      // nullif: a key whose observations all share one timestamp has
      // total_dur_us = 0 — NULL twa, not an ANSI divide-by-zero abort
      .withColumn("twa", col("__wsum").cast("double") /
        nullif(col("total_dur_us"), lit(0L)).cast("double"))
      .drop("__wsum")
  }

  /** Daily-volume anomaly detection per event type: each (type, day)
    * count is z-scored against that type's own across-days mean and
    * sample stddev, computed from EXACT integer/decimal power sums (the
    * exactMoments discipline — hash-stable across engines, one
    * aggregation pass). The monitoring primitive for a crawl/ingest
    * pipeline: a collapsed source or a runaway duplicate storm shows up
    * as |z| > threshold on its daily curve.
    *
    * Emits (event_type, day, n_events, mean_daily, stddev_daily, z,
    * is_anomaly) — stddev/z/is_anomaly are NULL for a type with a single
    * day or a perfectly constant daily curve (nullif guards: Spark 4
    * ANSI mode would otherwise abort on the zero divisor). Scale: counts
    * aggregate map-side on (type, day); the per-type moment pass runs
    * over ONE ROW PER (type, day) — bounded by the calendar, not the
    * event volume. */
  def dailyVolumeAnomaly(events: DataFrame, tsCol: String, typeCol: String,
                         zThreshold: Double): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 0)
    val daily = events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(typeCol).as("event_type"),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val c = col("n_events").cast(D)
    val stats = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("__n"),
      sum(c).as("__sc"), sum(c * c).as("__scc"))
    val nd = col("__n").cast("double")
    val sc = col("__sc").cast("double")
    val scc = col("__scc").cast("double")
    val mean = sc / nd
    val varS = (nd * scc - sc * sc) / nullif(nd * (nd - lit(1.0)), lit(0.0))
    daily.join(stats, Seq("event_type"))
      .withColumn("mean_daily", mean)
      .withColumn("stddev_daily", sqrt(varS))
      .withColumn("z",
        (col("n_events").cast("double") - col("mean_daily")) /
          nullif(col("stddev_daily"), lit(0.0)))
      .withColumn("is_anomaly", abs(col("z")) > zThreshold)
      .select(col("event_type"), col("day"), col("n_events"),
        col("mean_daily"), col("stddev_daily"), col("z"), col("is_anomaly"))
  }

  /** Trailing `windowDays`-day distinct-entity counts per key (e.g. 7-day
    * rolling active customers per segment): for each (key, day) the number
    * of distinct entities active on at least one day in
    * [day - windowDays + 1, day]. Days with no activity in the window
    * emit nothing.
    *
    * A COUNT(DISTINCT) over a range window is unsupported (and would hold
    * per-day sets); a self-range-join scans each day's trailing history.
    * Instead each (key, entity, active day) COVERS the next windowDays
    * days: explode that bounded fan-out, dedupe, count. Shuffle volume is
    * windowDays × |distinct (key, entity, day)| — linear in activity with
    * a fixed small constant, no joins, all aggregations map-side
    * combined. */
  def rollingDistinct(df: DataFrame, keyCols: Seq[String], entityCol: String,
                      dateCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val active = df
      .filter(col(entityCol).isNotNull && col(dateCol).isNotNull)
      .select(keyCols.map(col) :+ col(entityCol).as("__e") :+
        to_date(col(dateCol)).as("__d"): _*)
      .distinct()
    active
      .select(keyCols.map(col) :+ col("__e") :+
        explode(sequence(col("__d"),
          date_add(col("__d"), windowDays - 1))).as("day"): _*)
      .distinct()
      .groupBy(keyCols.map(col) :+ col("day"): _*)
      .agg(count(lit(1)).as("distinct_entities"))
  }

  /** Daily peak concurrency of [start, end) spans via a DISTRIBUTED
    * sweep line. Each span contributes +1 at `startCol` and -1 at
    * `endCol`; concurrency at a boundary is the running sum under the
    * total order (t, delta, tiebreak) — delta ascending, so a span ending
    * exactly when another starts never counts as overlap. Emits
    * (day, peak_concurrency, n_boundaries) per day with ≥1 boundary.
    *
    * The textbook single ORDER BY over all boundaries is one task. This
    * runs the sweep in two levels: per-day local running sums (window
    * PARTITIONED by day — parallel), plus a day-level offset = the sum of
    * all prior days' deltas (window over one row per day — thousands of
    * rows at century scale, broadcast back). local + offset telescopes to
    * exactly the global running sum. Spans crossing midnight are handled
    * by construction: their +1/-1 land in different days and flow into
    * every later day's offset. */
  def peakConcurrencyDaily(spans: DataFrame, startCol: String,
                           endCol: String, tieCol: String): DataFrame = {
    val deltas = spans
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(col(startCol).as("__t"), lit(1).as("__delta"),
        col(tieCol).as("__tb"))
      .unionByName(spans
        .filter(col(startCol).isNotNull && col(endCol).isNotNull)
        .select(col(endCol).as("__t"), lit(-1).as("__delta"),
          col(tieCol).as("__tb")))
      .withColumn("__day", to_date(col("__t")))
    val wLocal = Window.partitionBy(col("__day"))
      .orderBy(col("__t").asc, col("__delta").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("__local", sum(col("__delta")).over(wLocal))
    val offsets = deltas.groupBy(col("__day"))
      .agg(sum(col("__delta")).as("__tot"))
      .withColumn("__offset",
        coalesce(sum(col("__tot")).over(Window.orderBy(col("__day").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__day"), col("__offset"))
    local.join(broadcast(offsets), Seq("__day"))
      .groupBy(col("__day").as("day"))
      .agg(max(col("__local") + col("__offset")).as("peak_concurrency"),
        count(lit(1)).as("n_boundaries"))
  }

  /** Per-key interval-union coverage: total time covered by ≥1 span,
    * with overlaps counted once (the sweep-line union length — think
    * "billable busy time from overlapping job spans"). Per row the
    * contribution is max(0, end − max(start, max prior end)); summed per
    * key this telescopes to exactly the union length for ANY
    * non-decreasing-by-start order, ties included (same-start spans
    * permute individual contributions but not the per-key sum — the
    * output is a set quantity). All arithmetic is integer microseconds.
    *
    * Emits (key..., n_spans, covered_us, span_us_sum); `span_us_sum` is
    * the naive Σ(end−start), so `covered_us / span_us_sum` < 1 measures
    * overlap density. Zero/negative-length spans contribute nothing to
    * coverage but count in n_spans.
    *
    * Scale: one window + one groupBy on the key exchange. Contrast
    * [[peakConcurrencyDaily]]: that one needs a GLOBAL sweep (its
    * per-day decomposition exists for that reason); per-key coverage is
    * embarrassingly key-parallel. */
  def intervalCoverage(spans: DataFrame, keyCols: Seq[String],
                       startCol: String, endCol: String): DataFrame = {
    val su = unix_micros(col(startCol))
    val eu = unix_micros(col(endCol))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__su").asc, col("__eu").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    spans
      .filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .select(keyCols.map(col) :+ su.as("__su") :+ eu.as("__eu"): _*)
      .withColumn("__prev_max", max(col("__eu")).over(w))
      .withColumn("__cov",
        greatest(lit(0L), col("__eu") -
          greatest(col("__su"), coalesce(col("__prev_max"), col("__su")))))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__cov")).as("covered_us"),
        sum(greatest(lit(0L), col("__eu") - col("__su")))
          .as("span_us_sum"))
  }

  /** Daily growth accounting: every active user-day classified as NEW
    * (first day ever), RETAINED (also active the previous day) or
    * RESURRECTED (active before, but not yesterday), plus CHURNED
    * attributed to the day after a user's last consecutive active day
    * (active on d, not on d+1 → one churn on d+1). The product-analytics
    * identity active(d) = new + retained + resurrected holds by
    * construction, and churn rows only exist for days ≤ the corpus's
    * last day (a user can't be observed churning past the data).
    *
    * Emits (day, n_active, n_new, n_retained, n_resurrected, n_churned)
    * — one row per day with ≥1 active user; a day with only churn also
    * appears (active counts 0).
    *
    * Scale: activity collapses to distinct (user, day) first — the raw
    * event volume is gone after one map-side-combined distinct; the two
    * lag/lead windows run on user-days (≤ users × days rows), and the
    * final rollup is day-grain. The global last-day bound is a 1-row
    * broadcast. */
  def growthAccounting(events: DataFrame, userCol: Column,
                       ts: Column): DataFrame = {
    val days = events.select(userCol.as("__u"), to_date(ts).as("__d"))
      .filter(col("__u").isNotNull && col("__d").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("__u")).orderBy(col("__d").asc)
    val flagged = days
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .withColumn("__next", lead(col("__d"), 1).over(w))
    val active = flagged
      .withColumn("__status",
        when(col("__prev").isNull, "new")
          .when(datediff(col("__d"), col("__prev")) === 1, "retained")
          .otherwise("resurrected"))
      .groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("__status") === "new", 1)).as("n_new"),
        count(when(col("__status") === "retained", 1)).as("n_retained"),
        count(when(col("__status") === "resurrected", 1))
          .as("n_resurrected"))
    val lastDay = days.agg(max(col("__d")).as("__last"))
    val churn = flagged
      .filter(col("__next").isNull ||
        datediff(col("__next"), col("__d")) > 1)
      .withColumn("day", date_add(col("__d"), 1))
      .crossJoin(broadcast(lastDay))
      .filter(col("day") <= col("__last"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_churned"))
    active.join(churn, Seq("day"), "full_outer")
      .na.fill(0L, Seq("n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned"))
  }

  /** Last-touch conversion attribution: each conversion event is credited
    * to the user's most recent touch event within `windowSec` before it
    * (ties on the same microsecond broken by the tiebreak column);
    * conversions with no touch in the window credit the "direct" channel.
    * Emits per-channel (n_conversions, attributed_value).
    *
    * The touch lookup is the union-trick as-of join (the same shape as
    * the as-of operators): touches and conversions union into one
    * stream, a single per-user window carries the latest touch forward,
    * and no per-conversion probe join ever happens — one shuffle on the
    * user key for any number of conversions.
    *
    * Value sums run in DECIMAL(18,2) (exact, associative) and emit as
    * double — float accumulation order can never change the result. */
  def lastTouchAttribution(events: DataFrame, userCol: Column, ts: Column,
                           tiebreak: Column, typeCol: Column,
                           touchTypes: Seq[String], convType: String,
                           valueCol: Column,
                           windowSec: Long): DataFrame = {
    val us = unix_micros(ts)
    val tagged = events
      .filter(typeCol.isin(touchTypes :+ convType: _*))
      .select(userCol.as("__u"), us.as("__us"), tiebreak.as("__tb"),
        typeCol.as("__ty"), valueCol.cast("decimal(18,2)").as("__v"),
        // touches sort BEFORE a conversion at the same microsecond, so a
        // same-instant touch is visible to the conversion
        when(typeCol === convType, 1).otherwise(0).as("__isconv"))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__us").asc, col("__isconv").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val attributed = tagged
      .withColumn("__touch_ty",
        last(when(col("__isconv") === 0, col("__ty")), ignoreNulls = true)
          .over(w))
      .withColumn("__touch_us",
        last(when(col("__isconv") === 0, col("__us")), ignoreNulls = true)
          .over(w))
      .filter(col("__isconv") === 1)
      .withColumn("channel",
        when(col("__touch_us").isNotNull &&
          col("__us") - col("__touch_us") <= windowSec * 1000000L,
          col("__touch_ty")).otherwise(lit("direct")))
    attributed
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("__v")).cast("double").as("attributed_value"))
  }

  /** Top-k user journeys: sessionize, take each session's first
    * `maxSteps` event types in time order, join them into a path string
    * ("view>click>purchase"), and rank paths by session count (ties by
    * path text — deterministic). Emits (path, n_sessions, rank ≤ k).
    *
    * Ordered-path assembly uses sort-then-join on (timestamp, tiebreak)
    * structs — array_sort of a collected struct array, NOT collect_list
    * order (which is partition-dependent). The per-session array is
    * bounded by `maxSteps`, so no session ever materializes unbounded
    * state; the path vocabulary after the session rollup is at most
    * |types|^maxSteps distinct strings, and the final top-k is a k-row
    * TakeOrdered merge. */
  def topPaths(events: DataFrame, userCol: Column, ts: Column,
               tiebreak: Column, typeCol: Column, gapSec: Int,
               maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps >= 1 && k >= 1, "maxSteps and k must be >= 1")
    val sess = sessionize(events, userCol, ts, tiebreak, gapSec)
    val w = Window.partitionBy(userCol, col("session_id"))
      .orderBy(unix_micros(ts).asc, tiebreak.asc)
    val firstSteps = sess
      .withColumn("__step", row_number().over(w))
      .filter(col("__step") <= maxSteps)
      .select(userCol.as("__u"), col("session_id"),
        struct(col("__step"), typeCol.as("__ty")).as("__s"))
    val paths = firstSteps
      .groupBy(col("__u"), col("session_id"))
      .agg(array_sort(collect_list(col("__s"))).as("__steps"))
      .select(concat_ws(">",
        transform(col("__steps"), s => s.getField("__ty"))).as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path").asc)).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Per-user event-cadence profile — the bot/abuse screen on an event
    * stream: event volume, active days, the MEDIAN inter-event gap
    * (nearest-rank over exact integer microseconds, so it hash-matches
    * across engines), and the fraction of gaps shorter than `burstUs`
    * (scripted clients fire at machine cadence; humans don't).
    * `bot_like` flags users with ≥ `minEvents` events whose burst
    * fraction exceeds `burstFracThreshold`.
    *
    * Ties in the timestamp order are harmless: equal timestamps sort
    * adjacent under ANY tiebreak, so the gap MULTISET — and every stat
    * over it — is deterministic.
    *
    * Emits (user, n_events, n_active_days, n_gaps, median_gap_us,
    * burst_frac, bot_like); single-event users carry NULL gap stats and
    * `bot_like` false.
    *
    * Scale: one user-keyed sort for the lag, a rank over the same
    * partitioning (sort-only, no second exchange), and two per-user
    * aggs joined on the user key — state per user is O(1). */
  def cadenceProfile(events: DataFrame, userCol: String, tsCol: String,
                     burstUs: Long = 1000000L, minEvents: Int = 20,
                     burstFracThreshold: Double = 0.5): DataFrame = {
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"),
        unix_micros(col(tsCol)).as("__t"),
        to_date(col(tsCol)).as("__day"))
    val perUser = base.groupBy(col("user"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("__day")).as("n_active_days"))
    val gaps = base
      .withColumn("__gap", col("__t") - lag(col("__t"), 1).over(
        Window.partitionBy(col("user")).orderBy(col("__t"))))
      .filter(col("__gap").isNotNull)
    val part = Window.partitionBy(col("user"))
    val gapStats = gaps
      .withColumn("__rn", row_number().over(part.orderBy(col("__gap").asc)))
      .withColumn("__n", count(lit(1)).over(part))
      .groupBy(col("user"))
      .agg(count(lit(1)).as("n_gaps"),
        // nearest-rank p50 with the exactPercentiles 1e-9 ceil shim
        max(when(col("__rn") <=
          ceil(lit(0.5) * col("__n") - lit(1e-9)), col("__gap")))
          .as("median_gap_us"),
        sum(when(col("__gap") < burstUs, 1L).otherwise(0L)).as("__n_burst"))
      .withColumn("burst_frac",
        col("__n_burst").cast("double") / col("n_gaps").cast("double"))
      .drop("__n_burst")
    perUser
      .join(gapStats, Seq("user"), "left")
      .withColumn("bot_like",
        coalesce(col("burst_frac") > burstFracThreshold &&
          col("n_events") >= minEvents, lit(false)))
  }

  /** Cohort lifetime-value matrix: customers cohorted by their FIRST
    * purchase month, revenue rolled up by (cohort month, months since
    * cohort) and accumulated across offsets — the classic LTV triangle,
    * plus cumulative revenue per cohort user so curves are comparable
    * across cohort sizes. Revenue accumulates in DECIMAL (exact,
    * order-free); the per-user division is the single inexact step.
    *
    * Emits (cohort_month, month_offset, n_cohort_users, n_active_users,
    * revenue, cum_revenue, cum_ltv_per_user) — one row per cohort ×
    * offset that has ≥1 purchase.
    *
    * Scale: the first-purchase month is a map-side-combined min per
    * customer; joining it back is the one customer-keyed shuffle. The
    * rollup grain is cohorts × offsets (tiny), so the cumulative window
    * partitioned by cohort is driver-free and trivially parallel. */
  def cohortLtv(orders: DataFrame, custCol: String, dateCol: String,
                valueCol: String): DataFrame = {
    val D = DecimalType(18, 2)
    val month = date_trunc("month", col(dateCol)).cast("date")
    val base = orders
      .filter(col(custCol).isNotNull && col(dateCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(custCol).as("__cust"), month.as("__month"),
        col(valueCol).cast(D).as("__value"))
    val cohorts = base.groupBy(col("__cust"))
      .agg(min(col("__month")).as("cohort_month"))
    val sized = cohorts.groupBy(col("cohort_month"))
      .agg(count(lit(1)).as("n_cohort_users"))
    val byOffset = base.join(cohorts, "__cust")
      .withColumn("month_offset",
        months_between(col("__month"), col("cohort_month")).cast("int"))
      .groupBy(col("cohort_month"), col("month_offset"))
      .agg(count_distinct(col("__cust")).as("n_active_users"),
        sum(col("__value")).as("revenue"))
    val w = Window.partitionBy(col("cohort_month"))
      .orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byOffset
      .withColumn("cum_revenue", sum(col("revenue")).over(w))
      .join(broadcast(sized), Seq("cohort_month"))
      .withColumn("cum_ltv_per_user",
        col("cum_revenue").cast("double") /
          col("n_cohort_users").cast("double"))
      .select(col("cohort_month"), col("month_offset"),
        col("n_cohort_users"), col("n_active_users"),
        col("revenue"), col("cum_revenue"), col("cum_ltv_per_user"))
  }

  /** Event-time lateness profile: how far behind each stream key's
    * high-water mark events arrive, bucketed into fixed delay tiers —
    * the measurement that SIZES a streaming watermark (`withWatermark`
    * delay = the tier covering the tail you're willing to wait for).
    *
    * Arrival order is `seq` (ingestion sequence); lateness of an event
    * is max(event-time µs of all PRIOR arrivals on the same key) minus
    * its own event time, floored at zero. Per-key (not global)
    * high-water marks keep the window partitioned — no single-task
    * global ordering; the global profile is the bucket rollup.
    * Integer µs throughout; `share` is the single final division. */
  def latenessProfile(events: DataFrame, key: Column, ts: Column,
                      seq: Column): DataFrame = {
    val late = latenessPerEvent(events, key, ts, seq)
      .withColumnRenamed("late_us", "__late")
      .withColumn("bucket",
        when(col("__late") === 0L, "on_time")
          .when(col("__late") <= 1000000L, "within_1s")
          .when(col("__late") <= 10000000L, "within_10s")
          .when(col("__late") <= 60000000L, "within_1m")
          .when(col("__late") <= 600000000L, "within_10m")
          .when(col("__late") <= 3600000000L, "within_1h")
          .otherwise("over_1h"))
    val counts = late.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("__late")).as("max_late_us"))
    val total = late.agg(count(lit(1)).as("__tot"))
    counts.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_events"), col("max_late_us"),
        (col("n_events").cast("double") / col("__tot").cast("double"))
          .as("share"))
  }

  /** U-shaped (position-based) multi-touch attribution: each
    * conversion's credit splits 40% / 20% / 40% across first touch /
    * middles / last touch (the adtech standard between last-touch's
    * recency bias and linear's dilution). Credits are integers scaled
    * by 2³⁰ — first/last get (2·2³⁰) div 5, middles share the exact
    * remainder by integer division — so per-channel credit sums are
    * exact BIGINTs (double credit sums would be partition-order
    * dependent); the emitted `credit` is one final ÷2³⁰. Floor
    * remainders (< n·2⁻³⁰ per conversion) are the documented
    * quantization, the same 2³⁰ discipline as PSI/Gini.
    *
    * Scale: the touch↔conversion join is keyed on the user (range
    * predicate inside the key — per-user fan-out only); per-conversion
    * ordering is a window over that conversion's touches. */
  def positionBasedAttribution(events: DataFrame, userCol: Column,
                               tsCol: Column, idCol: Column,
                               typeCol: Column, touchTypes: Seq[String],
                               convType: String,
                               windowSec: Long): DataFrame = {
    val S = 1073741824L // 2^30
    val endCap = (2L * S) / 5L // 40% first + 40% last
    val base = events.select(userCol.as("u"), idCol.as("eid"),
      typeCol.as("etype"), unix_micros(tsCol).as("us"))
    val convs = base.filter(col("etype") === convType)
      .select(col("u"), col("eid").as("conv_id"), col("us").as("conv_us"))
    val touches = base.filter(col("etype").isin(touchTypes: _*))
    val joined = touches.join(convs, Seq("u"))
      .filter(col("us") < col("conv_us") &&
        col("us") >= col("conv_us") - windowSec * 1000000L)
    val w = Window.partitionBy(col("conv_id"))
    val ranked = joined
      .withColumn("__r", row_number().over(
        w.orderBy(col("us"), col("eid"))))
      .withColumn("__n", count(lit(1)).over(w))
    val credited = ranked.withColumn("__credit",
      when(col("__n") === 1, lit(S))
        .when(col("__n") === 2, lit(S / 2))
        .when(col("__r") === 1 || col("__r") === col("__n"), lit(endCap))
        .otherwise(expr(s"($S - 2 * $endCap) div (__n - 2)")))
    credited.groupBy(col("etype").as("channel"))
      .agg(countDistinct(col("conv_id")).as("n_conversions"),
        count(lit(1)).as("n_touches"),
        sum(col("__credit")).as("__cs"))
      .withColumn("credit",
        col("__cs").cast("double") / lit(S.toDouble))
      .drop("__cs")
  }

  /** Per-event lateness against the per-key high-water mark (the
    * element-level half of [[latenessProfile]]; the streaming twin is
    * `StreamOps.latenessStream`). Emits (key, seq, us, late_us). */
  def latenessPerEvent(events: DataFrame, key: Column, ts: Column,
                       seq: Column): DataFrame = {
    val base = events.select(key.as("key"), seq.as("seq"),
        unix_micros(ts).as("us"))
      .filter(col("key").isNotNull && col("us").isNotNull)
    val w = Window.partitionBy(col("key")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.withColumn("late_us",
      greatest(coalesce(max(col("us")).over(w) - col("us"), lit(0L)),
        lit(0L)))
  }

  /** Kaplan-Meier survival curve for time-to-event: per user, the first
    * `startType` event opens the clock; the first `deathType` event at or
    * after it closes it (an "event"); users with no qualifying death are
    * right-censored at the global last observed day. One row per distinct
    * duration day with the at-risk count, event/censor counts, and the
    * KM survival estimate S(t) = prod (1 - d_i/n_i).
    *
    * Determinism contract: the cumulative product is a scaled-integer
    * recurrence — s_0 = 2^30; s_k = (s_{k-1} * (n_k - d_k)) div n_k —
    * replayed verbatim by the DuckDB oracle (truncating integer division,
    * all-positive operands), with floats only at the final per-row
    * division. A censor-only step has d = 0, so its factor is exactly 1
    * and the recurrence is uniform over ALL steps.
    *
    * Scale: per-user reduction (two min-aggregations on the user key),
    * then a groupBy on duration whose cardinality is bounded by the
    * observation window in days. Only that bounded step table goes
    * through the global order/fold (sort_array + O(k^2) prefix
    * products, k = distinct days) — the event stream itself is never
    * globally sorted. */
  def kaplanMeier(events: DataFrame, userCol: Column, ts: Column,
                  typeCol: Column, startType: String,
                  deathType: String): DataFrame = {
    val e = events.select(userCol.as("u"), to_date(ts).as("day"),
        typeCol.as("t"))
      .filter(col("u").isNotNull && col("day").isNotNull)
    val horizon = e.agg(max(col("day")).as("__h"))
    val starts = e.filter(col("t") === startType)
      .groupBy(col("u")).agg(min(col("day")).as("start_day"))
    val deaths = e.filter(col("t") === deathType)
      .select(col("u"), col("day").as("death_day"))
    val firstDeath = starts.join(deaths, Seq("u"))
      .filter(col("death_day") >= col("start_day"))
      .groupBy(col("u")).agg(min(col("death_day")).as("death_day"))
    val subjects = starts.join(firstDeath, Seq("u"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        when(col("death_day").isNotNull,
          datediff(col("death_day"), col("start_day")))
          .otherwise(datediff(col("__h"), col("start_day")))
          .cast("int").as("t_days"),
        col("death_day").isNotNull.cast("long").as("ev"))
    val steps = subjects.groupBy(col("t_days"))
      .agg(count(lit(1)).as("leave"), sum(col("ev")).as("d"))
    // bounded step table (<= observation-window-in-days rows): a global
    // window + one fold here is a single small task, not a data-sized sort
    val wBefore = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = subjects.agg(count(lit(1)).as("__n"))
    val risked = steps
      .withColumn("__removed",
        coalesce(sum(col("leave")).over(wBefore), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("t_days"), (col("__n") - col("__removed")).as("n_risk"),
        col("d"), (col("leave") - col("d")).as("c"))
    val folded = risked
      .agg(sort_array(collect_list(struct(col("t_days"), col("n_risk"),
        col("d"), col("c")))).as("a"))
      .select(explode(expr(
        """transform(a, (x, i) ->
             named_struct(
               't_days', x.t_days,
               'n_risk', x.n_risk,
               'n_events', x.d,
               'n_censored', x.c,
               's_scaled', aggregate(slice(a, 1, i + 1),
                   CAST(1073741824 AS BIGINT),
                   (acc, y) -> (acc * (y.n_risk - y.d)) div y.n_risk)))"""))
        .as("r"))
    folded.select(col("r.t_days").as("t_days"),
      col("r.n_risk").as("n_risk"),
      col("r.n_events").as("n_events"),
      col("r.n_censored").as("n_censored"),
      (col("r.s_scaled").cast("double") / lit(1073741824.0))
        .as("survival"))
  }

  /** Markov removal-effect attribution: model user journeys as a
    * first-order absorbing Markov chain (__start → channels → __conv /
    * __null), then credit each channel by how much total conversion
    * probability DISAPPEARS when that channel is removed from the chain
    * — the data-driven alternative to last-touch (q144) and position
    * rules (q212), which both hard-code the credit curve.
    *
    * Journeys cut at the FIRST `convType` event; removal redirects all
    * mass through the removed channel to __null (rows from/to it are
    * dropped). Conversion probability is `iters` rounds of mass
    * propagation from __start (residual transient mass after that is
    * the documented truncation, identical on every engine).
    *
    * Determinism (exact-grid arithmetic, stronger than the floor-snap
    * discipline): transition probabilities are exact 2^−20 rationals
    * (integer floor-division), mass vectors re-snap to the 2^−30 grid
    * each round, so every product lies on the 2^−50 grid with partial
    * sums < 8 — additions are EXACT in a 53-bit mantissa and therefore
    * order-free; the DuckDB oracle unrolls the same iterations and
    * matches bit for bit.
    *
    * Scale: the data-sized work is one user-keyed window pass (the q130
    * transition shape); everything after runs on the ≤ (|channels|+1)²
    * transition MATRIX — a model, not data — which is collected (the
    * Dims-counts class of driver transfer: bounded by the type
    * vocabulary, independent of corpus size) and iterated in exact
    * scalar arithmetic. Emits one row per channel:
    * (channel, p_full, p_removed, removal_effect, attribution_share). */
  def markovAttribution(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, tiebreakCol: String,
                        convType: String, channels: Seq[String],
                        iters: Int = 50): DataFrame = {
    require(channels.nonEmpty && !channels.contains(convType),
      "channels must be non-empty and exclude the conversion type")
    // driver-collect guard: the transition matrix is |states|² cells on
    // the driver; throw before running ANY job when the caller's channel
    // vocabulary is too large to collect (conf-overridable cap)
    val maxStates = events.sparkSession.conf
      .get(MaxMarkovStatesKey, DefaultMaxMarkovStates.toString).toInt
    val nStates = channels.size + 3 // channels + __conv/__null/__start
    if (nStates > maxStates)
      throw new IllegalArgumentException(
        s"markovAttribution: ${channels.size} channels -> $nStates Markov " +
          s"states, over the cap of $maxStates (conf $MaxMarkovStatesKey); " +
          "collecting a |states|² transition matrix this large would " +
          "OOM the driver. Bucket the channel vocabulary (e.g. top-N by " +
          "volume + 'other') before attribution.")
    val Conv = "__conv"; val Null_ = "__null"; val Start = "__start"
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val evs = events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .filter(col(typeCol).isin((convType +: channels).map(lit): _*))
      .withColumn("__rn", row_number().over(w))
    val convRn = evs.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(min(col("__rn")).as("__crn"))
    val journey = evs.join(convRn, Seq(userCol), "left")
      .filter(col("__crn").isNull || col("__rn") <= col("__crn"))
    val wj = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val stepped = journey
      .withColumn("__next", lead(col(typeCol), 1).over(wj))
      .withColumn("__maxrn", max(col("__rn")).over(
        Window.partitionBy(col(userCol))))
    def toState(c: Column): Column =
      when(c === convType, Conv).otherwise(c)
    val starts = stepped.filter(col("__rn") === 1)
      .select(lit(Start).as("fr"), toState(col(typeCol)).as("to_s"))
    val mids = stepped.filter(col("__next").isNotNull)
      .select(col(typeCol).as("fr"), toState(col("__next")).as("to_s"))
    val ends = stepped
      .filter(col("__crn").isNull && col("__rn") === col("__maxrn"))
      .select(col(typeCol).as("fr"), lit(Null_).as("to_s"))
    val counts = starts.unionByName(mids).unionByName(ends)
      .groupBy(col("fr"), col("to_s")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // exact 2^-20 transition rationals
    val rowSums = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val grid20 = 1048576L; val grid30 = 1073741824.0
    val t: Map[(String, String), Double] = counts.map { case (k, n) =>
      // BigInt: n·2^20 can pass Long range when a from-state carries
      // more than ~8.8e12 transitions
      k -> (BigInt(n) * grid20 / rowSums(k._1)).toDouble / grid20.toDouble
    }
    def p(fr: String, to: String, removed: Option[String]): Double =
      if (removed.contains(fr) || removed.contains(to)) 0.0
      else t.getOrElse((fr, to), 0.0)
    def converge(removed: Option[String]): Double = {
      val transient = Start +: channels.filterNot(removed.contains)
      var mass: Map[String, Double] =
        transient.map(s => s -> (if (s == Start) 1.0 else 0.0)).toMap
      var conv = 0.0
      for (_ <- 1 to iters) {
        conv += transient.map(s => mass(s) * p(s, Conv, removed)).sum
        mass = transient.map { to =>
          val x = transient.map(s => mass(s) * p(s, to, removed)).sum
          to -> math.floor(x * grid30) / grid30
        }.toMap
      }
      conv
    }
    val pFull = converge(None)
    val perChannel = channels.sorted.map { c =>
      val pc = converge(Some(c))
      val re = if (pFull > 0) (pFull - pc) / pFull else 0.0
      (c, pc, re)
    }
    val reScaledSum = perChannel.map(x => math.floor(x._3 * grid30).toLong).sum
    val rows = perChannel.map { case (c, pc, re) =>
      val share =
        if (reScaledSum > 0) math.floor(re * grid30) / reScaledSum.toDouble
        else 0.0
      (c, pFull, pc, re, share)
    }
    events.sparkSession.createDataFrame(rows)
      .toDF("channel", "p_full", "p_removed", "removal_effect",
        "attribution_share")
  }

  /** Event-study alignment: per entity, anchor time zero at the first
    * event matching `treatment`, then report mean daily activity at
    * relative days −radius..+radius across entities — the pooled
    * before/after curve whose FLAT pre-period is the visual
    * parallel-trends check a two-period DiD (q222) just assumes.
    * Entities without a treatment event are excluded (no anchor).
    * Emits (rel_day, n_users, n_events, mean_events) with the mean as
    * one exact integer division.
    *
    * Scale: one groupBy for anchors, one for daily activity, one
    * broadcast-size join on the entity key, one ±radius filter —
    * nothing beyond entity-keyed shuffles. */
  def eventStudy(events: DataFrame, userCol: String, tsCol: String,
                 treatment: Column, radius: Int): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val base = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val anchors = base.filter(treatment)
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("__t0"))
    val daily = base
      .groupBy(col(userCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__n"))
    daily.join(anchors, Seq(userCol))
      .withColumn("rel_day", datediff(col("__day"), col("__t0")))
      .filter(abs(col("rel_day")) <= radius)
      .groupBy(col("rel_day"))
      .agg(countDistinct(col(userCol)).as("n_users"),
        sum(col("__n")).as("n_events"))
      .withColumn("mean_events",
        col("n_events").cast("double") / col("n_users").cast("double"))
  }

  /** Duration-weighted concurrency profile: from interval spans, the
    * fraction-of-TIME distribution of concurrency per group — "what
    * concurrency are we at, 95% of the time", the capacity-planning
    * number [[peakConcurrencyDaily]]'s max alone overstates.
    *
    * Sweep: ±1 boundary deltas ordered (t, delta, tiebreak) — ends
    * before starts at the same instant, the q134 convention — running
    * concurrency, interval length to the next boundary in exact
    * MICROSECONDS. Percentiles are nearest-rank on cumulative time over
    * per-concurrency totals (exact integer micros; the p·total product
    * carries the same 1e-9 ceil shim as Quality.exactPercentiles).
    *
    * Scale: one per-group boundary sort (the sweep window) + one
    * |distinct concurrency|-sized cumulative pass. */
  def concurrencyTimeProfile(spans: DataFrame, groupCol: String,
                             startCol: String, endCol: String,
                             tiebreakCol: String,
                             ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"bad ps $ps")
    val deltas = spans.select(col(groupCol).as("g"),
        col(startCol).as("t"), lit(1).as("d"), col(tiebreakCol).as("tb"))
      .unionAll(spans.select(col(groupCol).as("g"),
        col(endCol).as("t"), lit(-1).as("d"), col(tiebreakCol).as("tb")))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("t"), col("d"), col("tb"))
    val intervals = deltas
      .withColumn("__c", sum(col("d")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__dt",
        coalesce(unix_micros(lead(col("t"), 1).over(w).cast("timestamp"))
          - unix_micros(col("t").cast("timestamp")), lit(0L)))
      .filter(col("__dt") > 0)
    val perConc = intervals.groupBy(col("g"), col("__c"))
      .agg(sum(col("__dt")).as("__w"))
    val wg = Window.partitionBy(col("g"))
    val cum = perConc
      .withColumn("__total", sum(col("__w")).over(wg))
      .withColumn("__cum", sum(col("__w")).over(
        wg.orderBy(col("__c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val aggs = Seq(
      sum(col("__w")).as("total_us"),
      max(col("__c")).cast("long").as("peak")) ++ ps.map { p =>
      val label = "p" + math.round(p * 100)
      min(when(col("__cum") >=
          ceil(lit(p) * col("__total") - lit(1e-9)), col("__c")))
        .cast("long").as(label)
    }
    cum.groupBy(col("g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Exact Shapley-value attribution over channel exposure SETS — the
    * axiomatic complement to [[markovAttribution]]'s removal effects
    * (Shapley is the unique credit split satisfying efficiency/symmetry/
    * dummy; Markov measures path dynamics).
    *
    * Coalition value: `v(S)` = conversion rate among users whose
    * pre-conversion channel-exposure set is CONTAINED in S (the standard
    * exposure-subset value function — computable from data without
    * counterfactuals). Credit:
    * `φ_c = Σ_{S ⊆ C∖{c}} |S|!(|C|−|S|−1)!/|C|! · (v(S∪{c}) − v(S))`.
    *
    * Determinism: each `v(S)` is one exact BIGINT/BIGINT division to
    * double; φ sums the weighted differences in ascending-subset order
    * with the factorial weights themselves written as single double
    * divisions — a fixed arithmetic shape the oracle replays literally.
    *
    * Scale: the data-sized work is one pass to per-user bitmasks (a
    * window + bit_or aggregate) and one groupBy over ≤ 2^|C| masks; only
    * that 2^|C|-row table is collected (|C| is small by contract —
    * attribution over dozens of channels is not meaningful). */
  def shapleyAttribution(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, convType: String,
                         channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 8,
      s"channels must be 1..8 (2^|C| subsets), got ${channels.size}")
    require(!channels.contains(convType),
      "channels must exclude the conversion type")
    val k = channels.size
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(typeCol))
    val evs = events
      .filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .filter(col(typeCol).isin((convType +: channels).map(lit): _*))
      .withColumn("__rn", row_number().over(w))
    val convRn = evs.filter(col(typeCol) === convType)
      .groupBy(col(userCol)).agg(min(col("__rn")).as("__crn"))
    // conversion events (and any other type) fall through to 0
    val bit = channels.zipWithIndex.tail.foldLeft(
      when(col(typeCol) === channels.head, lit(1L))) {
        case (acc, (c, i)) => acc.when(col(typeCol) === c, lit(1L << i))
      }.otherwise(lit(0L))
    val masks = evs.join(convRn, Seq(userCol), "left")
      .filter(col("__crn").isNull || col("__rn") < col("__crn"))
      .groupBy(col(userCol))
      .agg(bit_or(bit).as("mask"))
      .join(convRn.select(col(userCol), lit(1L).as("conv")), Seq(userCol),
        "left")
      .na.fill(0L, Seq("conv"))
    // users whose ONLY relevant event is the conversion itself never pass
    // the pre-conversion filter; re-add them as mask 0, converted
    val onlyConv = convRn.join(
        masks.select(col(userCol)), Seq(userCol), "left_anti")
      .select(col(userCol), lit(0L).as("mask"), lit(1L).as("conv"))
    val grp = masks.select(col(userCol), col("mask"), col("conv"))
      .unionAll(onlyConv)
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .collect().map(r => (r.getAs[Long]("mask"),
        r.getAs[Long]("n"), r.getAs[Long]("c"))).toSeq
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val full = (1 << k) - 1
    def ab(s: Int): (Long, Long) = {
      val rows = grp.filter { case (m, _, _) => (m & ~s & full) == 0 }
      (rows.map(_._3).sum, rows.map(_._2).sum)
    }
    def v(s: Int): Double = {
      val (a, b) = ab(s)
      if (b == 0L) 0.0 else a.toDouble / b.toDouble
    }
    val rows = channels.zipWithIndex.map { case (ch, i) =>
      val c = 1 << i
      val phi = (0 to full).filter(s => (s & c) == 0).foldLeft(0.0) {
        (acc, s) =>
          val setSize = java.lang.Long.bitCount(s.toLong)
          val weight = (fact(setSize) * fact(k - 1 - setSize)).toDouble /
            fact(k).toDouble
          acc + weight * (v(s | c) - v(s))
      }
      val touched = grp.filter { case (m, _, _) => (m & c) != 0 }
        .map(_._2).sum
      (ch, touched, phi)
    }
    events.sparkSession.createDataFrame(rows)
      .toDF("channel", "n_users_touched", "shapley")
  }
}
