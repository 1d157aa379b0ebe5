package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function operators (SURVEY §2.5 W2-W5, §2.6 T1-T2).
  *
  * Reference semantics preserved exactly:
  *  - rolling sums are ROWS-based (`ROWS BETWEEN n-1 PRECEDING AND CURRENT
  *    ROW`, SQLproject1.sql:628-638), i.e. last-n-rows, not last-n-days;
  *  - top-N per group uses RANK (ties all kept, :689-699), not ROW_NUMBER;
  *  - share-of-total divides by a whole-partition sum guarded with
  *    NULLIF(...,0) (:693-694).
  *
  * Scale: each helper costs exactly one shuffle on its partition keys.
  * Low-cardinality partition keys (e.g. region) are a skew risk at 100 TB —
  * callers should pre-aggregate to the window grain first (as the reference
  * views do), which both shrinks the data and bounds per-partition row
  * counts before the sort.
  */
object Windows {

  /** W2/T1: deterministic line numbering within a group. */
  def lineNumber(df: DataFrame, partition: Seq[Column], ordering: Seq[Column],
                 as: String = "line_no"): DataFrame =
    df.withColumn(as,
      row_number().over(Window.partitionBy(partition: _*).orderBy(ordering: _*)))

  /** T1: latest row per key (`TOP(1) ... ORDER BY ... DESC` per group). */
  def latestPerKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W3: rolling sum over the previous `n` rows (inclusive), ROWS-framed. */
  def rollingSum(df: DataFrame, partition: Seq[Column], ordering: Seq[Column],
                 measure: Column, n: Int, as: String): DataFrame =
    df.withColumn(as, sum(measure).over(
      Window.partitionBy(partition: _*).orderBy(ordering: _*)
        .rowsBetween(-(n - 1), Window.currentRow)))

  /** W4/T2: top-N per group by RANK (ties kept). */
  def topNPerGroup(df: DataFrame, partition: Seq[Column], score: Column,
                   n: Int, rankCol: String = "rnk"): DataFrame =
    df.withColumn(rankCol,
        rank().over(Window.partitionBy(partition: _*).orderBy(score.desc)))
      .filter(col(rankCol) <= n)

  /** W5: share of the whole-partition total, NULL when the total is 0. */
  def shareOfTotal(measure: Column, partition: Seq[Column]): Column =
    measure / nullif(sum(measure).over(Window.partitionBy(partition: _*)), lit(0))

  /** Gaps-and-islands: maximal runs of CONSECUTIVE days per key. The
    * classic anchor trick — `date - row_number() days` is constant within
    * a consecutive run — turns island detection into a plain groupBy.
    * Emits (key, streak_start, streak_end, n_days), one row per island.
    *
    * Scale: the distinct-date prep, the window, and the island groupBy all
    * hash on `keyCol`, so Spark plans ONE exchange and reuses it; islands
    * per key are bounded by dates per key, never materialized as lists. */
  def gapsAndIslands(df: DataFrame, keyCol: String, dateCol: String): DataFrame = {
    val days = df
      .select(col(keyCol).as("k"), to_date(col(dateCol)).as("d"))
      .filter(col("d").isNotNull).distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    days
      .withColumn("__anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("k"), col("__anchor"))
      .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
        count(lit(1)).as("n_days"))
      .drop("__anchor")
      .withColumnRenamed("k", keyCol)
  }

  /** T3/T4 distribution-rank suite in one window pass: ntile quartile,
    * percent_rank, cume_dist, dense_rank over `ordering` within
    * `partition`. The ordering should be a TOTAL order (include tiebreak
    * key columns in both `ordering` and the emitted projection): ntile
    * splits ties across buckets, so rows identical under the ordering must
    * also be identical in the output for the result to be well-defined. */
  def rankSuite(df: DataFrame, partition: Seq[Column],
                ordering: Seq[Column], buckets: Int): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(ordering: _*)
    df.withColumn("bucket", ntile(buckets).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .withColumn("dense_rank", dense_rank().over(w))
  }

  /** Trailing OLS trend slope per key: for each (key, day) row, the
    * least-squares slope of `y` against the day number over the trailing
    * `windowDays`-day RANGE window (calendar-ranged, so gaps count as
    * absent, not as zero rows). slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) —
    * the closed form, with every accumulation EXACT: x is an integer
    * epoch-day, y is DECIMAL(18,2), so Σx/Σx² are integer sums and
    * Σy/Σxy are decimal sums — both associative, no float
    * rounding-order dependence anywhere. The one inexact step is the
    * final division, performed once on two exactly-determined doubles.
    * NULL slope when the window holds a single day (denominator 0).
    *
    * `df` must already be at (key, day) grain with one row per key+day
    * (pre-aggregate first — that is also the 100 TB posture: the window
    * then runs over keys × days rows, not raw facts).
    *
    * Emits the input grain plus (x, slope). Scale: one range window per
    * key — the same single-shuffle shape as every helper above. */
  /** Linear gap interpolation on a daily series: for each key, emit one
    * row per calendar day from its first to its last observation; missing
    * days get prev + (next − prev) × elapsed/gap (the straight line
    * between the surrounding observations), flagged `is_interpolated`.
    * Observed days pass through bit-identically (the interpolation
    * expression is exact at frac = 0 and never applied past the last
    * observation).
    *
    * `df` must be at (key, day) grain (one row per key+day — pre-
    * aggregate first). The value is handled as DOUBLE; the interpolation
    * arithmetic is a FIXED expression tree (sub, int/int div, mul, add —
    * each IEEE-correctly-rounded), so any engine replaying the same tree
    * gets the same bits; there is no accumulation anywhere.
    *
    * Scale: one lead() window per key, then a per-gap sequence explode —
    * output rows = calendar days covered, the inherent cost of gap
    * filling (a key silent for years materializes those days; gate
    * upstream if that is not wanted). No joins against a spine table:
    * the spine is generated in-partition from each gap. */
  def interpolateDaily(df: DataFrame, keyCols: Seq[String], dayCol: String,
                       valCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(dayCol).asc)
    val withNext = df
      .filter(col(dayCol).isNotNull)
      // "__obs" shields against the common case dayCol == "day": the
      // generated spine column below is NAMED "day" and would otherwise
      // silently replace the observation day it is compared against
      .withColumn("__obs", col(dayCol))
      .withColumn("__v", col(valCol).cast("double"))
      .withColumn("__nd", lead(col("__obs"), 1).over(w))
      .withColumn("__nv", lead(col("__v"), 1).over(w))
    val exploded = withNext
      .withColumn("day",
        explode(sequence(col("__obs"),
          coalesce(date_sub(col("__nd"), 1), col("__obs")))))
    val frac = datediff(col("day"), col("__obs")).cast("double") /
      datediff(col("__nd"), col("__obs")).cast("double")
    exploded
      .withColumn("value",
        when(col("day") === col("__obs"), col("__v"))
          .otherwise(col("__v") + (col("__nv") - col("__v")) * frac))
      .withColumn("is_interpolated", col("day") =!= col("__obs"))
      .select(keyCols.map(col) :+ col("day") :+ col("value") :+
        col("is_interpolated"): _*)
  }

  def trailingSlope(df: DataFrame, keyCols: Seq[String], dayCol: String,
                    yCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 2, s"windowDays must be >= 2, got $windowDays")
    val x = datediff(col(dayCol), to_date(lit("1970-01-01"))).cast("long")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("x"))
      .rangeBetween(-(windowDays - 1).toLong, Window.currentRow)
    val prepped = df
      .withColumn("x", x)
      .withColumn("__y", col(yCol).cast("decimal(18,2)"))
    val withSums = prepped
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("x")).over(w))
      .withColumn("__sx2", sum(col("x") * col("x")).over(w))
      .withColumn("__sy", sum(col("__y")).over(w))
      .withColumn("__sxy", sum(col("__y") * col("x")).over(w))
    withSums
      .withColumn("__den", col("__n") * col("__sx2") - col("__sx") * col("__sx"))
      .withColumn("slope",
        when(col("__den") > 0,
          (col("__n").cast("double") * col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double")) /
            col("__den").cast("double")))
      .drop("__y", "__n", "__sx", "__sx2", "__sy", "__sxy", "__den")
  }

  /** One-sided CUSUM change-point statistic per key: the classic
    * recurrence S_t = max(0, S_{t-1} + (x_t − target)) flags a sustained
    * upward shift in a series (a traffic surge, a cost regression) while
    * a single spiky day decays back to 0. The recurrence LOOKS
    * inherently sequential, but reflects into associative window math:
    * with C_t the running sum of (x_t − target),
    * S_t = C_t − min(0, min_{j≤t} C_j) — a running sum and a running min
    * over the SAME (key, order) frame, which Spark computes in one sort
    * of one exchange. No iteration, no UDAF, no driver loop.
    *
    * `x` and `target` should be integer/decimal for exact accumulation
    * (the alarm comparison is then exact too). Emits the input grain
    * plus (cusum, alarm). `df` must have one row per (key, order) tick —
    * pre-aggregate to the tick grain first (also the 100 TB posture:
    * the window runs over keys × ticks, not raw events). */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCol: String,
            x: Column, target: Column, threshold: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("__c", sum(x - target).over(w))
      .withColumn("__m", least(lit(0), min(col("__c")).over(w)))
      .withColumn("cusum", col("__c") - col("__m"))
      .withColumn("alarm", col("cusum") > threshold)
      .drop("__c", "__m")
  }

  /** Theil–Sen robust trend: per key, the MEDIAN of all pairwise
    * slopes (yⱼ−yᵢ)/(xⱼ−xᵢ) over an ordered series — immune to the
    * outlier days that drag an OLS slope (the q146 `trailingSlope`
    * counterpart for dirty series). `x` must be integer-valued (e.g.
    * epoch days), `y` exact (DECIMAL): each slope is one IEEE division
    * of exactly-converted operands, and the median is the nearest-rank
    * lower median picked by integer index — engine-bit-identical.
    *
    * Scale: the pair join is PER KEY over the key's series length —
    * bounded by the time grain (days in range), not data volume; keys
    * parallelize independently. Not for million-point series. */
  def theilSenSlope(df: DataFrame, keys: Seq[String], xCol: String,
                    yCol: String): DataFrame = {
    val base = df.select((keys.map(col) :+ col(xCol).cast("long").as("__x")
      :+ col(yCol).as("__y")): _*)
    val a = base.as("a")
    val b = base.as("b")
    val keyCond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val slopes = a.join(b, keyCond && col("a.__x") < col("b.__x"))
      .select((keys.map(k => col(s"a.$k")) :+
        ((col("b.__y") - col("a.__y")).cast("double") /
          (col("b.__x") - col("a.__x")).cast("double")).as("__slope") :+
        col("a.__x").as("__xi") :+ col("b.__x").as("__xj")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
    val ranked = slopes
      .withColumn("__r", row_number().over(
        w.orderBy(col("__slope"), col("__xi"), col("__xj"))))
      .withColumn("__m", count(lit(1)).over(w))
    val npts = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_points"))
    ranked.filter(col("__r") === expr("(__m + 1) div 2"))
      .select((keys.map(col) :+ col("__m").as("n_pairs") :+
        col("__slope").as("theil_sen_slope")): _*)
      .join(npts, keys)
  }

  /** Sample autocorrelation of a keyed integer-indexed series at lags
    * 1..maxLag — the periodicity detector (a weekly cycle peaks at
    * lag 7) that chooses the seasonal grain for [[seasonalIndex]].
    *
    * Exactness: values scale to integer units (DECIMAL(38,0)); with
    * n, S = Σu, Q = Σu², and per-lag pair sums (c_k, Σxy, Σx, Σy), the
    * ACF rearranges to r_k = num/den with
    * num = n²·Σxy − n·S·(Σx+Σy) + c_k·S², den = n·(n·Q − S²) — both
    * exact integers — and emits through the 2³⁰-scaled integer
    * division (both engines truncate integer division toward zero, so
    * negative correlations round identically).
    *
    * Scale: the lag self-join fans each key row out ×maxLag and joins
    * on (key, index) — per-key series length is time-grain bounded;
    * aggregates are map-combined. */
  def autocorrelation(df: DataFrame, keys: Seq[String], idxCol: String,
                      valueCol: String, maxLag: Int,
                      unitScale: Int = 2): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val mult = math.pow(10, unitScale).toLong
    val S30 = 1073741824L
    val base = df.select((keys.map(col) :+ col(idxCol).cast("long")
      .as("__i") :+ (col(valueCol) * lit(mult))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__u")): _*)
      .filter(col("__u").isNotNull)
    val stats = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__u")).as("__s"),
        sum(col("__u") * col("__u")).as("__q"))
    val lagged = base.withColumn("lag",
      explode(sequence(lit(1), lit(maxLag))))
    val keyCond = keys.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _)
    val pairs = lagged.as("a").join(base.as("b"),
        keyCond && col("b.__i") === col("a.__i") + col("a.lag"))
      .groupBy((keys.map(k => col(s"a.$k").as(k)) :+
        col("a.lag").as("lag")): _*)
      .agg(count(lit(1)).as("__ck"),
        sum(col("a.__u") * col("b.__u")).as("__sxy"),
        sum(col("a.__u")).as("__sx"), sum(col("b.__u")).as("__sy"))
    pairs.join(stats, keys)
      .withColumn("__num", expr(
        "__n * __n * __sxy - __n * __s * (__sx + __sy) + __ck * __s * __s"))
      .withColumn("__den", expr("__n * (__n * __q - __s * __s)"))
      .select((keys.map(col) :+ col("lag") :+ col("__ck").as("n_pairs") :+
        when(col("__den") > 0,
          expr(s"(__num * $S30) div __den").cast("double") /
            lit(S30.toDouble)).as("autocorr")): _*)
  }

  /** Day-of-week seasonal index per key: mean(value | dow) / mean(value)
    * — the multiplicative seasonality profile that deseasonalizes daily
    * series before anomaly detection (q120's z-scores assume it). The
    * ratio is computed as (Σ_dow·n) / (n_dow·Σ) over exact sums — one
    * IEEE division. `dow` is 0=Sunday..6 (Spark dayofweek−1 == DuckDB
    * date_part('dow')). */
  def seasonalIndex(daily: DataFrame, keys: Seq[String], dateCol: String,
                    valueCol: String): DataFrame = {
    val base = daily.select((keys.map(col) :+
      (dayofweek(col(dateCol)) - 1).as("dow") :+
      col(valueCol).as("__y")): _*)
    val byDow = base.groupBy((keys.map(col) :+ col("dow")): _*)
      .agg(count(lit(1)).as("n_days"), sum(col("__y")).as("__sd"))
    val total = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"))
    byDow.join(total, keys)
      .select((keys.map(col) :+ col("dow") :+ col("n_days") :+
        ((col("__sd") * col("__n")).cast("double") /
          (col("n_days") * col("__s")).cast("double"))
          .as("seasonal_index")): _*)
  }

  /** Truncated exponentially-weighted moving average per key: over the
    * last `span` OBSERVED rows (row-lag, not calendar-lag),
    * S = Σⱼ wⱼ·x₋ⱼ / Σⱼ wⱼ with wⱼ = (1−α)ʲ and the sums running over
    * the lags that exist — the adjusted-EWM convention, so early rows
    * are proper averages of what is available rather than biased toward
    * the seed. Truncation at `span` lags (weight (1−α)^span is the
    * documented cutoff) is what makes the recurrence a WINDOW instead
    * of a sequential scan: the exact recursive EWMA needs S_{t−1},
    * which no engine parallelizes; the truncated form is `span` lag()
    * taps over one sorted window pass.
    *
    * Determinism: a fixed-shape 30-term DOUBLE chain is NOT portable —
    * DuckDB reassociates long addition chains (measured: 2-ulp drift vs
    * the left fold) — so the whole smoother is exact integer
    * arithmetic: α = alphaNum/alphaDen (a rational), each weight is the
    * integer coefficient (alphaDen−alphaNum)ʲ·alphaDen^(span−1−j), the
    * value is scaled to 10^unitScale integer units, both sums
    * accumulate in DECIMAL(38,0), and the result is ONE integer
    * division — the output is quantized to the unit scale (cents by
    * default), the documented contract.
    *
    * Scale: one keyed window (single exchange); per-row cost O(span).
    * Emits the input plus `ewma`. */
  def truncatedEwma(df: DataFrame, keys: Seq[String], orderCol: String,
                    valueCol: String, alphaNum: Int, alphaDen: Int,
                    span: Int = 30, unitScale: Int = 2): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a rational in (0,1): $alphaNum/$alphaDen")
    require(span >= 1 && span <= 64, s"span must be in [1,64]: $span")
    require(unitScale >= 0 && unitScale <= 9,
      s"unitScale must be in [0,9]: $unitScale")
    // coefficient magnitude bound: alphaDen^span·Σvalues must fit 38
    // digits; span 64 at den 5 is ~5^64 ≈ 5e44 — reject loudly
    require(BigInt(alphaDen).pow(span) < BigInt(10).pow(28),
      s"alphaDen^span too large for exact DECIMAL(38,0) accumulation")
    val dec = DecimalType(38, 0)
    val mult = math.pow(10, unitScale).toLong
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val u = (col(valueCol) * lit(mult)).cast(dec)
    val terms = (0 until span).map { j =>
      val coeff = BigInt(alphaDen - alphaNum).pow(j) *
        BigInt(alphaDen).pow(span - 1 - j)
      val c = lit(new java.math.BigDecimal(coeff.bigInteger)).cast(dec)
      val x = if (j == 0) u else lag(u, j).over(w)
      (when(x.isNotNull, c * x).otherwise(lit(0).cast(dec)),
        when(x.isNotNull, c).otherwise(lit(0).cast(dec)))
    }
    val num = terms.map(_._1).reduceLeft(_ + _)
    val den = terms.map(_._2).reduceLeft(_ + _)
    df.withColumn("__ewma_n", num).withColumn("__ewma_d", den)
      .withColumn("ewma",
        expr("__ewma_n div __ewma_d").cast("double") / lit(mult.toDouble))
      .drop("__ewma_n", "__ewma_d")
  }

  /** Gap-capped LOCF (last observation carried forward) over a daily
    * spine: per key, expand min..max observed day, carry the last
    * observed value forward, and NULL the fill once the observation is
    * more than `maxGapDays` old — q152's linear interpolation answers
    * "what was it probably", this answers "what did we last know, and
    * is that knowledge still fresh". Emits (keys…, day, value,
    * is_filled, gap_days); `value` is NULL beyond the gap cap.
    *
    * Scale: the spine explode is bounded by key-span days; one window
    * per key carries both the value and its observation day — no
    * joins beyond the spine left-join. */
  def locfFill(df: DataFrame, keys: Seq[String], dayCol: String,
               valueCol: String, maxGapDays: Int): DataFrame = {
    require(maxGapDays >= 0, s"maxGapDays must be >= 0, got $maxGapDays")
    val keyCols = keys.map(col)
    val spine = df.groupBy(keyCols: _*)
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(keyCols :+
        explode(sequence(col("__lo"), col("__hi"))).as("day"): _*)
    val obs = df.select(keyCols :+ col(dayCol).as("day") :+
      col(valueCol).as("__obs"): _*)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, keys :+ "day", "left")
      .withColumn("__carried", last(col("__obs"), ignoreNulls = true).over(w))
      .withColumn("__obs_day",
        last(when(col("__obs").isNotNull, col("day")), ignoreNulls = true)
          .over(w))
      .withColumn("gap_days", datediff(col("day"), col("__obs_day")))
      .select(keyCols ++ Seq(
        col("day"),
        when(col("gap_days") <= maxGapDays, col("__carried")).as("value"),
        (col("__obs").isNull && col("gap_days") <= maxGapDays
          && col("__carried").isNotNull).as("is_filled"),
        col("gap_days")): _*)
  }

  /** Rolling OLS slope over a trailing `windowDays`-day range: the
    * local trend per (series, day) — [[graft.operators.Stats.zipfFit]]'s
    * exact-sum OLS discipline applied inside a range window, so every
    * day carries its own recent-slope reading (q146's global slope,
    * localized). Inputs are integer (day ordinal, cents); the five
    * windowed sums are exact, and the slope is one double division of
    * exact DECIMAL numerator/denominator; NULL when the window holds a
    * single distinct day.
    *
    * Scale: one range window per series over the day-grain frame. */
  def rollingSlope(df: DataFrame, keys: Seq[String], dayOrdinal: Column,
                   valueCents: Column, windowDays: Int): DataFrame = {
    require(windowDays >= 2, s"windowDays must be >= 2, got $windowDays")
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(dayOrdinal)
      .rangeBetween(-(windowDays - 1).toLong, 0)
    val x = dayOrdinal.cast(dec)
    val y = valueCents.cast(dec)
    df.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w))
      .withColumn("__sy", sum(y).over(w))
      .withColumn("__sxy", sum(x * y).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
      .withColumn("__num",
        col("__n").cast(dec) * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den",
        col("__n").cast(dec) * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope",
        when(col("__den") =!= 0,
          col("__num").cast("double") / col("__den").cast("double")))
      .withColumn("n_days", col("__n"))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx", "__num", "__den")
  }

  /** MATCH_RECOGNIZE-lite: strict V-bottom detection per series — rows
    * where the value fell for two consecutive steps and then rose for
    * two (`v₋₂ > v₋₁ > v < v₊₁ < v₊₂`). Emits the bottom rows with
    * `depth = min(v₋₂, v₊₂) − v` (how far the dip recovered on its
    * shallower shoulder). The row-pattern primitive behind dip/recovery
    * alerts; wider patterns compose the same lag/lead bands.
    *
    * Scale: one per-series window with four lag/lead taps — a single
    * keyed sort, no joins. Integer values in, exact depths out. */
  def vBottoms(df: DataFrame, keys: Seq[String], order: Column,
               value: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order)
    df.withColumn("__v", value)
      .withColumn("__l2", lag(col("__v"), 2).over(w))
      .withColumn("__l1", lag(col("__v"), 1).over(w))
      .withColumn("__n1", lead(col("__v"), 1).over(w))
      .withColumn("__n2", lead(col("__v"), 2).over(w))
      .filter(col("__l2") > col("__l1") && col("__l1") > col("__v") &&
        col("__v") < col("__n1") && col("__n1") < col("__n2"))
      .withColumn("depth", least(col("__l2"), col("__n2")) - col("__v"))
      .drop("__l2", "__l1", "__n1", "__n2")
      .withColumnRenamed("__v", "bottom_value")
  }

  /** Clamped (floor-at-zero) running balance — inventory/stock
    * semantics `b_t = max(b_{t-1} + x_t, 0)`, which LOOKS inherently
    * sequential but has the exact window form
    * `b_t = p_t − min(0, min_{s≤t} p_s)` over prefix sums p (the
    * reflection identity). Two running windows, zero iteration —
    * the shape that keeps it distributable at any scale. Integer
    * deltas in, exact integer balances out. */
  def clampedRunningBalance(df: DataFrame, keys: Seq[String],
                            orderCols: Seq[Column],
                            delta: Column): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__delta", delta)
      .withColumn("__p", sum(col("__delta")).over(w))
      .withColumn("__pm", min(col("__p")).over(w))
      .withColumn("balance",
        col("__p") - least(col("__pm"), lit(0L)))
      .drop("__p", "__pm")
  }
}
