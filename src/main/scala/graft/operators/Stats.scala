package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Nonparametric two-sample tests and distribution divergences — the
  * drift-audit toolkit a data owner runs when "did this feed change?"
  * must be answered without assuming normality (the rank/CDF
  * complement to the parametric q217 power analysis and the binned
  * q175 PSI).
  *
  * Determinism contract (the q140/q217 discipline): everything that is
  * summed across rows is summed EXACTLY — counts and rank sums in
  * BIGINT/DECIMAL(38,0), per-token log terms on a floor(·2^30) integer
  * grid — and doubles appear only in per-row expressions or in the
  * final fixed-shape arithmetic, so a DuckDB oracle replaying the same
  * expression tree hash-matches bit for bit.
  */
object Stats {

  private val LogGrid = 1073741824.0 // 2^30: the shared scaled-log grid
  private val Ln2 = 0.6931471805599453

  /** Per-distinct-value sample counts with INCLUSIVE cumulative sums
    * under value order — the shared CDF substrate of [[ksTest]] and
    * [[mannWhitney]]. Input must have (v: double, n_a, n_b: long) with
    * distinct v; output adds cum_a, cum_b.
    *
    * Scale: the naive form is `sum() over (order by v)` — a SINGLE
    * sorted task. Above `smallInputMaxRows` distinct values this
    * telescopes exactly like [[Scale.globalRowNumber]]: equal-width
    * value buckets (monotone, so bucket-major + within-bucket order IS
    * the global order), per-bucket totals (≤ `buckets` rows) prefix-sum
    * into exclusive offsets, and each row's cumulative is its bucket
    * offset plus a WITHIN-bucket running sum — windows parallel across
    * buckets. Both paths are output-identical (pinned in StatsSpec). */
  private def cumulativeCounts(perValue: DataFrame, distinctUpperBound: Long,
                               buckets: Int = 4096,
                               smallInputMaxRows: Long = 2000000L): DataFrame = {
    val v = col("v")
    if (smallInputMaxRows > 0 && distinctUpperBound <= smallInputMaxRows) {
      val w = Window.orderBy(v.asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return perValue
        .withColumn("cum_a", sum(col("n_a")).over(w))
        .withColumn("cum_b", sum(col("n_b")).over(w))
    }
    val bounds = perValue.agg(min(v).as("__lo"), max(v).as("__hi"))
    val bucketed = perValue.crossJoin(broadcast(bounds))
      .withColumn("__bucket",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((v - col("__lo")) /
              ((col("__hi") - col("__lo")) / lit(buckets.toDouble)))
              .cast("int"))))
      .drop("__lo", "__hi")
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(sum(col("n_a")).as("__ba"), sum(col("n_b")).as("__bb"))
      .withColumn("__offa",
        coalesce(sum(col("__ba")).over(Window.orderBy(col("__bucket").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__offb",
        coalesce(sum(col("__bb")).over(Window.orderBy(col("__bucket").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offa"), col("__offb"))
    val w = Window.partitionBy(col("__bucket")).orderBy(v.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("cum_a", col("__offa") + sum(col("n_a")).over(w))
      .withColumn("cum_b", col("__offb") + sum(col("n_b")).over(w))
      .drop("__bucket", "__offa", "__offb")
  }

  /** Shared head of both tests: distinct-value rows (v, n_a, n_b) with
    * inclusive cumulative counts, plus the raw-row upper bound used for
    * the size dispatch (metadata-only for a bare parquet scan). */
  private def cdfTable(df: DataFrame, value: Column, isA: Column,
                       smallInputMaxRows: Long): (DataFrame, Long) = {
    val upper = df.count()
    val base = df.select(value.cast("double").as("v"),
        isA.cast("boolean").as("a"))
      .filter(col("v").isNotNull && col("a").isNotNull)
    val perValue = base.groupBy(col("v")).agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"))
    (cumulativeCounts(perValue, upper,
      smallInputMaxRows = smallInputMaxRows), upper)
  }

  /** Two-sample Kolmogorov–Smirnov test: D = max |F_A(x) − F_B(x)| over
    * the pooled empirical CDFs, with the value attaining it (smallest
    * such value on ties) and the asymptotic two-sided p-value from the
    * Kolmogorov series 2·Σ(−1)^{k−1}·exp(−2k²λ²), λ = D·√(n_a·n_b/n),
    * truncated at 8 terms summed left to right (the fixed-shape float
    * contract; 8 terms is far below double ulp for any λ ≥ 0.2).
    *
    * The unbinned counterpart of the PSI drift score: PSI needs a bin
    * grid chosen in advance, KS reads the gap straight off the CDFs.
    *
    * Scale: one map-combined groupBy on the value, the telescoped
    * cumulative pass (no single-task global window above the dispatch
    * cap), and a TakeOrdered top-1 — no all-row sort, nothing driver
    * side. Emits ONE row: (n_a, n_b, ks_d, ks_at_value, lambda,
    * p_value). */
  def ksTest(df: DataFrame, value: Column, isA: Column,
             smallInputMaxRows: Long = 2000000L): DataFrame = {
    val (cdf, _) = cdfTable(df, value, isA, smallInputMaxRows)
    val totals = cdf.agg(sum(col("n_a")).as("__na"), sum(col("n_b")).as("__nb"))
    val scored = cdf.crossJoin(broadcast(totals))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .withColumn("__d",
        abs(col("cum_a").cast("double") / col("__na").cast("double")
          - col("cum_b").cast("double") / col("__nb").cast("double")))
    val top = scored
      .orderBy(col("__d").desc, col("v").asc)
      .limit(1)
      .withColumn("lambda", col("__d") *
        sqrt(col("__na").cast("double") * col("__nb").cast("double")
          / (col("__na") + col("__nb")).cast("double")))
    val series = (1 to 8).map { k =>
      val sign = if (k % 2 == 1) 1.0 else -1.0
      lit(sign) * exp(lit(-2.0 * k * k) * col("lambda") * col("lambda"))
    }.reduceLeft(_ + _)
    // below λ = 0.3 the alternating series loses its cancellation (all
    // terms ≈ 1) while the true p is 1 − O(1e−3): clamp to 1 there
    top.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      col("__d").as("ks_d"), col("v").as("ks_at_value"),
      col("lambda"),
      when(col("lambda") < 0.3, lit(1.0))
        .otherwise(least(lit(1.0), greatest(lit(0.0), lit(2.0) * series)))
        .as("p_value"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) test with average-rank tie
    * handling and tie-corrected normal approximation. Rank sums never
    * materialize per-row ranks: for a distinct value with `t` pooled
    * occurrences and `c` pooled rows strictly below it, every
    * occurrence carries average rank c + (t+1)/2, so
    * 2·R_A = Σ n_a·(2c + t + 1) — an EXACT DECIMAL(38,0) sum (the ·2
    * clears the half-integer). z = (U_A − n_a·n_b/2) / σ with
    * σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n·(n−1))); no continuity
    * correction (keeps the expression shape identical across engines).
    *
    * Scale: identical posture to [[ksTest]] — one groupBy on the value,
    * the telescoped cumulative pass, then a one-row exact aggregate.
    * Emits ONE row: (n_a, n_b, u_a, u_b, z). */
  def mannWhitney(df: DataFrame, value: Column, isA: Column,
                  smallInputMaxRows: Long = 2000000L): DataFrame = {
    val (cdf, _) = cdfTable(df, value, isA, smallInputMaxRows)
    val dec = DecimalType(38, 0)
    val t = (col("n_a") + col("n_b")).cast(dec)
    val cBefore = (col("cum_a") + col("cum_b")).cast(dec) - t
    val agg = cdf.agg(
      sum(col("n_a")).as("__na"), sum(col("n_b")).as("__nb"),
      sum(col("n_a").cast(dec) * (cBefore * 2 + t + 1)).as("__two_ra"),
      sum(t * t * t - t).as("__ties"))
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    val nD = (col("__na") + col("__nb")).cast("double")
    // 2U_A = 2R_A − n_a(n_a+1); σ and z in fixed-shape double arithmetic
    val twoUa = col("__two_ra") - col("__na").cast(dec) * (col("__na") + 1)
    val sigma = sqrt((naD * nbD / lit(12.0)) *
      ((nD + lit(1.0)) - col("__ties").cast("double") / (nD * (nD - lit(1.0)))))
    agg
      .withColumn("__two_ua", twoUa)
      .select(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        (col("__two_ua").cast("double") / lit(2.0)).as("u_a"),
        (naD * nbD - col("__two_ua").cast("double") / lit(2.0)).as("u_b"),
        // σ = 0 (every pooled value identical) → no rank information;
        // NULL, not a division by zero
        when(sigma > 0.0,
          (col("__two_ua").cast("double") - naD * nbD) / (lit(2.0) * sigma))
          .as("z"))
  }

  /** ROC AUC from ranks (the Mann–Whitney identity AUC = U⁺/(n⁺·n⁻)
    * with average-rank tie handling — exact, not trapezoid-on-a-grid),
    * plus the Gini coefficient 2·AUC − 1. The classifier-threshold-free
    * counterpart of q179's argmax confusion report: how well does this
    * score ORDER positives above negatives.
    *
    * Scale: inherits [[mannWhitney]]'s posture — one groupBy on the
    * score, telescoped cumulative, exact DECIMAL rank sums. Emits ONE
    * row: (n_pos, n_neg, auc, gini). */
  def rocAuc(df: DataFrame, score: Column, isPositive: Column,
             smallInputMaxRows: Long = 2000000L): DataFrame =
    mannWhitney(df, score, isPositive, smallInputMaxRows)
      .select(
        col("n_a").as("n_pos"), col("n_b").as("n_neg"),
        (col("u_a") / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("auc"))
      .withColumn("gini", lit(2.0) * col("auc") - lit(1.0))

  /** Weight-of-evidence / information-value profile of a numeric
    * feature against a binary outcome, on `bins` equal-width bins over
    * the observed [min, max] — the feature-screening artifact a risk
    * or labeling pipeline reads before admitting a column. Per bin:
    * WOE = ln((good_i/G)/(bad_i/B)); IV = Σ (good_i/G − bad_i/B)·WOE_i
    * (computed over bins where both sides are nonzero; one-sided bins
    * get NULL WOE and are excluded from IV — the standard treatment).
    *
    * Determinism: bin populations are exact counts; WOE/IV are
    * fixed-shape doubles on those counts — and because the IV sum runs
    * over ≤ `bins` rows in a single unpartitioned window, the addition
    * order is the bin order on BOTH engines.
    *
    * Scale: one min/max agg + one map-combined groupBy onto ≤ `bins`
    * cells; everything after is bins-sized. */
  def woeIv(df: DataFrame, feature: Column, isGood: Column,
            bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val base = df.select(feature.cast("double").as("v"),
        isGood.cast("boolean").as("g"))
      .filter(col("v").isNotNull && col("g").isNotNull)
    val bounds = base.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val binned = base.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col("v") - col("__lo")) /
              ((col("__hi") - col("__lo")) / lit(bins.toDouble)))
              .cast("int"))))
    val cells = binned.groupBy(col("bin"))
      .agg(
        min(col("__lo")).as("__lo"), min(col("__hi")).as("__hi"),
        sum(when(col("g"), 1L).otherwise(0L)).as("n_good"),
        sum(when(!col("g"), 1L).otherwise(0L)).as("n_bad"))
    val totals = cells.agg(sum(col("n_good")).as("__tg"),
      sum(col("n_bad")).as("__tb"))
    val w = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val pg = col("n_good").cast("double") / col("__tg").cast("double")
    val pb = col("n_bad").cast("double") / col("__tb").cast("double")
    val woe = when(col("n_good") > 0 && col("n_bad") > 0, log(pg / pb))
    cells.crossJoin(broadcast(totals))
      .withColumn("bin_lo", col("__lo") + col("bin").cast("double") * w)
      .withColumn("bin_hi",
        when(col("bin") === bins - 1, col("__hi"))
          .otherwise(col("__lo") + (col("bin") + 1).cast("double") * w))
      .withColumn("woe", woe)
      .withColumn("iv_term", when(woe.isNotNull, (pg - pb) * woe))
      .withColumn("iv_total",
        sum(coalesce(col("iv_term"), lit(0.0)))
          .over(Window.orderBy(col("bin").asc)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        col("n_good"), col("n_bad"), col("woe"), col("iv_term"),
        col("iv_total"))
  }

  /** Mutual information between two categorical columns, with the
    * marginal entropies and √-normalized NMI — the "is my corpus
    * metadata actually independent" audit (e.g. language × source:
    * high NMI means per-source language skew a mixture design must
    * correct for). All in bits.
    *
    * Determinism: every per-cell/per-margin −p·ln p and p·ln(pn/(px·py))
    * term is one fixed-shape double snapped to the floor(·2^30) grid and
    * summed exactly (the q140 discipline), then divided once.
    *
    * Scale: one map-combined groupBy onto the (x, y) contingency cells,
    * two margin groupBys over the cells, broadcast joins back — shuffle
    * is cell-count-sized, never row-sized. Emits ONE row. */
  def mutualInfo(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("string").as("x"), y.cast("string").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val cells = base.groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    val mx = cells.groupBy(col("x")).agg(sum(col("c")).as("cx"))
    val my = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val n = cells.agg(sum(col("c")).as("__n"))
    val cD = col("c").cast("double");  val nD = col("__n").cast("double")
    val cxD = col("cx").cast("double"); val cyD = col("cy").cast("double")
    val miTerm = (cD / nD) * log((cD * nD) / (cxD * cyD))
    val joined = cells
      .join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
      .crossJoin(broadcast(n))
      .agg(
        count(lit(1)).as("n_cells"),
        max(col("__n")).as("n_rows"),
        sum(floor(miTerm * lit(LogGrid)).cast("long")).as("__mi"))
    def entropyScaled(margin: DataFrame, cnt: String): DataFrame = {
      val p = col(cnt).cast("double") / col("__n").cast("double")
      margin.crossJoin(broadcast(n))
        .agg(sum(floor(-(p * log(p)) * lit(LogGrid)).cast("long")).as("__h"))
    }
    val hx = entropyScaled(mx, "cx").withColumnRenamed("__h", "__hx")
    val hy = entropyScaled(my, "cy").withColumnRenamed("__h", "__hy")
    val miNats = col("__mi").cast("double") / lit(LogGrid)
    val hxNats = col("__hx").cast("double") / lit(LogGrid)
    val hyNats = col("__hy").cast("double") / lit(LogGrid)
    joined.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(
        col("n_rows"), col("n_cells"),
        (miNats / lit(Ln2)).as("mi_bits"),
        (hxNats / lit(Ln2)).as("h_x_bits"),
        (hyNats / lit(Ln2)).as("h_y_bits"),
        when(hxNats > 0.0 && hyNats > 0.0,
          miNats / sqrt(hxNats * hyNats)).as("nmi"))
  }

  /** Doubled average pooled rank (2·r̄, an exact integer even under
    * ties) per distinct value of `value` — the rank substrate of
    * [[spearman]]. */
  private def avgRank2Table(df: DataFrame, value: Column,
                            upper: Long): DataFrame = {
    val perValue = df.select(value.as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_a"))
      .withColumn("n_b", lit(0L))
    cumulativeCounts(perValue, upper)
      .select(col("v"),
        (lit(2L) * (col("cum_a") - col("n_a")) + col("n_a") + 1).as("avg2"))
  }

  /** Spearman rank correlation with average-rank tie handling — the
    * monotonic-association complement of Pearson (outlier-robust, sees
    * any monotone relation, not just linear). Ranks are exact doubled
    * integers; centering uses the identity mean(2·r̄) = n+1 (exact), so
    * the correlation reduces to Σx'y'/√(Σx'²·Σy'²) over centered
    * integer ranks with EXACT DECIMAL(38,0) sums. The two ratios
    * |num|/denx and |num|/deny are exact integer floor-divisions scaled
    * by 2^20, recombined as sign·√(a·b)/2^20 — so rho is quantized to
    * ~2e−6 relative, identically on every engine (the sums themselves
    * exceed 2^53 where decimal→double conversion double-rounds
    * differently across engines; the div trick never converts them).
    *
    * Capacity: centered sums are ≤ n³ — exact to n ≈ 3e10 rows; beyond
    * that the DECIMAL(38,0) accumulation overflows LOUDLY under ANSI
    * (pre-aggregate or sample first, as any rank statistic at that
    * scale should).
    *
    * Scale: two per-column rank passes (map-combined groupBy + the
    * telescoped cumulative), two value-keyed joins back to the rows,
    * one exact aggregate. Emits ONE row: (n, rho). */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    val upper = df.count()
    val base = df.select(x.cast("double").as("__x"), y.cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val rx = avgRank2Table(base, col("__x"), upper)
      .select(col("v").as("__x"), col("avg2").as("__ax"))
    val ry = avgRank2Table(base, col("__y"), upper)
      .select(col("v").as("__y"), col("avg2").as("__ay"))
    val dec = DecimalType(38, 0)
    val nRow = base.agg(count(lit(1)).as("__n"))
    val joined = base.join(rx, Seq("__x")).join(ry, Seq("__y"))
      .crossJoin(broadcast(nRow))
      .select(
        (col("__ax") - (col("__n") + 1)).cast(dec).as("__xc"),
        (col("__ay") - (col("__n") + 1)).cast(dec).as("__yc"),
        col("__n"))
    val agg = joined.agg(
      max(col("__n")).as("n"),
      sum(col("__xc") * col("__yc")).as("__num"),
      sum(col("__xc") * col("__xc")).as("__dx"),
      sum(col("__yc") * col("__yc")).as("__dy"))
    val grid = 1048576.0 // 2^20
    agg
      .withColumn("__a20", when(col("__dx") > 0,
        expr("CAST((abs(__num) * 1048576) div __dx AS BIGINT)")))
      .withColumn("__b20", when(col("__dy") > 0,
        expr("CAST((abs(__num) * 1048576) div __dy AS BIGINT)")))
      .select(col("n"),
        when(col("__dx") > 0 && col("__dy") > 0,
          when(col("__num") < 0, lit(-1.0)).otherwise(lit(1.0)) *
            sqrt((col("__a20").cast("double") / lit(grid)) *
              (col("__b20").cast("double") / lit(grid))))
          .as("rho"))
  }

  /** Zipf-law fit over the corpus term-frequency head: OLS slope of
    * ln(freq) on ln(rank) for the `topN` most frequent terms (the
    * standard head fit — the tail is finite-sample noise). A healthy
    * natural-language corpus sits near slope −1; a flat slope flags
    * boilerplate/template floods, a cliff flags vocabulary collapse —
    * the one-number corpus-shape diagnostic next to q138's lexical
    * diversity.
    *
    * Determinism: ln(rank)/ln(freq) snap to the floor(·2^20) grid
    * (1-ulp transcendental hazard), all OLS sums are exact integers, and
    * the slope is an exact integer ratio floor-scaled by 2^30 before ONE
    * power-of-two division (the q217/q197 discipline; `div` truncates
    * toward zero on both engines). Emits ONE row:
    * (n_terms, slope, intercept).
    *
    * Scale: one tokenize groupBy (map-combined) and a TakeOrdered
    * top-N; the fit runs on ≤ topN rows. */
  def zipfFit(docs: DataFrame, textCol: String,
              topN: Int = 2000): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val grid = 1048576.0 // 2^20: keeps Σ(lx·ly) inside exact long range
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val top = counts.orderBy(col("freq").desc, col("term").asc).limit(topN)
    // topN-row frame: the numbering window is trivially single-task
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("term").asc))
        .cast("long"))
    val lx = floor(log(col("rank").cast("double")) * lit(grid)).cast("long")
    val ly = floor(log(col("freq").cast("double")) * lit(grid)).cast("long")
    val dec = DecimalType(38, 0)
    val agg = ranked.select(lx.as("__lx"), ly.as("__ly"))
      .agg(count(lit(1)).as("n"),
        sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
        sum(col("__lx") * col("__ly")).as("__sxy"),
        sum(col("__lx") * col("__lx")).as("__sxx"))
      .withColumn("__num",
        col("n").cast(dec) * col("__sxy").cast(dec)
          - col("__sx").cast(dec) * col("__sy").cast(dec))
      .withColumn("__den",
        col("n").cast(dec) * col("__sxx").cast(dec)
          - col("__sx").cast(dec) * col("__sx").cast(dec))
      .withColumn("__slope_scaled",
        expr("CAST((__num * 1073741824) div __den AS BIGINT)"))
    val slope = col("__slope_scaled").cast("double") / lit(1073741824.0)
    agg.select(col("n").as("n_terms"), slope.as("slope"),
      ((col("__sy").cast("double") / lit(grid)
        - slope * (col("__sx").cast("double") / lit(grid)))
        / col("n").cast("double")).as("intercept"))
  }

  /** Decision-stump feature screening: for each candidate feature, the
    * best binary split of the target by that feature's value order and
    * the scatter gain it buys — the one-level-tree screen that ranks
    * features the way a GBDT's first split would, without training
    * anything. [[changepoint]] generalized two ways: rows are WEIGHTED
    * value groups (features repeat values; time series don't), and the
    * scan melts many features in one pass.
    *
    * Input: `features` as (name, integer value expression) pairs over
    * integer target `yCents`. Per feature: group by value, order by
    * value, and maximize `S_l²/C_l + S_r²/C_r` over prefix cut points
    * (exact DECIMAL sums; gains become doubles via single divisions;
    * ties → smallest cut value). Output per feature: n_values,
    * split_value (last value of the left side), left/right means, gain
    * over the no-split baseline — ranked by gain.
    *
    * Scale: one melt pass (explode × |features|, map-combined groupBy
    * on (feature, value)), then per-feature windows on the
    * values-sized frame. */
  def stumpScreen(df: DataFrame, features: Seq[(String, Column)],
                  yCents: Column): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val dec = DecimalType(38, 0)
    val melted = df
      .withColumn("__y", yCents.cast("long"))
      .filter(col("__y").isNotNull)
      .select(explode(array(features.map { case (n, c) =>
        struct(lit(n).as("feature"), c.cast("long").as("v"))
      }: _*)).as("__f"), col("__y"))
      .filter(col("__f.v").isNotNull)
      .groupBy(col("__f.feature").as("feature"), col("__f.v").as("v"))
      .agg(count(lit(1)).as("c"), sum(col("__y").cast(dec)).as("s"))
    val part = Window.partitionBy(col("feature"))
    val w = part.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = melted
      .withColumn("__cl", sum(col("c")).over(w))
      .withColumn("__sl", sum(col("s")).over(w))
      .withColumn("__n", sum(col("c")).over(part))
      .withColumn("__st", sum(col("s")).over(part))
      .withColumn("__nv", count(lit(1)).over(part))
      .withColumn("__rk", row_number().over(part.orderBy(col("v"))))
    val cand = base.filter(col("__rk") < col("__nv"))
      .withColumn("__sr", col("__st") - col("__sl"))
      .withColumn("__cr", col("__n") - col("__cl"))
      .withColumn("gain",
        (col("__sl") * col("__sl")).cast("double")
          / col("__cl").cast("double")
          + (col("__sr") * col("__sr")).cast("double")
            / col("__cr").cast("double")
          - (col("__st") * col("__st")).cast("double")
            / col("__n").cast("double"))
    val best = cand
      .withColumn("__brk", row_number().over(
        part.orderBy(col("gain").desc, col("v"))))
      .filter(col("__brk") === 1)
      .select(col("feature"), col("__nv").as("n_values"),
        col("v").as("split_value"),
        (col("__sl").cast("double")
          / (col("__cl") * 100).cast("double")).as("left_mean"),
        (col("__sr").cast("double")
          / (col("__cr") * 100).cast("double")).as("right_mean"),
        col("gain"))
    best.withColumn("rank", row_number().over(
      Window.orderBy(col("gain").desc, col("feature"))).cast("int"))
  }

  /** Scaled-integer SPRT constants for a Bernoulli simple-vs-simple
    * test: per-success and per-failure log-likelihood increments and
    * the Wald boundaries, all on the floor(·2^30) grid. Computed ONCE
    * here and interpolated into oracle SQL as literals (the
    * plane-weights pattern), so engine `ln` ulp differences cannot
    * flip a floor. */
  def sprtConstants(p0: Double, p1: Double,
                    alphaPct: Int): (Long, Long, Long, Long) = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"bad hypotheses ($p0, $p1)")
    require(alphaPct > 0 && alphaPct < 50, s"bad alphaPct $alphaPct")
    val g = LogGrid
    val a = alphaPct / 100.0
    (math.floor(math.log(p1 / p0) * g).toLong,
      math.floor(math.log((1 - p1) / (1 - p0)) * g).toLong,
      math.floor(math.log((1 - a) / a) * g).toLong,
      math.floor(math.log(a / (1 - a)) * g).toLong)
  }

  /** Sequential probability-ratio monitor over a daily increment
    * stream: cumulative trials/successes, the exact scaled-integer LLR
    * `c·L1 + (n−c)·L2`, the per-day Wald state, and whether the test
    * had already DECIDED on an earlier day (sequential tests stop at
    * first crossing — reading the statistic after that is the peeking
    * error this operator exists to prevent). Input: one row per
    * (day, n_new, c_new). Output adds n, c, llr (double, grid
    * division), state ∈ continue/accept_h1/accept_h0, decided.
    *
    * Scale: two running windows over the day-grain frame. */
  def sprtMonitor(daily: DataFrame, dayCol: String, nNew: Column,
                  cNew: Column, p0: Double, p1: Double,
                  alphaPct: Int): DataFrame = {
    val (l1, l2, up, loB) = sprtConstants(p0, p1, alphaPct)
    val w = Window.orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLlr = daily
      .withColumn("n", sum(nNew).over(w))
      .withColumn("c", sum(cNew).over(w))
      .withColumn("__llr_s",
        col("c") * lit(l1) + (col("n") - col("c")) * lit(l2))
      .withColumn("llr", col("__llr_s").cast("double") / lit(LogGrid))
      .withColumn("state",
        when(col("__llr_s") >= up, "accept_h1")
          .when(col("__llr_s") <= loB, "accept_h0")
          .otherwise("continue"))
    withLlr
      .withColumn("decided",
        max(when(col("state") =!= "continue", 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)) === 1)
      .na.fill(Map("decided" -> false))
      .drop("__llr_s")
  }

  /** V-optimal histogram: the `buckets`-bucket partition of the value
    * range minimizing total within-bucket SSE — the optimal summary
    * structure equi-width/equi-depth histograms approximate, and the
    * bin layout an optimizer's selectivity estimates want.
    *
    * Two-level plan: values first land in `preBins` equi-width integer
    * pre-bins (one distributed map-combined groupBy — the only
    * data-sized pass); the O(preBins²·buckets) dynamic program then
    * runs on the collected prefix table (preBins rows — a driver-side
    * MODEL, not data). Exactness: pre-bin ids, counts, sums, and
    * sums-of-squares are exact integers; every DP cost is the fixed
    * expression `ΔQ − ΔS²/ΔC` evaluated on doubles cast from those
    * exact integers, so the argmin trajectory (ties → smallest split)
    * reproduces across engines — the oracle unrolls the same DP as
    * chained CTEs.
    *
    * Emits one row per bucket: (bucket, lo_bin, hi_bin, n, mean, sse);
    * buckets can be empty (n = 0, NULL mean) when fewer than `buckets`
    * pre-bins are occupied. */
  def vOptimalHistogram(df: DataFrame, valueCents: Column,
                        preBins: Int = 64, buckets: Int = 8): DataFrame = {
    require(preBins >= 2 && preBins <= 4096, s"bad preBins $preBins")
    require(buckets >= 1 && buckets <= preBins, s"bad buckets $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(valueCents.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val bounds = vals.agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"))
      .collect().headOption
      .filter(!_.isNullAt(0))
    if (bounds.isEmpty)
      return Seq.empty[(Int, Int, Int, Long, Option[Double], Double)]
        .toDF("bucket", "lo_bin", "hi_bin", "n", "mean", "sse")
    val (lo, hi) = (bounds.get.getLong(0), bounds.get.getLong(1))
    val span = hi - lo + 1
    val dec = DecimalType(38, 0)
    // 1-based pre-bin id; exact integer floor division
    val bin = (((col("__v") - lo) * preBins
      - pmod((col("__v") - lo) * preBins, lit(span))) / lit(span))
      .cast("long") + 1
    val perBin = vals.withColumn("__b", bin)
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("c"), sum(col("__v").cast(dec)).as("s"),
        sum(col("__v").cast(dec) * col("__v").cast(dec)).as("q"))
      .collect()
      .map(r => (r.getAs[Long]("__b").toInt,
        (r.getAs[Long]("c"), BigInt(r.getAs[java.math.BigDecimal]("s")
          .toBigInteger), BigInt(r.getAs[java.math.BigDecimal]("q")
          .toBigInteger))))
      .toMap
    // prefix arrays over 0..preBins (0 = empty prefix)
    val pc = new Array[Long](preBins + 1)
    val ps = new Array[BigInt](preBins + 1)
    val pq = new Array[BigInt](preBins + 1)
    ps(0) = BigInt(0); pq(0) = BigInt(0)
    (1 to preBins).foreach { i =>
      val (c, s, q) = perBin.getOrElse(i, (0L, BigInt(0), BigInt(0)))
      pc(i) = pc(i - 1) + c
      ps(i) = ps(i - 1) + s
      pq(i) = pq(i - 1) + q
    }
    def sse(j: Int, i: Int): Double = {
      val dc = pc(i) - pc(j)
      if (dc == 0) 0.0
      else {
        val dsT = ps(i) - ps(j)
        (pq(i) - pq(j)).toDouble - (dsT * dsT).toDouble / dc.toDouble
      }
    }
    // DP: e(i)(b) over split j ∈ 0..i-1 (empty buckets allowed);
    // argmin ties resolve to the SMALLEST j — mirrored by the oracle's
    // ORDER BY (cost, j)
    val e = Array.ofDim[Double](preBins + 1, buckets + 1)
    val arg = Array.ofDim[Int](preBins + 1, buckets + 1)
    (1 to preBins).foreach(i => e(i)(1) = sse(0, i))
    (2 to buckets).foreach { b =>
      (1 to preBins).foreach { i =>
        var bestJ = 0
        var best = Double.MaxValue
        (0 until i).foreach { j =>
          val cost = e(j)(b - 1) + sse(j, i)
          if (cost < best) { best = cost; bestJ = j }
        }
        e(i)(b) = best
        arg(i)(b) = bestJ
      }
    }
    // backtrack boundaries
    val his = new Array[Int](buckets + 1)
    his(buckets) = preBins
    (buckets to 2 by -1).foreach(b => his(b - 1) = arg(his(b))(b))
    val rows = (1 to buckets).map { b =>
      val (j, i) = (his(b - 1), his(b))
      val dc = pc(i) - pc(j)
      val mean = if (dc == 0) None
        else Some((ps(i) - ps(j)).toDouble / dc.toDouble)
      (b, j + 1, i, dc, mean, sse(j, i))
    }
    rows.toDF("bucket", "lo_bin", "hi_bin", "n", "mean", "sse")
  }

  /** Neyman-optimal stratified sample allocation: split a sampling
    * budget across strata proportional to `N_h·σ_h` (minimum-variance
    * allocation for a stratified mean), next to the naive
    * size-proportional split. The sampling-plan operator a curation
    * pipeline runs before drawing the q64/q170 samples.
    *
    * Exactness: `N_h·σ_h = sqrt(N_h·Σy² − (Σy)²)` — one sqrt of an
    * exact DECIMAL difference; weights then snap to a floor(·2^20)
    * integer grid so BOTH largest-remainder roundings (Neyman and
    * proportional) are pure integer arithmetic — allocations sum to
    * the budget exactly and ties resolve by stratum name. Float sums
    * across strata never happen (they would make the remainder ranking
    * order-dependent).
    *
    * Scale: one map-combined groupBy to |strata| rows; everything
    * after runs on that frame. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
                       valueCents: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val dec = DecimalType(38, 0)
    val grid = 1048576.0 // 2^20
    val g = df.filter(valueCents.isNotNull)
      .select(col(stratumCol).as("stratum"), valueCents.as("__y"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_pop"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
      .withColumn("__varnum",
        col("n_pop").cast(dec) * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("sigma",
        sqrt(col("__varnum").cast("double")) / col("n_pop").cast("double"))
      .withColumn("__wq",
        floor(sqrt(col("__varnum").cast("double")) * lit(grid))
          .cast(dec))
    def largestRemainder(weight: Column, outCol: String)(in: DataFrame)
        : DataFrame = {
      val all = Window.partitionBy(lit(1))
      val withTot = in
        .withColumn("__w", weight.cast(dec))
        .withColumn("__tot", sum(col("__w")).over(all))
        .withColumn("__bn", col("__w") * lit(budget).cast(dec))
        .withColumn("__floor", expr("__bn div __tot"))
        .withColumn("__rem", col("__bn") - col("__floor") * col("__tot"))
        .withColumn("__left",
          lit(budget) - sum(col("__floor")).over(all))
        .withColumn("__rk", row_number().over(
          all.orderBy(col("__rem").desc, col("stratum"))))
      withTot.withColumn(outCol,
        (col("__floor") + when(col("__rk") <= col("__left"), 1L)
          .otherwise(0L)).cast("long"))
        .drop("__w", "__tot", "__bn", "__floor", "__rem", "__left", "__rk")
    }
    val out = largestRemainder(col("n_pop"), "alloc_proportional")(
      largestRemainder(col("__wq"), "alloc_neyman")(g))
    out.select(col("stratum"), col("n_pop"), col("sigma"),
      col("alloc_neyman"), col("alloc_proportional"))
  }

  /** Heaps'-law fit: vocabulary growth `V(N) ≈ K·N^β` from the per-
    * document cumulative (token count, distinct-vocabulary) curve —
    * the complement of [[zipfFit]] (Zipf describes the frequency HEAD,
    * Heaps the vocabulary GROWTH a crawler/mixture planner extrapolates
    * to budget dedup and tokenizer coverage). β well below 1 means new
    * data stops adding vocabulary — more of the same.
    *
    * Points are per-doc (in `idCol` order): cumN = running token count,
    * cumV = running first-occurrence count (a term counts at its
    * MIN-doc). Log points snap to the floor(·2^20) grid and the OLS is
    * the exact-integer div-trick fit shared with [[zipfFit]].
    *
    * Scale: tokenize + two groupBys (per-doc counts, per-term first
    * doc) are the data-sized passes; the cumulative window runs on the
    * per-DOC frame (corpus/1000s of rows — for billion-doc frames swap
    * in the [[Scale.globalRowNumber]] telescoped prefix sum). */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grid = 1048576.0
    val toks = docs
      .select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
    val perDoc = toks.groupBy(col("__id"))
      .agg(count(lit(1)).as("__ntok"))
    val newV = toks.groupBy(col("__t"))
      .agg(min(col("__id")).as("__id"))
      .groupBy(col("__id")).agg(count(lit(1)).as("__newv"))
    val w = Window.orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perDoc.join(newV, Seq("__id"), "left")
      .na.fill(0L, Seq("__newv"))
      .withColumn("__cumn", sum(col("__ntok")).over(w))
      .withColumn("__cumv", sum(col("__newv")).over(w))
      .filter(col("__cumv") > 0 && col("__cumn") > 0)
    val lx = floor(log(col("__cumn").cast("double")) * lit(grid))
      .cast("long")
    val ly = floor(log(col("__cumv").cast("double")) * lit(grid))
      .cast("long")
    val dec = DecimalType(38, 0)
    val agg = pts.select(lx.as("__lx"), ly.as("__ly"))
      .agg(count(lit(1)).as("n"),
        sum(col("__lx")).as("__sx"), sum(col("__ly")).as("__sy"),
        sum(col("__lx") * col("__ly")).as("__sxy"),
        sum(col("__lx") * col("__lx")).as("__sxx"))
      .withColumn("__num",
        col("n").cast(dec) * col("__sxy").cast(dec)
          - col("__sx").cast(dec) * col("__sy").cast(dec))
      .withColumn("__den",
        col("n").cast(dec) * col("__sxx").cast(dec)
          - col("__sx").cast(dec) * col("__sx").cast(dec))
      .withColumn("__slope_scaled",
        expr("CAST((__num * 1073741824) div __den AS BIGINT)"))
    val slope = col("__slope_scaled").cast("double") / lit(1073741824.0)
    agg.select(col("n").as("n_points"), slope.as("beta"),
      ((col("__sy").cast("double") / lit(grid)
        - slope * (col("__sx").cast("double") / lit(grid)))
        / col("n").cast("double")).as("ln_k"))
  }

  /** Pairwise Jensen–Shannon divergence between per-group unigram
    * distributions — the "how different are these corpus sources
    * really" number a mixture designer reads next to the q141 overlap
    * sketch (JSD sees frequency shape; Jaccard-style overlap only sees
    * vocabulary membership).
    *
    * For each unordered group pair, over tokens present in BOTH
    * vocabularies the summand p·ln(2p/(p+q)) + q·ln(2q/(p+q)) is
    * computed per token as one double expression, snapped to the
    * floor(·2^30) integer grid, and summed exactly; tokens on one side
    * only contribute their whole mass at ln 2, recovered EXACTLY from
    * integer matched-count sums (never a float tally). Output JSD is in
    * bits ∈ [0, 1]: 0 = identical distributions, 1 = disjoint.
    *
    * Scale: one tokenize groupBy (map-combined), a broadcast of the
    * per-group totals (|groups| rows), and a token-keyed self-join —
    * shuffle O(vocab · groups), never O(docs²); a token shared by all S
    * groups fans out to S² pair rows, so the candidate bound is
    * vocab · S², with S the (small) group count. */
  def jsDivergence(docs: DataFrame, textCol: String,
                   groupCol: String): DataFrame = {
    val cnt = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("g"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy(col("g")).agg(sum(col("cnt")).as("total"))
    val dist = cnt.join(broadcast(tot), Seq("g"))
    val a = dist.select(col("g").as("ga"), col("token"),
      col("cnt").as("ca"), col("total").as("na"))
    val b = dist.select(col("g").as("gb"), col("token"),
      col("cnt").as("cb"), col("total").as("nb"))
    val p = col("ca").cast("double") / col("na").cast("double")
    val q = col("cb").cast("double") / col("nb").cast("double")
    val term = p * log(lit(2.0) * p / (p + q)) +
      q * log(lit(2.0) * q / (p + q))
    val joined = a.join(b, Seq("token"))
      .filter(col("ga") < col("gb"))
      .withColumn("__scaled", floor(term * lit(LogGrid)).cast("long"))
    val shared = joined.groupBy(col("ga"), col("gb"))
      .agg(
        count(lit(1)).as("n_shared_terms"),
        sum(col("__scaled")).as("__common"),
        sum(col("ca")).as("__ma"), sum(col("cb")).as("__mb"))
    // every unordered pair appears, even vocabulary-disjoint ones
    // (no shared tokens → the two missing-mass halves sum to ln 2 → 1 bit)
    val allPairs = tot.select(col("g").as("ga"), col("total").as("__na"))
      .crossJoin(broadcast(tot.select(col("g").as("gb"), col("total").as("__nb"))))
      .filter(col("ga") < col("gb"))
    allPairs.join(shared, Seq("ga", "gb"), "left")
      .na.fill(0L, Seq("n_shared_terms", "__common", "__ma", "__mb"))
      .withColumn("__nats",
        lit(0.5) * (col("__common").cast("double") / lit(LogGrid)) +
          lit(0.5) * lit(Ln2) *
          ((lit(1.0) - col("__ma").cast("double") / col("__na").cast("double"))
            + (lit(1.0) - col("__mb").cast("double") / col("__nb").cast("double"))))
      .select(
        col("ga").as("group_a"), col("gb").as("group_b"),
        col("__na").as("n_tokens_a"), col("__nb").as("n_tokens_b"),
        col("n_shared_terms"),
        (col("__nats") / lit(Ln2)).as("jsd_bits"))
  }

  /** Simpson's-paradox screen: does the x→y association within each
    * stratum point the same way as in the pooled data? Association is
    * the exact covariance NUMERATOR `n·Σxy − Σx·Σy` (the slope/Pearson
    * numerator — same sign, no division), computed per group and
    * pooled; a group is `is_reversed` when the two signs strictly
    * disagree. The one-scan aggregation-bias audit every per-segment
    * dashboard metric needs before anyone trusts the pooled trend.
    *
    * Inputs must be exact integers (cents / basis points). All sums are
    * DECIMAL(38,0)-exact; `cov_scale` is emitted as one
    * correctly-rounded double division (÷ n²) for readability. */
  def simpsonScreen(df: DataFrame, groupCols: Seq[String],
                    x: Column, y: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.filter(x.isNotNull && y.isNotNull)
      .select(groupCols.map(col) :+ x.cast(dec).as("__x")
        :+ y.cast(dec).as("__y"): _*)
    def moments(g: DataFrame, by: Seq[Column]) = {
      val agg = g.groupBy(by: _*).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"))
      agg.withColumn("__num",
        col("n").cast(dec) * col("__sxy") - col("__sx") * col("__sy"))
    }
    val grouped = moments(rows, groupCols.map(col))
    val pooled = moments(rows.withColumn("__all", lit(1)), Seq(col("__all")))
      .select(signum(col("__num").cast("double")).cast("int")
        .as("pooled_sign"))
    grouped.crossJoin(broadcast(pooled))
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        signum(col("__num").cast("double")).cast("int").as("group_sign"),
        col("pooled_sign"),
        (signum(col("__num").cast("double")).cast("int") * col("pooled_sign")
          === -1).as("is_reversed"),
        (col("__num").cast("double")
          / (col("n") * col("n")).cast("double")).as("cov_scale")): _*)
  }

  /** Single changepoint per series by binary segmentation: the split
    * that maximizes the between-segment scatter
    * `g(c) = S_l²/c + S_r²/(n−c)` (equivalently minimizes pooled SSE —
    * the first step of the classic binary-segmentation recursion).
    *
    * Input: one row per (series, position) with an integer value
    * (`valueCol`, e.g. revenue CENTS — integers make every prefix sum
    * exact). Output per series: the 1-based split position `c` (left
    * segment = positions 1..c), the ordering column's value at the
    * split, segment means, and the scatter gain over the no-split
    * baseline `S²/n`.
    *
    * Determinism: S_l, S_r, and their squares are exact
    * DECIMAL(38,0)/HUGEINT products; `g` and the baseline become
    * doubles via one correctly-rounded cast+division each, so the
    * argmax ordering (gain DESC, then earliest c) is engine-identical.
    *
    * Scale: two windows over (series, order) — a prefix sum and the
    * argmax row_number — both partitioned by series; no joins, no
    * cross-candidate quadratic work. Series length is the per-task
    * bound (daily grains: thousands of rows per series). */
  def changepoint(df: DataFrame, seriesCols: Seq[String],
                  orderCol: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val w = part.orderBy(col(orderCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df
      .withColumn("__c", row_number().over(w))
      .withColumn("__sl", sum(col(valueCol)).over(run).cast(dec))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__s", sum(col(valueCol)).over(part).cast(dec))
    val cand = base.filter(col("__c") < col("__n"))
      .withColumn("__sr", col("__s") - col("__sl"))
      .withColumn("__g",
        ((col("__sl") * col("__sl") * (col("__n") - col("__c")).cast(dec)
          + col("__sr") * col("__sr") * col("__c").cast(dec)).cast("double"))
          / (col("__c") * (col("__n") - col("__c"))).cast("double"))
      .withColumn("__base",
        (col("__s") * col("__s")).cast("double") / col("__n").cast("double"))
      .withColumn("gain", col("__g") - col("__base"))
    cand
      .withColumn("__rn", row_number().over(
        part.orderBy(col("gain").desc, col("__c"))))
      .filter(col("__rn") === 1)
      .select(seriesCols.map(col) ++ Seq(
        col("__n").as("n_points"),
        col("__c").cast("long").as("split_pos"),
        col(orderCol).as("split_at"),
        (col("__sl").cast("double") / col("__c").cast("double"))
          .as("left_mean"),
        (col("__sr").cast("double")
          / (col("__n") - col("__c")).cast("double")).as("right_mean"),
        col("gain")): _*)
  }

  /** Mergeable log-bucket quantile sketch (the HDR-histogram bucketing):
    * per-group quantile estimates with bounded relative error, WITHOUT a
    * per-group sort — the 100 TB path for "p50/p90/p99 length per
    * source" where exact nearest-rank percentiles would shuffle and
    * sort the corpus. Each non-positive value lands in one underflow
    * bucket; each positive long lands in bucket (e, sub) with
    * e = floor(log2(x)) (computed as length(bin(x)) − 1 — exact integer
    * string math, no float log anywhere) and sub = the value's
    * `subBuckets`-way linear split of [2^e, 2^(e+1)) — all integer
    * arithmetic, so two engines bucket identically. The sketch is the
    * (group, e, sub) → count table: ≤ 64·subBuckets + 1 rows per group,
    * trivially mergeable by addition (combine shards/days by summing
    * counts before the quantile pick).
    *
    * For each requested q, the estimate is the FIRST bucket (by (e,
    * sub)) whose cumulative count reaches ceil(q·n) — reported as that
    * bucket's [est_lo, est_hi) integer bounds, a relative-error band of
    * 1/subBuckets. Emits one row per (group, q): (group…, q, n, est_lo,
    * est_hi).
    *
    * Scale: one map-side-combined aggregation to the sketch, then
    * windows over the sketch-sized spine only. */
  def logBucketQuantiles(df: DataFrame, groupCols: Seq[String],
                         valCol: String, subBuckets: Int = 16,
                         qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    logBucketQuantilesFromSketch(
      logBucketSketch(df, groupCols, valCol, subBuckets),
      groupCols, subBuckets, qs)

  /** The sketch TABLE behind [[logBucketQuantiles]]: one row per
    * (group, e, sub) bucket with its count. Persist per shard/day and
    * MERGE by summing counts on (group, e, sub) —
    * [[mergeLogBucketSketches]] — then finalize with
    * [[logBucketQuantilesFromSketch]]; sketch(A ∪ B) ==
    * merge(sketch(A), sketch(B)) exactly (asserted in StatsSpec). */
  def logBucketSketch(df: DataFrame, groupCols: Seq[String],
                      valCol: String, subBuckets: Int = 16): DataFrame = {
    require(subBuckets >= 1 && (subBuckets & (subBuckets - 1)) == 0,
      s"subBuckets must be a power of two, got $subBuckets")
    val gs = groupCols.map(c => col(s"`$c`"))
    val x = col(s"`$valCol`").cast("long")
    df.filter(x.isNotNull)
      .select(gs :+ x.as("__x"): _*)
      .withColumn("__e",
        when(col("__x") <= 0, lit(-1)).otherwise(length(bin(col("__x"))) - 1))
      .withColumn("__base", expr(
        "CASE WHEN __e < 0 THEN CAST(0 AS BIGINT) " +
          "ELSE shiftleft(CAST(1 AS BIGINT), __e) END"))
      // divide-first when __base >= subBuckets (both powers of two, so
      // (x-base)·k div base == (x-base) div (base div k) EXACTLY): the
      // multiply form wraps Long for e >= 63 - log2(k). The multiply
      // branch only runs for tiny bases (< subBuckets) where it cannot
      // overflow.
      .withColumn("__sub", when(col("__e") < 0, lit(0L))
        .otherwise(expr(
          s"CASE WHEN __base >= $subBuckets " +
            s"THEN (__x - __base) div (__base div $subBuckets) " +
            s"ELSE ((__x - __base) * $subBuckets) div __base END")))
      .groupBy(gs ++ Seq(col("__e"), col("__sub"), col("__base")): _*)
      .agg(count(lit(1)).as("__n"))
  }

  /** Merge two sketches from [[logBucketSketch]] (same groupCols and
    * subBuckets): counts add on the bucket key. */
  def mergeLogBucketSketches(a: DataFrame, b: DataFrame,
                             groupCols: Seq[String]): DataFrame = {
    val keys = groupCols.map(c => col(s"`$c`")) ++
      Seq(col("__e"), col("__sub"), col("__base"))
    a.unionByName(b)
      .groupBy(keys: _*)
      .agg(sum(col("__n")).as("__n"))
  }

  /** Finalize quantiles from a (merged) sketch — the windowed pick of
    * [[logBucketQuantiles]], running on the sketch-sized spine only. */
  def logBucketQuantilesFromSketch(sk: DataFrame, groupCols: Seq[String],
                                   subBuckets: Int,
                                   qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    val gs = groupCols.map(c => col(s"`$c`"))
    val wCum = Window.partitionBy(gs: _*).orderBy(col("__e"), col("__sub"))
    val wTot = Window.partitionBy(gs: _*)
    val wPick = Window.partitionBy(gs :+ col("q"): _*)
      .orderBy(col("__e"), col("__sub"))
    sk
      .withColumn("__cum", sum(col("__n")).over(wCum))
      .withColumn("__tot", sum(col("__n")).over(wTot))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter(col("__cum") >= ceil(col("q") * col("__tot")))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      // ceil-division bounds: sub(x) >= s iff x >= base + ceil(s·base/k),
      // so [lo, hi) = [base + ceil(sub·base/k), base + ceil((sub+1)·base/k))
      // — floor-div would collapse hi onto lo whenever 2^e < subBuckets.
      // When base >= k the division is exact (powers of two), so the
      // divide-first form replaces the multiply (which wraps Long for
      // e >= 63 - log2(k)); the one unrepresentable bound — the top
      // sub-bucket of e = 62, whose exclusive hi is 2^63 — clamps to
      // Long.MaxValue (inclusive max, off the true bound by 1).
      .withColumn("est_lo", expr(
        s"CASE WHEN __e < 0 THEN CAST(0 AS BIGINT) " +
          s"WHEN __base >= $subBuckets " +
          s"THEN __base + __sub * (__base div $subBuckets) " +
          s"ELSE __base + (__sub * __base + $subBuckets - 1) div $subBuckets END"))
      .withColumn("est_hi", expr(
        s"CASE WHEN __e < 0 THEN CAST(1 AS BIGINT) " +
          s"WHEN __e = 62 AND __sub + 1 = $subBuckets " +
          s"THEN CAST(9223372036854775807 AS BIGINT) " +
          s"WHEN __base >= $subBuckets " +
          s"THEN __base + (__sub + 1) * (__base div $subBuckets) " +
          s"ELSE __base + ((__sub + 1) * __base + $subBuckets - 1) div $subBuckets END"))
      .select(gs ++ Seq(col("q"), col("__tot").as("n"),
        col("est_lo"), col("est_hi")): _*)
  }
}
