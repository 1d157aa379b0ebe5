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
}
