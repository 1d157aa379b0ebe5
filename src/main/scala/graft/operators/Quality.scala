package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality rule engine (SURVEY §2.2 P4, §2.7 U2; SQLproject1.sql:213-240).
  *
  * Reference semantics: each rule is a predicate whose violation COUNT is
  * recorded as a row `(issue_type, issue_detail, row_count)` in a load-issues
  * table — surfaced, not enforced. We evaluate all rules in ONE pass with
  * conditional aggregation (`sum(when(pred,1))`) instead of one scan per
  * rule: at 100 TB, N rules must not mean N table scans.
  */
object Quality {

  final case class Rule(issueType: String, issueDetail: String, predicate: Column)

  /** Evaluate all rules in a single scan; one output row per rule.
    *
    * `createdAt` is the reference's `CreatedAt DATETIME DEFAULT GETDATE()`
    * audit column (SQLproject1.sql:220) — issues from successive runs must
    * stay distinguishable when appended to a load-issues table. An explicit
    * parameter (never wall clock) keeps runs deterministic; None omits the
    * column. */
  def check(df: DataFrame, rules: Seq[Rule],
            createdAt: Option[String] = None): DataFrame = {
    require(rules.nonEmpty, "Quality.check needs at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count(when(r.predicate, lit(1))).as(s"__c$i")
    }
    val counts = df.agg(aggs.head, aggs.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val meta = rules.zipWithIndex
      .map { case (r, i) => (i, r.issueType, r.issueDetail) }
      .toDF("__i", "issue_type", "issue_detail")
    // counts is a single row: stack it to (rule index, count) and join the
    // rule metadata (both sides tiny — broadcast, no shuffle of the fact).
    val stacked = counts.select(
      explode(array(rules.indices.map(i =>
        struct(lit(i).as("__i"), col(s"__c$i").as("row_count"))): _*)).as("kv"))
      .select(col("kv.__i"), col("kv.row_count"))
    val out = stacked.join(broadcast(meta), "__i")
      .select(col("issue_type"), col("issue_detail"), col("row_count"))
    createdAt.fold(out)(ts =>
      out.withColumn("created_at", to_timestamp(lit(ts))))
  }

  /** One-pass column profiler: null rate, distinct count, min/max per
    * column, one output row per column (values canonicalized to strings).
    * The single wide aggregate keeps it at ONE table scan regardless of
    * column count — at 100 TB, profiling must not be N scans. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "Quality.profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = one.select(explode(array(columns.map(c =>
      struct(lit(c).as("column_name"),
        col(s"__cnt_$c").as("n_present"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
    stacked.select(col("p.*"))
  }

  /** §1.3 constraint checks (Spark enforces nothing — assert post-build). */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()

  /** FK integrity: rows in `fact` whose `fk` has no match in `dim.pk`. */
  def orphanCount(fact: DataFrame, fk: String, dim: DataFrame, pk: String): Long =
    fact.join(dim.select(col(pk)), fact(fk) === dim(pk), "left_anti").count()

  /** Exact-moment descriptive statistics per group: n, mean, sample
    * stddev, skewness of `x`, and Pearson corr(x, y) — all derived from
    * EXACT decimal power sums (Σx, Σx², Σx³, Σy, Σy², Σxy) rather than
    * the engine's streaming moment aggregates.
    *
    * Why: built-in var/corr/skewness merge partial moments in partition
    * order, so their float results differ run-to-run and engine-to-engine.
    * Decimal sums are associative and exact (x is capped at DECIMAL(12,2),
    * so x³ fits DECIMAL(38,6) with no precision-loss rescale in either
    * Spark or DuckDB), and the closed-form double arithmetic BELOW the
    * sums is a fixed expression tree — bit-identical everywhere. This is
    * also the 100 TB shape: one map-side-combined aggregation pass, six
    * decimal sums per group, zero extra shuffles. */
  def exactMoments(df: DataFrame, groupCols: Seq[String], xCol: String,
                   yCol: String): DataFrame = {
    val D = DecimalType(12, 2)
    val x = col(xCol).cast(D)
    val y = col(yCol).cast(D)
    val agg = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("__sx"), sum(x * x).as("__sxx"),
      sum(x * x * x).as("__sxxx"),
      sum(y).as("__sy"), sum(y * y).as("__syy"),
      sum(x * y).as("__sxy"))
    val nd = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sxx = col("__sxx").cast("double")
    val sxxx = col("__sxxx").cast("double")
    val sy = col("__sy").cast("double")
    val syy = col("__syy").cast("double")
    val sxy = col("__sxy").cast("double")
    val meanX = sx / nd
    // sample variance via the computational formula, one fixed tree.
    // Every data-dependent divisor goes through nullif: Spark 4 runs ANSI
    // mode by default, where x/0.0 THROWS instead of yielding NULL — a
    // singleton group or a constant column must degrade to NULL stats,
    // not kill the whole aggregation
    val varX = (nd * sxx - sx * sx) / nullif(nd * (nd - lit(1.0)), lit(0.0))
    // population central moments for Fisher skewness g1 = m3 / m2^(3/2)
    val m2 = sxx / nd - meanX * meanX
    val m3 = sxxx / nd - lit(3.0) * meanX * (sxx / nd) +
      lit(2.0) * meanX * meanX * meanX
    val corr = (nd * sxy - sx * sy) /
      nullif(sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy), lit(0.0))
    agg.select((groupCols.map(col) ++ Seq(
      col("n"),
      meanX.as("mean_x"),
      sqrt(varX).as("stddev_x"),
      (m3 / nullif(m2 * sqrt(m2), lit(0.0))).as("skewness_x"),
      corr.as("corr_xy"))): _*)
  }

  /** Winsorized + trimmed aggregates per group: cut values at the
    * `pLow`/`pHigh` rank quantiles (cutoff = value at rank
    * ceil(p * n) under the value ordering), CLAMP for the winsorized
    * mean, DROP for the trimmed mean. Robust location estimates that
    * outlier rows (price glitches, token-count explosions) cannot move.
    *
    * Determinism under ties: rank boundaries may split tied rows
    * arbitrarily, but tied rows carry EQUAL values, so the clamped and
    * trimmed SUMS — and therefore the emitted means — are invariant to
    * the tie order. Means come from exact decimal sums over a single
    * division.
    *
    * Scale: one window pass (rank + count + conditional cutoff maxima
    * share the partition) and one groupBy on the same key — Spark plans
    * ONE exchange. No per-group sorting beyond the window's, no
    * approximate percentile sketches. */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String], valCol: String,
                      pLow: Double, pHigh: Double): DataFrame = {
    require(0 <= pLow && pLow < pHigh && pHigh <= 1,
      s"need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    val D = DecimalType(18, 2)
    val v = col(valCol)
    val part = Window.partitionBy(groupCols.map(col): _*)
    val ordered = part.orderBy(v.asc)
    val ranked = df
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(part))
      // 1e-9 shim: see exactPercentiles — keeps ceil() on the exact rank
      // when the IEEE product lands just above an integer
      .withColumn("__klo", ceil(lit(pLow) * col("__n") - lit(1e-9)))
      .withColumn("__khi", ceil(lit(pHigh) * col("__n") - lit(1e-9)))
    val cut = ranked
      .withColumn("__lo", max(when(col("__rn") <= col("__klo"), v)).over(part))
      .withColumn("__hi", max(when(col("__rn") <= col("__khi"), v)).over(part))
      // empty low tail (klo = 0): clamp only from above
      .withColumn("__w",
        least(greatest(v, coalesce(col("__lo"), v)), col("__hi")))
    cut.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      first(col("__lo")).as("low_cut"),
      first(col("__hi")).as("high_cut"),
      (sum(col("__w").cast(D)).cast("double") / count(lit(1)))
        .as("winsorized_mean"),
      // nullif: a group whose trim window is empty (klo == khi, e.g. a
      // singleton) must yield NULL, not an ANSI divide-by-zero error
      (sum(when(col("__rn") > col("__klo") && col("__rn") <= col("__khi"),
        v.cast(D))).cast("double") /
        nullif(sum(when(
          col("__rn") > col("__klo") && col("__rn") <= col("__khi"),
          1L).otherwise(0L)), lit(0L))).as("trimmed_mean"))
  }

  /** Snapshot reconciliation: classify every natural key across two table
    * versions as `added`, `removed`, `changed`, or `unchanged` by a
    * full-outer join on the key and a hash compare of the tracked
    * attribute columns — the drift report run after every reload to prove
    * an idempotent pipeline actually was (the engine-side form of the
    * reference's post-load QA counts).
    *
    * Equality is the SCD2 canonical form (Hashing.canonical): values are
    * upper-cased, NULL folds to '', and columns join on '|'. So
    * case-only edits, NULL↔'' flips, and '|'-boundary shifts across
    * adjacent compareCols all read as `unchanged` — the same change
    * sensitivity the reference's HASHBYTES pipeline has. Pass
    * pre-escaped/cased columns if those distinctions must count as
    * drift.
    *
    * Emits (keys..., change_type, old_hash, new_hash). Scale: one
    * full-outer shuffle join on the key; attribute payloads reduce to one
    * 64-hex hash per side before the join, so wide tables do not widen
    * the exchange. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    def hashed(df: DataFrame, as: String) = df.select(
      keys.map(col) :+
        graft.functions.Hashing.hashDiff(compareCols.map(col)).as(as): _*)
    hashed(oldDf, "old_hash")
      .join(hashed(newDf, "new_hash"), keys, "full_outer")
      .withColumn("change_type",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed"))
      .select((keys.map(col) :+ col("change_type") :+ col("old_hash") :+
        col("new_hash")): _*)
  }

  /** Exact rank-based percentiles per group: for each p, the value at
    * rank ceil(p * n) under the value ordering (the nearest-rank
    * definition — always an actual data value, deterministic under ties,
    * and identical across engines, unlike interpolating or sketched
    * percentiles). One window pass + one conditional aggregation sharing
    * the same exchange. Emits (group..., n, p<pp> per requested p). */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String],
                       valCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"percentiles must be in (0, 1], got $ps")
    val part = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(part.orderBy(col(valCol).asc)))
      .withColumn("__n", count(lit(1)).over(part))
    val aggs = count(lit(1)).as("n") +: ps.map { p =>
      val label = "p" + math.round(p * 100)
      // the 1e-9 shim keeps ceil() on the documented nearest-rank: the
      // IEEE product p*n can land a hair ABOVE an exact integer
      // (0.07*100 = 7.000000000000001) and ceil would skip to rank+1
      max(when(col("__rn") <=
          ceil(lit(p) * col("__n") - lit(1e-9)), col(valCol)))
        .as(label)
    }
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic grouped mode: the most frequent value per group, ties
    * broken by the smaller value — two map-side-combined aggregations and
    * a WindowGroupLimit-capped rank, never a per-group sort of raw rows.
    * Emits (group..., mode_value, n_occurrences). */
  def groupedMode(df: DataFrame, groupCols: Seq[String],
                  valCol: String): DataFrame = {
    val counts = df
      .filter(col(valCol).isNotNull)
      .groupBy((groupCols.map(col) :+ col(valCol).as("mode_value")): _*)
      .agg(count(lit(1)).as("n_occurrences"))
    counts
      .withColumn("__rk", row_number().over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("n_occurrences").desc, col("mode_value").asc)))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Fixed-range equi-width histogram per group: `nBuckets` buckets over
    * [lo, hi); values below clamp to bucket 0, at-or-above to the last
    * bucket. Emits (group..., bucket, bucket_lo, n_rows) for non-empty
    * buckets. Bounds are explicit parameters (at scale, bounds come from
    * a prior cheap min/max pass or domain knowledge) so the histogram is
    * ONE map-side-combined aggregation — no sort, no sketch. */
  def histogram(df: DataFrame, groupCols: Seq[String], valCol: String,
                nBuckets: Int, lo: Double, hi: Double): DataFrame = {
    require(nBuckets >= 1 && lo < hi, "need nBuckets >= 1 and lo < hi")
    val width = (hi - lo) / nBuckets
    val raw = floor((col(valCol).cast("double") - lit(lo)) / lit(width))
    val bucket = least(greatest(raw, lit(0L)), lit(nBuckets - 1L)).cast("int")
    df.filter(col(valCol).isNotNull)
      .groupBy((groupCols.map(col) :+ bucket.as("bucket")): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bucket_lo", lit(lo) + col("bucket") * lit(width))
  }

  /** Robust per-group outliers via median absolute deviation: flag rows
    * where |value - median| > nMads × MAD. Unlike z-scores, both the
    * center and the spread estimate are immune to the outliers being
    * hunted (a single 10⁹ value drags a mean/stddev fence but moves the
    * median fence not at all). Medians are nearest-rank
    * ([[exactPercentiles]]) so the fence is an actual data value,
    * deterministic and engine-portable.
    *
    * Emits the OUTLIER rows with (group_median, group_mad, deviation)
    * attached. Caveat: a group where >50% of values are identical has
    * MAD = 0 and every other value flags; gate on group_mad > 0
    * downstream if that degenerates. Scale: two [[exactPercentiles]]
    * passes (each one window + one agg on the group key) and two
    * broadcast-size joins of per-group scalars back onto the rows. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valCol: String,
                  nMads: Double): DataFrame = {
    require(nMads > 0, s"nMads must be > 0, got $nMads")
    val base = df.filter(col(valCol).isNotNull)
    val med = exactPercentiles(base, groupCols, valCol, Seq(0.5))
      .select(groupCols.map(col) :+ col("p50").as("group_median"): _*)
    val dev = base.join(med, groupCols)
      .withColumn("deviation",
        abs(col(valCol).cast("double") - col("group_median").cast("double")))
    val mad = exactPercentiles(dev, groupCols, "deviation", Seq(0.5))
      .select(groupCols.map(col) :+ col("p50").as("group_mad"): _*)
    dev.join(mad, groupCols)
      .filter(col("deviation") > lit(nMads) * col("group_mad"))
  }

  /** One foreign-key relation for [[fkConformance]]: a display name, the
    * child table + FK column, and the parent table + PK column. */
  final case class FkRelation(name: String, child: DataFrame, fkCol: String,
                              parent: DataFrame, pkCol: String)

  /** Referential-integrity audit across a star schema: for each declared
    * FK relation, the child row count, NULL-FK count, and ORPHAN count
    * (non-null FK with no matching parent key). One row per relation —
    * the first dashboard a warehouse loads after ingest, and the gate
    * before dimension joins silently drop fact rows (inner) or emit
    * nulls (left).
    *
    * Scale: each relation costs one left-anti join against the DISTINCT
    * parent keys — a dim-sized (usually broadcast) build side; the child
    * side is a counting scan. Relations are independent — Spark runs the
    * unioned branches concurrently. */
  def fkConformance(relations: Seq[FkRelation]): DataFrame = {
    require(relations.nonEmpty, "need at least one FK relation")
    relations.map { r =>
      val fk = col(r.fkCol)
      val keys = r.parent.select(col(r.pkCol).as(r.fkCol)).distinct()
      val counts = r.child.agg(
        count(lit(1)).as("n_child_rows"),
        count(when(fk.isNull, 1)).as("n_null_fk"))
      val orphans = r.child.filter(fk.isNotNull)
        .join(broadcast(keys), Seq(r.fkCol), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      counts.crossJoin(orphans).select(lit(r.name).as("relation"),
        col("n_child_rows"), col("n_null_fk"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /** WEIGHTED percentiles per group: the smallest value whose cumulative
    * weight reaches p of the group's total weight (the weighted
    * nearest-rank; with unit weights it degenerates to
    * [[exactPercentiles]]). The p threshold is a RATIONAL num/den pair
    * and the crossing test is `den·cumw >= num·totw` in exact DECIMAL —
    * no float product ever sits on the boundary, so engines can't
    * disagree on which side a row falls (the failure mode of
    * `cumw >= p*totw` with p irrational in binary).
    *
    * Tie safety: rows tying on the value may accumulate in any order,
    * but the emitted MIN value that crosses the threshold is the same
    * whichever tied row crosses — output is deterministic without a
    * tiebreak column.
    *
    * Emits (group..., total_weight, <label>...). One window + one agg,
    * both on the group key — single exchange. */
  def weightedPercentiles(df: DataFrame, groupCols: Seq[String],
                          valCol: String, weightCol: String,
                          ps: Seq[(String, Int, Int)]): DataFrame = {
    require(ps.nonEmpty, "need at least one (label, num, den) percentile")
    ps.foreach { case (_, n, dEn) =>
      require(n > 0 && dEn > 0 && n <= dEn, s"need 0 < num <= den, got $n/$dEn")
    }
    val part = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .filter(col(valCol).isNotNull && col(weightCol).isNotNull)
      .withColumn("__w", col(weightCol).cast("decimal(18,2)"))
      .withColumn("__cumw", sum(col("__w")).over(
        part.orderBy(col(valCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__totw", sum(col("__w")).over(part))
    val aggs = max(col("__totw")).cast("double").as("total_weight") +:
      ps.map { case (label, num, den) =>
        min(when(col("__cumw") * lit(den) >= col("__totw") * lit(num),
          col(valCol))).as(label)
      }
    ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Pearson chi-square statistic for a two-variant binary experiment
    * (the significance companion to a hash-split A/B report): one row
    * per unit with a variant label and a 0/1 success flag in, one row
    * out with the 2×2 counts and χ² (1 d.f., no continuity correction).
    *
    * χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — the closed form, with
    * every product computed in DECIMAL(38,0) from exact BIGINT counts
    * and ONE final double division, so the statistic is bit-reproducible
    * across engines (the q140/q146 discipline: exact accumulation, one
    * inexact step). NULL when any margin is 0 (the statistic is
    * undefined — a one-sided table can't evidence anything).
    *
    * The two variants are pinned by NAME (min label = variant_a) so the
    * output is deterministic regardless of input order; requires exactly
    * two distinct variant labels.
    *
    * Scale: one map-side-combined groupBy on the variant label (2 rows
    * out), then scalar math on a 1-row frame. */
  def chi2TwoByTwo(df: DataFrame, variantCol: String,
                   successCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val perVariant = df
      .filter(col(variantCol).isNotNull)
      .groupBy(col(variantCol).as("__v"))
      .agg(count(lit(1)).as("__n"),
        sum(col(successCol).cast("long")).as("__s"))
    val wide = perVariant.agg(
      count(lit(1)).as("__nv"),
      min(col("__v")).as("variant_a"),
      max(col("__v")).as("variant_b"),
      min(struct(col("__v"), col("__n"), col("__s"))).as("__fa"),
      max(struct(col("__v"), col("__n"), col("__s"))).as("__fb"))
    val a = col("__fa.__s").cast(D)                      // A successes
    val b = (col("__fa.__n") - col("__fa.__s")).cast(D)  // A failures
    val c = col("__fb.__s").cast(D)                      // B successes
    val d = (col("__fb.__n") - col("__fb.__s")).cast(D)  // B failures
    val n = (col("__fa.__n") + col("__fb.__n")).cast(D)
    val det = a * d - b * c
    val denom = (a + b) * (c + d) * (a + c) * (b + d)
    wide
      .filter(col("__nv") === 2)
      .select(col("variant_a"), col("variant_b"),
        col("__fa.__n").as("n_a"), col("__fa.__s").as("success_a"),
        col("__fb.__n").as("n_b"), col("__fb.__s").as("success_b"),
        (col("__fa.__s").cast("double") / col("__fa.__n").cast("double"))
          .as("rate_a"),
        (col("__fb.__s").cast("double") / col("__fb.__n").cast("double"))
          .as("rate_b"),
        ((n * det * det).cast("double") /
          nullif(denom.cast("double"), lit(0.0))).as("chi2"))
  }

  /** CUPED variance reduction for an A/B experiment: the post-period
    * metric y is adjusted by the pre-period covariate x via
    * y' = y − θ·(x − E[x]), θ = cov(x,y)/var(x) estimated on the POOLED
    * population (the standard one-θ CUPED). The adjustment is linear,
    * so the per-variant adjusted mean needs only variant-level sums:
    *   mean_adj_v = mean_y_v − θ·(mean_x_v − mean_x_pooled)
    * — ONE aggregation pass over the units, no per-unit output.
    *
    * Determinism contract: y and x must be exact decimals; sums and
    * cross-product sums accumulate in decimal (exact, order-free), and
    * θ/means come from the exact sums through correctly-rounded double
    * ops only. θ is NULL (and mean_adj = mean_y) when var(x) = 0.
    *
    * Emits one row per variant: n, mean_y, mean_x, theta, mean_adj. */
  def cupedAdjust(units: DataFrame, variantCol: String,
                  y: Column, x: Column): DataFrame = {
    val g = units
      .filter(y.isNotNull && x.isNotNull)
      .groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"), sum(y).as("sy"), sum(x).as("sx"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    val tot = g.agg(sum(col("n")).as("tn"),
      sum(col("sy")).cast("double").as("tsy"),
      sum(col("sx")).cast("double").as("tsx"),
      sum(col("sxy")).cast("double").as("tsxy"),
      sum(col("sxx")).cast("double").as("tsxx"))
    val nD = col("tn").cast("double")
    val varX = col("tsxx") - col("tsx") * col("tsx") / nD
    val covXY = col("tsxy") - col("tsx") * col("tsy") / nD
    g.crossJoin(broadcast(tot))
      .withColumn("theta", covXY / nullif(varX, lit(0.0)))
      .withColumn("mean_y", col("sy").cast("double") / col("n").cast("double"))
      .withColumn("mean_x", col("sx").cast("double") / col("n").cast("double"))
      .withColumn("mean_adj",
        col("mean_y") - coalesce(col("theta"), lit(0.0)) *
          (col("mean_x") - col("tsx") / nD))
      .select(col("variant"), col("n"), col("mean_y"), col("mean_x"),
        col("theta"), col("mean_adj"))
  }

  /** Population stability index of an integer-valued score per source
    * against the POOLED corpus distribution (source included — a
    * monitoring baseline, not a holdout): fixed equal-width buckets from
    * the global [min, max] by integer math, add-one smoothing so empty
    * buckets stay finite, and
    *   PSI_s = Σ_b (p_b − q_b) · ln(p_b / q_b)
    * with p the pooled and q the source proportions.
    *
    * Determinism contract (the unigramCrossEntropy discipline): bucket
    * assignment and counts are exact integers; p, q, p/q and ln run as
    * correctly-rounded double ops from those integers; each bucket term
    * is floored onto the 2⁻³⁰ grid and the cross-bucket sum accumulates
    * in BIGINT — exact, associative, partition-order-free. The ≤ 2⁻³⁰
    * per-bucket quantization is far below any alerting threshold.
    *
    * Scale: one scan to count (source, bucket) with map-side combine;
    * the dense source × bucket grid, pooled counts, and PSI all run on
    * sources×buckets rows. */
  def psiDrift(df: DataFrame, sourceCol: String, value: Column,
               buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val Scale = 1073741824L // 2^30
    val base = df
      .filter(col(sourceCol).isNotNull && value.isNotNull)
      .select(col(sourceCol).as("source"), value.cast("long").as("v"))
    val bounds = base.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val counts = base.crossJoin(broadcast(bounds))
      .withColumn("b",
        when(col("mx") === col("mn"), lit(0))
          .otherwise(expr(s"cast(((v - mn) * $buckets) div (mx - mn + 1) as int)")))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("c"))
    val spine = counts.select(col("source")).distinct()
      .crossJoin(counts.sparkSession.range(buckets).toDF("b")
        .select(col("b").cast("int").as("b")))
    val dense = spine.join(counts, Seq("source", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val pooled = dense.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val nS = dense.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val nR = pooled.agg(sum(col("cr")).as("nr"))
    val p = (col("cr") + 1).cast("double") /
      (col("nr") + buckets).cast("double")
    val q = (col("c") + 1).cast("double") /
      (col("ns") + buckets).cast("double")
    dense
      .join(broadcast(pooled), Seq("b"))
      .join(broadcast(nS), Seq("source"))
      .crossJoin(broadcast(nR))
      .withColumn("__term",
        floor((p - q) * floor(log(p / q) * lit(Scale.toDouble)))
          .cast("long"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_rows"),
        (sum(col("__term")).cast("double") / lit(Scale.toDouble)).as("psi"))
  }

  /** Per-group concentration profile: Gini coefficient and Herfindahl
    * index over entity-level values — "how unequal / how concentrated
    * is this market (or source, or shard)". The corpus-curation use is
    * source-dominance monitoring; the BI use is revenue concentration.
    *
    * Exact-integer discipline: `value` must be exact (cast money to
    * DECIMAL first) with at most `unitScale` fractional digits; it is
    * scaled to integer units (×10^unitScale) and every sum — total,
    * rank-weighted, squared — accumulates exactly in DECIMAL(38,0).
    * gini = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) and hhi = Σx² / (Σx)² are
    * emitted via the repo's 2³⁰-scaled integer-division discipline
    * (floor(ratio·2³⁰) computed in exact integer arithmetic, then one
    * exact-by-power-of-two division — a squared sum cast straight to
    * double would double-round past 2⁵³). Metrics are quantized to
    * 2⁻³⁰ ≈ 1e-9; groups with a zero total emit NULL metrics.
    *
    * Scale: one per-group rank window (partitioned — no global sort)
    * feeding one map-combined aggregation; output is |groups| rows. */
  def concentrationProfile(df: DataFrame, group: Column, id: Column,
                           value: Column, unitScale: Int = 2): DataFrame = {
    require(unitScale >= 0 && unitScale <= 9,
      s"unitScale must be in [0, 9], got $unitScale")
    val mult = math.pow(10, unitScale).toLong
    val base = df.select(group.as("grp"), id.as("__id"),
        (value * lit(mult)).cast(DecimalType(38, 0)).as("__u"))
      .filter(col("__u").isNotNull)
    val ranked = base.withColumn("__i", row_number().over(
      Window.partitionBy(col("grp")).orderBy(col("__u"), col("__id"))))
    val S = 1073741824L // 2^30
    ranked.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("__u")).as("__sx"),
        sum(col("__u") * col("__i")).as("__six"),
        sum(col("__u") * col("__u")).as("__sxx"))
      .select(col("grp"), col("n"),
        (col("__sx").cast("double") / lit(mult.toDouble)).as("total"),
        when(col("__sx") === 0, lit(null).cast("double"))
          .otherwise(
            expr(s"((2 * __six - (n + 1) * __sx) * $S) div (n * __sx)")
              .cast("double") / lit(S.toDouble)).as("gini"),
        when(col("__sx") === 0, lit(null).cast("double"))
          .otherwise(
            expr(s"(__sxx * $S) div (__sx * __sx)")
              .cast("double") / lit(S.toDouble)).as("hhi"))
  }

  /** Poisson(1) cumulative probabilities P(X <= k), k = 0..6 — the
    * inverse-CDF thresholds for the deterministic bootstrap draw.
    * Literal constants shared verbatim with the SQL oracle, so both
    * engines parse the identical doubles. */
  val PoissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712)

  /** Deterministic Poisson bootstrap confidence intervals per group:
    * each (row, replicate) gets a Poisson(1) resample weight drawn by
    * inverse-CDF from a 48-bit md5 hash uniform — the reproducible,
    * engine-portable bootstrap (a real RNG would differ per engine and
    * per partitioning). Emits the group mean, nearest-rank quantile
    * bounds of the replicate means, and the replicate count.
    *
    * Exactness: the uniform is hash48 / 2^48 (exact integer → one exact
    * power-of-two division); thresholds are shared literals; weighted
    * sums accumulate exactly (weight · DECIMAL value); each replicate
    * mean is one IEEE division of exact operands (weighted cents must
    * stay under 2^53 per group-replicate — cast wider money upstream if
    * not); quantile selection is integer index math over the sorted
    * replicate means.
    *
    * Scale: one explode (× reps) into a map-combined (group, rep)
    * aggregation — groups·reps rows out of the heavy stage; the
    * quantile window runs on groups × reps rows only. */
  def bootstrapCi(df: DataFrame, group: Column, id: Column, value: Column,
                  reps: Int = 100, loQ: Double = 0.025,
                  hiQ: Double = 0.975, seed: String = "bs"): DataFrame = {
    require(reps >= 2, s"reps must be >= 2, got $reps")
    require(loQ > 0 && hiQ < 1 && loQ < hiQ, "need 0 < loQ < hiQ < 1")
    val base = df.select(group.as("grp"), id.as("__id"), value.as("__x"))
      .filter(col("__x").isNotNull)
    val rep = base.withColumn("rep",
      explode(sequence(lit(0), lit(reps - 1))))
    val u = (conv(substring(md5(concat_ws(":", lit(seed),
        col("__id").cast("string"), col("rep").cast("string"))), 1, 12),
      16, 10).cast("long").cast("double") / lit(281474976710656.0)) // 2^48
    val w = PoissonCdf1.zipWithIndex
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (c, k)) =>
        acc.when(u < c, k.toLong) }
      .otherwise(7L)
    val repMeans = rep.withColumn("__w", w)
      .groupBy(col("grp"), col("rep"))
      .agg(sum(col("__w") * col("__x")).as("__swx"),
        sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0)
      .select(col("grp"), col("rep"),
        (col("__swx").cast("double") / col("__sw").cast("double"))
          .as("__mean"))
    val ordered = repMeans
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("__mean"), col("rep"))))
      .withColumn("__nr", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .withColumn("__ilo",
        floor(lit(loQ) * (col("__nr") - 1).cast("double")).cast("long") + 1)
      .withColumn("__ihi",
        floor(lit(hiQ) * (col("__nr") - 1).cast("double")).cast("long") + 1)
    val bounds = ordered.groupBy(col("grp"))
      .agg(max(when(col("__r") === col("__ilo"), col("__mean"))).as("ci_lo"),
        max(when(col("__r") === col("__ihi"), col("__mean"))).as("ci_hi"),
        max(col("__nr")).as("n_reps"))
    val point = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        (sum(col("__x")).cast("double") / count(lit(1)).cast("double"))
          .as("mean"))
    point.join(bounds, Seq("grp"), "left")
  }

  /** A/B power analysis from pilot data: per group, the minimum
    * detectable effect at alpha = 0.05 (two-sided), power = 0.8 —
    * MDE = (z_{α/2} + z_{β})·√(2·s²/n) — the "how long must this test
    * run" planning artifact. Variance accumulates exactly in integer
    * units (DECIMAL(38,0) cents): s² = (n·Σu² − (Σu)²) div (n·(n−1))
    * is an exact integer quotient (cents² resolution, the documented
    * quantization), and every later step is the same IEEE op sequence
    * in both engines. The z constant is a shared literal. */
  def powerAnalysis(df: DataFrame, group: Column, value: Column,
                    unitScale: Int = 2): DataFrame = {
    require(unitScale >= 0 && unitScale <= 9,
      s"unitScale must be in [0, 9], got $unitScale")
    val mult = math.pow(10, unitScale).toLong
    val zTotal = 2.8015852181129683 // z_{0.025} + z_{0.2}
    val base = df.select(group.as("grp"),
        (value * lit(mult)).cast(DecimalType(38, 0)).as("__u"))
      .filter(col("__u").isNotNull)
    base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("__u")).as("__s"),
        sum(col("__u") * col("__u")).as("__q"))
      .filter(col("n") >= 2)
      .withColumn("__v2",
        expr("(n * __q - __s * __s) div (n * (n - 1))"))
      .select(col("grp"), col("n"),
        (col("__s").cast("double") / (col("n") * mult).cast("double"))
          .as("mean"),
        (col("__v2").cast("double") / lit((mult * mult).toDouble))
          .as("variance"))
      .withColumn("mde_abs",
        lit(zTotal) * sqrt(lit(2.0) * col("variance") /
          col("n").cast("double")))
      .withColumn("mde_rel", col("mde_abs") / col("mean"))
  }

  /** k-anonymity audit over quasi-identifier columns: every QI combo
    * with its population and an `at_risk` flag (n < k). The privacy
    * gate a training-data release runs before shipping user-derived
    * rows — at-risk combos must be generalized or suppressed.
    * One map-combined groupBy; output is |combos| rows. */
  def kAnonymityAudit(df: DataFrame, qi: Seq[(String, Column)],
                      k: Int): DataFrame = {
    require(qi.nonEmpty, "qi must be non-empty")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qi.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** l-diversity audit — the k-anonymity complement: a quasi-identifier
    * group can be large (k-safe) yet reveal everyone's sensitive value
    * if that value is CONSTANT within it. Per group: row count, number
    * of distinct sensitive values, the majority sensitive share, and
    * `at_risk` when distinct values < l (distinct l-diversity, the
    * standard first-line check). One grouped aggregation on
    * (qi, sensitive) then a group rollup — two map-combined exchanges,
    * no windows over the data. */
  def lDiversityAudit(df: DataFrame, qi: Seq[(String, Column)],
                      sensitive: Column, l: Int): DataFrame = {
    require(qi.nonEmpty, "qi must be non-empty")
    require(l >= 2, s"l must be >= 2, got $l")
    val cell = df.groupBy((qi.map { case (n, c) => c.as(n) } :+
        sensitive.as("__s")): _*)
      .agg(count(lit(1)).as("__n"))
    cell.groupBy(qi.map { case (n, _) => col(s"`$n`") }: _*)
      .agg(sum(col("__n")).as("n"),
        count(lit(1)).as("n_sensitive_values"),
        max(col("__n")).as("__maxn"))
      .withColumn("majority_share",
        col("__maxn").cast("double") / col("n").cast("double"))
      .withColumn("at_risk", col("n_sensitive_values") < l)
      .drop("__maxn")
  }

  /** First-significant-digit distribution of the cent values in `value`
    * (log10(1+1/d) expected shares) — the Benford's-law anomaly screen
    * run over financial facts before trusting them. One map-combined
    * scan; the chi-square statistic is a FIXED-ORDER nine-term row
    * expression over exact integer counts (never a float aggregation),
    * so both engines produce bit-identical doubles.
    *
    * The first digit comes from the integer cents' decimal string, not
    * from floor(log10(x)) — float log at power-of-ten boundaries is
    * exactly the place two engines disagree. */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    // repr(log10(1 + 1/d)), d = 1..9 — identical literals in the oracle
    val p = Array(0.3010299956639812, 0.17609125905568124,
      0.12493873660829992, 0.09691001300805642, 0.07918124604762482,
      0.06694678963061322, 0.05799194697768673, 0.05115252244738129,
      0.04575749056067514)
    val cents = (value.cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(20, 0)).cast("long")
    val digit = substring(col("__cents").cast("string"), 1, 1).cast("int")
    val obsAggs = Seq(count(lit(1)).cast("long").as("__n")) ++
      (1 to 9).map(d => sum(when(digit === d, 1L).otherwise(0L))
        .as(s"__o$d"))
    val obs = df.select(cents.as("__cents")).filter(col("__cents") > 0)
      .agg(obsAggs.head, obsAggs.tail: _*)
    val chi2 = (1 to 9).map { d =>
      val exp = col("__n").cast("double") * lit(p(d - 1))
      (col(s"__o$d").cast("double") - exp) *
        (col(s"__o$d").cast("double") - exp) / exp
    }.reduceLeft(_ + _)
    val spine = obs.withColumn("chi2", chi2)
      .select(explode(expr(
        "transform(sequence(1, 9), d -> named_struct('digit', d))"))
        .as("r"), col("*"))
    val digitCol = col("r.digit").cast("int")
    val obsOfDigit = (1 to 9).foldRight(lit(0L)) { (d, acc) =>
      when(digitCol === d, col(s"__o$d")).otherwise(acc)
    }
    val shareOfDigit = (1 to 9).foldRight(lit(0.0)) { (d, acc) =>
      when(digitCol === d, lit(p(d - 1))).otherwise(acc)
    }
    spine.select(digitCol.as("digit"), obsOfDigit.as("observed"),
      shareOfDigit.as("expected_share"),
      (col("__n").cast("double") * shareOfDigit).as("expected_n"),
      col("__n").as("n_total"), col("chi2"))
  }

  /** Difference-in-differences over a treated/control split and a
    * pre/post cutoff: the four cell means (exact integer cents moments,
    * the powerAnalysis discipline), the DiD point estimate
    * (mT1 - mT0) - (mC1 - mC0), and its pooled standard error
    * sqrt(sum v_i/n_i) — all fixed-order row expressions after ONE
    * map-combined conditional-aggregation scan. Output is one row. */
  def didEstimator(df: DataFrame, treated: Column, post: Column,
                   value: Column): DataFrame = {
    val cents = (value * lit(100L)).cast(DecimalType(38, 0))
    val base = df.select(treated.as("__t"), post.as("__p"),
        cents.as("__u"))
      .filter(col("__u").isNotNull && col("__t").isNotNull &&
        col("__p").isNotNull)
    val cells = Seq(("t1", col("__t") && col("__p")),
      ("t0", col("__t") && !col("__p")),
      ("c1", !col("__t") && col("__p")),
      ("c0", !col("__t") && !col("__p")))
    val aggs = cells.flatMap { case (k, pred) =>
      Seq(sum(when(pred, 1L).otherwise(0L)).as(s"__n_$k"),
        sum(when(pred, col("__u")).otherwise(lit(0L).cast(DecimalType(38, 0))))
          .as(s"__s_$k"),
        sum(when(pred, col("__u") * col("__u"))
          .otherwise(lit(0L).cast(DecimalType(38, 0)))).as(s"__q_$k"))
    }
    val one = base.agg(aggs.head, aggs.tail: _*)
    def mean(k: String) = col(s"__s_$k").cast("double") /
      (col(s"__n_$k") * lit(100L)).cast("double")
    def variance(k: String) = expr(
      s"(__n_$k * __q_$k - __s_$k * __s_$k) div (__n_$k * (__n_$k - 1))")
      .cast("double") / lit(10000.0)
    def se2(k: String) = variance(k) / col(s"__n_$k").cast("double")
    val outCols: Seq[Column] =
      Seq(cells.map { case (k, _) => col(s"__n_$k") }
        .reduceLeft(_ + _).as("n_total")) ++
      cells.map { case (k, _) => col(s"__n_$k").as(s"n_$k") } ++
      cells.map { case (k, _) => mean(k).as(s"mean_$k") } ++
      Seq(((mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))).as("did"),
        sqrt(se2("t1") + se2("t0") + se2("c1") + se2("c0")).as("se_did"))
    one.select(outCols: _*)
      .withColumn("t_stat", col("did") / col("se_did"))
  }

  /** Per-group composition-drift screen with Benjamini–Hochberg FDR
    * control: each group's distribution over the literal `cats` is
    * chi-square-tested against the pooled composition, the p-values are
    * BH-ranked, and `drifted` marks every group at or below the largest
    * rank i with p_(i) ≤ (i/m)·fdrQ — the multiple-testing-safe answer
    * to "which sources shifted", where per-source α=0.05 tests would
    * false-alarm ~1 source in 20 by construction.
    *
    * `cats` must have EVEN degrees of freedom (odd length): the
    * chi-square survival function then has the closed form
    * exp(−x/2)·Σ_{j<k}(x/2)^j/j! (dof = 2k) — polynomial + one exp, no
    * incomplete-gamma dependency. The exp is snapped to the floor(·2^30)
    * grid (1-ulp cross-engine hazard, the q140 discipline).
    *
    * Scale: one map-combined conditional-aggregation groupBy onto
    * |groups| rows; the chi-square is a fixed-order |cats|-term row
    * expression (the q221 Benford shape); ranking windows run on the
    * groups frame. */
  def bhDriftScreen(df: DataFrame, groupCol: String, catCol: String,
                    cats: Seq[String], fdrQ: Double = 0.10): DataFrame = {
    require(cats.size >= 3 && (cats.size - 1) % 2 == 0,
      s"need odd |cats| >= 3 (even dof), got ${cats.size}")
    require(fdrQ > 0.0 && fdrQ < 1.0, s"fdrQ must be in (0,1): $fdrQ")
    val k = (cats.size - 1) / 2
    val base = df
      .filter(col(groupCol).isNotNull && col(catCol).isin(cats.map(lit): _*))
      .select(col(groupCol).as("g"), col(catCol).as("c"))
    val perGroup = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        cats.map(c0 =>
          sum(when(col("c") === c0, 1L).otherwise(0L)).as(s"__n_$c0")): _*)
    val totals = perGroup.agg(
      sum(col("n")).as("__nn"),
      cats.map(c0 => sum(col(s"__n_$c0")).as(s"__t_$c0")): _*)
    val withTot = perGroup.crossJoin(broadcast(totals))
    val chi2 = cats.map { c0 =>
      val obs = col(s"__n_$c0").cast("double")
      val e = (col("n").cast("double") * col(s"__t_$c0").cast("double")) /
        col("__nn").cast("double")
      when(col(s"__t_$c0") > 0, (obs - e) * (obs - e) / e).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    // survival function for dof = 2k: exp(−x/2)·Σ_{j<k}(x/2)^j/j!,
    // powers by explicit multiplication chains (Math.pow is not
    // cross-engine exact), the whole p snapped to the 2^30 grid
    val xh = col("chi2") / lit(2.0)
    val series = (0 until k).map { j =>
      val p0 = (1 to j).map(_ => xh).foldLeft(lit(1.0): Column)(_ * _)
      p0 * lit(1.0 / (1 to j).map(_.toDouble).product)
    }.reduceLeft(_ + _)
    val scored = withTot.withColumn("chi2", chi2)
      .withColumn("p_value",
        floor(exp(lit(0.0) - xh) * series * lit(1073741824.0))
          .cast("long").cast("double") / lit(1073741824.0))
    val wRank = Window.orderBy(col("p_value").asc, col("g").asc)
    val wAll = Window.orderBy(col("p_value").asc, col("g").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored
      .withColumn("p_rank", row_number().over(wRank).cast("int"))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__pass",
        col("p_value") <=
          (col("p_rank").cast("double") / col("__m").cast("double"))
            * lit(fdrQ))
      .withColumn("__cut", max(when(col("__pass"), col("p_rank"))).over(wAll))
      .select(col("g").as("group"), col("n"), col("chi2"), col("p_value"),
        col("p_rank"),
        coalesce(col("p_rank") <= col("__cut"), lit(false)).as("drifted"))
  }

  /** Functional-dependency audit: does `detCol → depCol` hold, and
    * where does it break? For each determinant value with MORE than one
    * distinct dependent, reports the row count, the number of distinct
    * dependents, and the confidence of the majority mapping
    * (`max dependent count / rows` — 1.0 means the FD holds). The
    * data-profiling primitive behind "is this column a reliable lookup
    * key", ranked worst-first and capped at `topK` (rank by distinct
    * dependents desc, then rows desc, then determinant — a total
    * order).
    *
    * Scale: two map-combined groupBys — (det, dep) counts, then per-det
    * aggregation — and a TakeOrdered top-K; nothing wider than the
    * (det, dep) pair frame shuffles. */
  def fdViolations(df: DataFrame, detCol: String, depCol: String,
                   topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pair = df
      .filter(col(detCol).isNotNull)
      .groupBy(col(detCol).as("determinant"), col(depCol).as("__dep"))
      .agg(count(lit(1)).as("__n"))
    val per = pair.groupBy(col("determinant"))
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_dependents"),
        max(col("__n")).as("__maxn"))
      .filter(col("n_dependents") > 1)
      .withColumn("majority_confidence",
        col("__maxn").cast("double") / col("n_rows").cast("double"))
    per
      .orderBy(col("n_dependents").desc, col("n_rows").desc,
        col("determinant"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("n_dependents").desc, col("n_rows").desc,
          col("determinant"))).cast("int"))
      .select(col("determinant"), col("n_rows"), col("n_dependents"),
        col("majority_confidence"), col("rank"))
  }

  /** Per-source quality-rate shrinkage (crawl-prioritization scoring):
    * each source's observed good-document rate k/n is shrunk toward the
    * corpus-pooled rate with `priorStrength` pseudo-counts —
    * `shrunk = (k + priorStrength·pooled) / (n + priorStrength)` — so a
    * 3-for-3 micro-source stops outranking a 9,400-for-10,000 workhorse
    * (the small-sample pathology of raw rates). This is the
    * pseudo-count/Beta-prior form of empirical-Bayes shrinkage with the
    * prior mean set to the pooled rate.
    *
    * Determinism: k, n, ΣK, ΣN are exact integer aggregates; pooled and
    * each shrunk rate are a FIXED chain of scalar double ops on those
    * integers — no float accumulation anywhere, so a differential
    * oracle matches bitwise. Emits one row per source:
    * (source, n_docs, n_good, raw_rate, shrunk_rate, rank) with rank
    * dense-ordered by (shrunk_rate desc, source asc).
    *
    * Scale: one conditional-count aggregation on the source key
    * (map-side combined) + a broadcast 1-row pooled total; the rank
    * window runs on the sources-sized result, not the corpus. */
  def sourceQualityShrinkage(docs: DataFrame, sourceCol: String,
                             good: Column,
                             priorStrength: Double = 100.0): DataFrame = {
    require(priorStrength > 0, s"priorStrength must be > 0: $priorStrength")
    val per = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(good, 1L).otherwise(0L)).as("n_good"))
    val pooledRow = per.agg(sum(col("n_docs")).as("__tn"),
      sum(col("n_good")).as("__tk"))
    val pooled = col("__tk").cast("double") / col("__tn").cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("shrunk_rate").desc, col("source").asc)
    per.crossJoin(broadcast(pooledRow))
      .withColumn("raw_rate",
        col("n_good").cast("double") / col("n_docs").cast("double"))
      .withColumn("shrunk_rate",
        (col("n_good").cast("double") + lit(priorStrength) * pooled) /
          (col("n_docs").cast("double") + lit(priorStrength)))
      .select(col("source"), col("n_docs"), col("n_good"),
        col("raw_rate"), col("shrunk_rate"))
      .withColumn("rank", row_number().over(w).cast("int"))
  }
}
