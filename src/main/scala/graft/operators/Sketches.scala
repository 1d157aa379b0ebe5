package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (SURVEY §7.7 extension surface).
  *
  * At 100 TB, exact per-key distinct counts are often the single most
  * expensive aggregation in a profiling pass (a full shuffle of every
  * (key, value) pair). A KMV (k-minimum-values) sketch bounds that: keep
  * only the k smallest hashes per key; the kth smallest hash position
  * estimates the distinct count as (k-1)/frac(kth). Two sketches merge by
  * unioning their hash sets and re-taking the k smallest — associative
  * and commutative, so partial sketches combine map-side and across
  * partitions/days without re-scanning history.
  *
  * Hash choice is md5 (not xxhash64) for the same reason as [[NearDup]]:
  * the differential oracle must reproduce the hash in DuckDB. The
  * fraction is read off the first 48 bits (12 hex chars) — exact in a
  * double, and `v / 2^48` is an exact power-of-two scaling, so the only
  * rounded operation is the final `(k-1)/frac` division, which IEEE
  * rounds identically in both engines.
  */
object Sketches {

  /** Per-group KMV distinct sketch over `valCol`.
    *
    * Emits (group..., n_distinct_exact, kth_hash, approx_distinct):
    *  - `kth_hash` — the kth smallest md5, NULL when the group has fewer
    *    than k distinct values (the sketch is then exact);
    *  - `approx_distinct` — (k-1)/frac(kth), or the exact count below k.
    *
    * `n_distinct_exact` rides along for error measurement; a production
    * profiler at scale would drop it (it is the expensive half — though
    * still cheaper than a naive count-distinct, because the hash distinct
    * is map-side combined before the one shuffle both outputs share).
    *
    * Scale: ONE shuffle of distinct (group, hash) pairs; the per-group
    * top-k and the distinct total share that exchange (one window pass).
    * The k-smallest filter keeps per-group state O(k). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valCol: String,
                  k: Int): DataFrame = {
    require(k >= 2, s"sketch size k must be >= 2, got $k")
    val hashes = df
      .filter(col(valCol).isNotNull)
      .select(groupCols.map(col) :+
        md5(col(valCol).cast("string")).as("__h"): _*)
      .distinct()
    val part = Window.partitionBy(groupCols.map(col): _*)
    val ranked = hashes
      .withColumn("__rn", row_number().over(part.orderBy(col("__h").asc)))
      .withColumn("__nd", count(lit(1)).over(part))
    // first 48 bits of the kth hash as an exact double in (0, 1]
    val frac = conv(substring(col("__h"), 1, 12), 16, 10).cast("double") /
      lit(281474976710656.0) // 2^48
    ranked
      .filter(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("__nd")).as("n_distinct_exact"),
        max(when(col("__rn") === k, col("__h"))).as("kth_hash"),
        max(when(col("__rn") === k, frac)).as("__kf"))
      .withColumn("approx_distinct",
        when(col("__kf").isNotNull, lit((k - 1).toDouble) / col("__kf"))
          .otherwise(col("n_distinct_exact").cast("double")))
      .drop("__kf")
  }

  /** Pairwise Jaccard ESTIMATES between groups from bottom-k sketches —
    * "how much do my sources overlap?" answered without ever joining the
    * raw value sets pairwise. Per group, keep the k smallest md5 hashes
    * of its distinct values (the same sketch as [[kmvDistinct]]); for a
    * pair (A, B), take the k smallest hashes of the sketch UNION and
    * count how many sit in both sketches: J ≈ that count / k (the
    * standard bottom-k estimator — the union's bottom-k is a uniform
    * sample of A∪B, computable from the two sketches alone because the
    * union's k smallest are a subset of the sketches' 2k hashes).
    *
    * Sketches are mergeable state: at 100 TB each source's sketch is
    * maintained incrementally (k hashes, a few KB), and every pairwise
    * overlap across P sources costs P²/2 sketch merges of k rows each —
    * the raw data is scanned ONCE, ever, vs once per pair for the exact
    * join ([[graft.operators.Corpus.crossSourceOverlap]] scans both
    * sides of every pair). Emits (group_a, group_b, k_used,
    * n_shared_in_union_k, jaccard_est). `k_used` = min(k, |union bottom
    * set|) keeps the estimator honest for tiny groups (est = shared /
    * k_used is then EXACT: below k the sketch IS the value set).
    *
    * Determinism: md5 hashes, integer counts, one final int/int
    * division — no float accumulation anywhere.
    *
    * Scale: one shuffle of distinct (group, hash) pairs builds the
    * sketches (shared with [[kmvDistinct]]'s shape); everything pairwise
    * runs on P × k rows — broadcastable for any real P. */
  def kmvPairwiseOverlap(df: DataFrame, groupCol: String, valCol: String,
                         k: Int): DataFrame = {
    require(k >= 2, s"sketch size k must be >= 2, got $k")
    val part = Window.partitionBy(col(groupCol))
    val sketch = df
      .filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"),
        md5(col(valCol).cast("string")).as("__h"))
      .distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__h").asc)))
      .filter(col("__rn") <= k)
      .select(col("__g"), col("__h"))
    val groups = sketch.select(col("__g")).distinct()
    val pairs = groups.select(col("__g").as("ga"))
      .join(groups.select(col("__g").as("gb")), col("ga") < col("gb"))
    // per pair: union the two sketches (dedup hashes present in both),
    // rank ascending, keep the union's k smallest, count the shared ones
    val unioned = pairs
      .join(sketch, col("__g") === col("ga") || col("__g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("__h"))
      .agg(max(when(col("__g") === col("ga"), 1).otherwise(0)).as("__inA"),
        max(when(col("__g") === col("gb"), 1).otherwise(0)).as("__inB"))
      .withColumn("__urn", row_number().over(
        Window.partitionBy(col("ga"), col("gb")).orderBy(col("__h").asc)))
      .filter(col("__urn") <= k)
    unioned
      .groupBy(col("ga").as("group_a"), col("gb").as("group_b"))
      .agg(count(lit(1)).as("k_used"),
        sum((col("__inA") * col("__inB")).cast("long"))
          .as("n_shared_in_union_k"))
      .withColumn("jaccard_est",
        col("n_shared_in_union_k").cast("double") /
          col("k_used").cast("double"))
  }

  /** EXACT frequent items above the N/k support threshold, found without
    * a full-cardinality aggregation: a per-partition Misra-Gries sketch
    * (k counters, the classic increment-or-decrement-all stream summary)
    * nominates candidates, then one exact counting pass over just those
    * candidates filters to the true answer. Lossless by pigeonhole: an
    * item with global count > N/k = Σ(N_p)/k must exceed N_p/k in at
    * least one partition p, and Misra-Gries with k counters never evicts
    * an item whose partition count exceeds N_p/k — so every true heavy
    * hitter is nominated somewhere. (The same approximate-candidates +
    * exact-verify shape as the prefix-filter join.)
    *
    * Emits (value, n_occurrences) — exact counts, only rows with
    * n_occurrences > N/k. Scale: the sketch pass keeps k counters per
    * partition and shuffles ≤ k × partitions candidate values; the
    * verify pass is one broadcast semi-join + map-side-combined count.
    * Contrast a plain groupBy-count-filter: that shuffles one row per
    * DISTINCT value — the full vocabulary — where this shuffles O(k·P).
    * mapPartitions is justified here: the decrement step is inherently
    * sequential per partition and has no Catalyst expression form. */
  def heavyHitters(df: DataFrame, valCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(col(valCol).cast("string").as("v"))
      .filter(col("v").isNotNull).as[String]
    val candidates = values.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        if (counters.contains(v)) counters(v) += 1L
        else if (counters.size < k) counters(v) = 1L
        else {
          // decrement all; drop zeros (the O(k) amortized step)
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.keysIterator.foreach { key =>
            val n = counters(key) - 1L
            if (n == 0L) dead += key else counters(key) = n
          }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("v").distinct()
    val total = values.toDF("v").agg(count(lit(1)).as("__n"))
    values.toDF("v")
      .join(broadcast(candidates), Seq("v"), "left_semi")
      .groupBy(col("v").as("value"))
      .agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(total))
      .filter(col("n_occurrences") * lit(k.toLong) > col("__n"))
      .drop("__n")
  }

  /** 16-bit md5 slice of `row:value` — the per-row CMS hash (same
    * conv-nibble trick as the hash-split family: reproducible in DuckDB
    * from strpos over the hex digest). */
  private def cmsBucket(row: Int, v: Column, width: Int) =
    (conv(substring(md5(concat(lit(s"$row:"), v)), 1, 4), 16, 10)
      .cast("int") % width).as(s"__b$row")

  /** Count-min sketch frequency audit: build a depth x width CMS over
    * `keyCol` in one pass, then compare its estimate against the exact
    * count for the `topN` hottest keys. The overestimate column is the
    * sketch's collision error — by construction >= 0, which the spec
    * asserts (the one-sided CMS guarantee).
    *
    * Scale: the sketch build explodes each row into `depth` (row, bucket)
    * pairs but map-side combine collapses every task to <= depth x width
    * cells before the exchange — the shuffle is sketch-sized, not
    * data-sized. That is the whole point of a CMS at 100 TB: the exact
    * per-key groupBy here exists only to AUDIT the sketch at test scale;
    * production consumers read the 4096-cell table. The estimate join
    * explodes only the topN keys (broadcast) against the broadcast cell
    * table. */
  def countMinAudit(df: DataFrame, keyCol: String, depth: Int = 4,
                    width: Int = 1024, topN: Int = 100): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val keyed = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val cells = keyed
      .select(posexplode(array((0 until depth)
        .map(j => cmsBucket(j, col("key"), width)): _*))
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cell_n"))
    val top = keyed.groupBy(col("key"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("key"))
      .limit(topN)
    val est = top
      .select(col("key"), col("exact_n"),
        posexplode(array((0 until depth)
          .map(j => cmsBucket(j, col("key"), width)): _*))
          .as(Seq("j", "bucket")))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(col("key"), col("exact_n"))
      .agg(min(col("cell_n")).as("cms_n"))
    est.select(col("key"), col("exact_n"), col("cms_n"),
      (col("cms_n") - col("exact_n")).as("overestimate"))
  }

  /** HyperLogLog registers + estimate per group, AUDITED against the
    * exact distinct count (the [[countMinAudit]] discipline: the sketch
    * is the production artifact, the exact side exists to measure it).
    * A merged `__all__` row demonstrates the property that makes HLL the
    * 100 TB tool: registers union by per-bucket MAX, so per-source
    * sketches roll up to the global estimate without re-scanning — the
    * same max-merge serves partitions, days, or clusters.
    *
    * Register grid: md5's first 2 hex digits pick one of m = 256
    * buckets; the next 5 hex digits form a 20-bit window w whose
    * leading-zero rank ρ = 21 − bitlength(w) (w = 0 → 21) feeds the
    * register via max. The estimator's Σ 2^(−M_j) is computed EXACTLY as
    * integer Σ 2^(21−M_j) (scaled by 2^21), so the only rounded steps
    * are the final fixed-shape divisions — cross-engine deterministic,
    * approximation and all (the q132 differential discipline). Linear
    * counting below 2.5·m with empty registers, per the published HLL
    * correction.
    *
    * Scale: one map-combined groupBy onto ≤ m cells per group; the
    * merged row reuses the per-group registers. The exact-count audit
    * column is the only data-sized aggregate — drop it in production. */
  def hllDistinctAudit(df: DataFrame, groupCol: String,
                       valCol: String): DataFrame = {
    val m = 256
    val alpha = 0.7213 / (1.0 + 1.079 / m) // published alpha_m, m >= 128
    val estNumerator = alpha * m * m * 2097152.0 // alpha·m²·2^21
    val base = df
      .select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("string").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
    val h = md5(col("v"))
    val w = conv(substring(h, 3, 5), 16, 10).cast("long")
    // ρ ladder on exact integer thresholds (no float log; same CASE
    // chain is generated for the oracle)
    val rho = (2 to 20).foldLeft(when(w >= (1L << 19), 1)) { (acc, r) =>
      acc.when(w >= (1L << (20 - r)), r)
    }.otherwise(21)
    val perGroup = base
      .select(col("g"),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("bucket"),
        rho.as("rho"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rho")).as("r"))
    val merged = perGroup.groupBy(col("bucket"))
      .agg(max(col("r")).as("r"))
      .withColumn("g", lit("__all__"))
      .select(col("g"), col("bucket"), col("r"))
    val regs = perGroup.unionByName(merged)
    val stats = regs.groupBy(col("g"))
      .agg(
        count(lit(1)).as("__present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 21 - r)")).as("__zsum"))
      .withColumn("v_zero", lit(m.toLong) - col("__present"))
      .withColumn("__zscaled",
        col("__zsum") + col("v_zero") * lit(2097152L))
      .withColumn("raw_est",
        lit(estNumerator) / col("__zscaled").cast("double"))
      .withColumn("est",
        // ln is not correctly rounded and differs by 1 ulp across
        // engines: snap it to the floor(·2^30) grid (the q140
        // discipline) before the exact power-of-two unscale
        when(col("raw_est") <= lit(2.5 * m) && col("v_zero") > 0,
          lit(m.toDouble) *
            (floor(log(lit(m.toDouble) / col("v_zero").cast("double"))
              * lit(1073741824.0)).cast("long").cast("double")
              / lit(1073741824.0)))
          .otherwise(col("raw_est")))
    val exactPer = base.groupBy(col("g"))
      .agg(countDistinct(col("v")).as("n_exact"))
    val exactAll = base.agg(countDistinct(col("v")).as("n_exact"))
      .withColumn("g", lit("__all__"))
    stats
      .join(exactPer.unionByName(exactAll.select(col("g"), col("n_exact"))),
        Seq("g"))
      .select(col("g").as("group"), col("n_exact"), lit(m).as("m"),
        col("v_zero"), col("est"),
        ((col("est") - col("n_exact").cast("double"))
          / col("n_exact").cast("double")).as("rel_err"))
  }
}
