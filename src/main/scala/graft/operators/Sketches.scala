package graft.operators

import org.apache.spark.sql.DataFrame
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
}
