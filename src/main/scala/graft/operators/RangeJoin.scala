package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins without the nested-loop trap.
  *
  * Spark has no native range-join optimization: a join whose only
  * condition is `pt BETWEEN lo AND hi` compiles to a
  * BroadcastNestedLoopJoin (small build side) or a cartesian product —
  * both O(|points| × |intervals|) comparisons, fatal at corpus scale.
  * The standard fix is binning: chop the value domain into fixed-width
  * bins, replicate each interval into every bin it covers, route each
  * point to its single bin, equi-join on the bin key (shuffled hash
  * join, AQE-eligible), and keep the exact BETWEEN as a residual
  * filter. Work becomes
  * O(|points| + |intervals| × (avgSpan/binWidth + 1) + trueMatches).
  *
  * Choosing `binWidth`: near the TYPICAL interval span. Much smaller →
  * interval replication explodes; much larger → each bin degenerates
  * toward the nested loop (many non-matching residual checks). Both
  * sides stay correct — only cost moves.
  *
  * Inputs may carry any extra columns; names must be disjoint between
  * the two sides (standard join rule). `__bin` is reserved.
  */
object RangeJoin {

  private def guard(df: DataFrame, who: String): Unit =
    require(!df.columns.contains("__bin"), s"$who already has a __bin column")

  /** Inner-join `points` (numeric `ptCol`) to `intervals` rows whose
    * closed interval [loCol, hiCol] contains the point. NULL points and
    * NULL/inverted intervals match nothing. Each matching (point,
    * interval) pair is emitted exactly once: the pair meets only in the
    * point's own bin.
    *
    * Timestamps: convert to epoch seconds (`unix_timestamp`) first —
    * binning needs a numeric domain.
    *
    * `broadcastIntervals = true` skips the shuffle entirely when the
    * (exploded) interval side fits in memory — the usual case for
    * band/dimension tables.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long,
                      broadcastIntervals: Boolean = false): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    guard(points, "points"); guard(intervals, "intervals")
    val binnedIntervals = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val rhs = if (broadcastIntervals) broadcast(binnedIntervals)
              else binnedIntervals
    points
      .filter(col(ptCol).isNotNull)
      .withColumn("__bin", floor(col(ptCol) / binWidth).cast("long"))
      .join(rhs, "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Inner-join rows of `left` and `right` whose closed intervals
    * OVERLAP: lLo <= rHi AND rLo <= lHi. Both sides are replicated into
    * their covered bins; a matching pair shares every bin in the
    * overlap, so the join additionally requires the bin to be the one
    * containing the overlap's LEFT EDGE, max(lLo, rLo) — each pair then
    * emerges exactly once, with no post-hoc distinct. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      binWidth: Long,
                      broadcastRight: Boolean = false): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    guard(left, "left"); guard(right, "right")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    val rhs = if (broadcastRight) broadcast(binned(right, rLo, rHi))
              else binned(right, rLo, rHi)
    binned(left, lLo, lHi)
      .join(rhs, "__bin")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === floor(greatest(col(lLo), col(rLo)) / binWidth)
          .cast("long"))
      .drop("__bin")
  }
}
