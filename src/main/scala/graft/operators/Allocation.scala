package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact proration ("penny allocation"): distribute a per-group integer
  * target across the group's rows proportional to integer weights, with
  * largest-remainder rounding so every group's allocations sum EXACTLY
  * to its target — the invariant financial reconciliation requires
  * (naive rounding leaks cents; float proration leaks non-
  * deterministically).
  */
object Allocation {

  /** Per-row allocation of `target` (constant within each group)
    * proportional to `weight`. Largest-remainder: floor shares first,
    * then +1 to the `target − Σfloor` rows with the biggest remainders
    * (ties by `tiebreak` ascending). Groups whose weights sum to zero
    * are dropped (no defined proration). Emits the input columns plus
    * `alloc`.
    *
    * Scale: three windows per group (weight total, floor-share sum,
    * remainder rank) — one shuffle on the group key, no joins. */
  def pennyAllocate(df: DataFrame, groupCols: Seq[String], target: Column,
                    weight: Column, tiebreak: Seq[Column]): DataFrame = {
    val g = Window.partitionBy(groupCols.map(col): _*)
    val base = df
      .withColumn("__t", target.cast("long"))
      .withColumn("__w", weight.cast("long"))
      .withColumn("__tw", sum(col("__w")).over(g))
      .filter(col("__tw") > 0)
      .withColumn("__num", col("__t") * col("__w"))
      .withColumn("__floor",
        ((col("__num") - pmod(col("__num"), col("__tw"))) / col("__tw"))
          .cast("long"))
      .withColumn("__rem", pmod(col("__num"), col("__tw")))
    base
      .withColumn("__left", col("__t") - sum(col("__floor")).over(g))
      .withColumn("__rk", row_number().over(
        g.orderBy(col("__rem").desc +: tiebreak: _*)))
      .withColumn("alloc",
        col("__floor") + when(col("__rk") <= col("__left"), 1L)
          .otherwise(0L))
      .drop("__t", "__w", "__tw", "__num", "__floor", "__rem", "__left",
        "__rk")
  }
}
