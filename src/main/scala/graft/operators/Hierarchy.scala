package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchy rollups for fixed-arity encoded trees.
  *
  * Tree encoding: each node key's parent is `key div fanout` (root keys
  * are those below `fanout`). This digit-tree encoding means a node's
  * FULL ancestor chain is the closed form `key div fanout^j` — so
  * subtree aggregation needs NO recursion and NO iterative self-joins:
  * one explode of the ≤ log_fanout(maxKey) ancestors per row, one
  * groupBy. That is the shape that survives scale — a recursive-CTE
  * rollup is depth × self-joins; this is a single shuffle whose fan-out
  * factor is the tree depth (≤ 13 for 64-bit keys at fanout 10).
  */
object Hierarchy {

  /** Subtree totals and percent-of-parent for every node on any leaf's
    * ancestor path. Input: one row per leaf key with an integer value
    * (exact cents discipline). Output: (node, parent, subtree_cents,
    * pct_of_parent) — `parent` NULL at roots, pct = subtree/parent
    * subtree as one exact-integer double division.
    *
    * `maxDepth` bounds the ancestor chain (keys above fanout^maxDepth
    * would silently lose ancestors — sized generously, it costs only
    * explode rows that immediately deduplicate). */
  def subtreeRollup(leaves: DataFrame, keyCol: Column, valueCol: Column,
                    fanout: Long = 10L, maxDepth: Int = 12): DataFrame = {
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    require(maxDepth >= 1 && maxDepth <= 40, s"bad maxDepth $maxDepth")
    val pows = (0 to maxDepth).scanLeft(1L) { (p, _) =>
      if (p > Long.MaxValue / fanout) Long.MaxValue else p * fanout
    }.take(maxDepth + 1)
    val ancestors = array_distinct(filter(
      array(pows.map(p => (keyCol - pmod(keyCol, lit(p))) / lit(p)): _*)
        .cast("array<long>"),
      a => a >= 0))
    val contrib = leaves
      .select(explode(ancestors).as("node"), valueCol.as("__v"))
      .groupBy(col("node")).agg(sum(col("__v")).as("subtree_cents"))
    // node 0 is the super-root every chain terminates at; all other
    // nodes parent to their digit-truncated key
    val withParent = contrib.withColumn("parent",
      when(col("node") > 0,
        ((col("node") - pmod(col("node"), lit(fanout))) / lit(fanout))
          .cast("long")))
    withParent.alias("c")
      .join(withParent.select(col("node").as("parent"),
        col("subtree_cents").as("__ps")).alias("p"), Seq("parent"), "left")
      .select(col("node"), col("parent"), col("subtree_cents"),
        (col("subtree_cents").cast("double") / col("__ps").cast("double"))
          .as("pct_of_parent"))
  }
}
