package graft

import org.apache.spark.sql.functions._

import graft.operators.Hierarchy

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("subtree totals aggregate descendants under digit encoding") {
    // leaves 120, 121, 13 -> node 12 = 120+121; node 1 = all three
    val leaves = Seq((120L, 5L), (121L, 7L), (13L, 10L)).toDF("k", "v")
    val got = Hierarchy.subtreeRollup(leaves, col("k"), col("v"))
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("subtree_cents")).toMap
    got(120L) shouldBe 5L
    got(12L) shouldBe 12L
    got(1L) shouldBe 22L
    got(0L) shouldBe 22L // super-root
    got(13L) shouldBe 10L
  }

  test("percent-of-parent divides subtree by parent subtree") {
    val leaves = Seq((11L, 30L), (12L, 70L)).toDF("k", "v")
    val got = Hierarchy.subtreeRollup(leaves, col("k"), col("v"))
      .collect().map(r => r.getAs[Long]("node") ->
        Option(r.get(r.fieldIndex("pct_of_parent")))
          .map(_.asInstanceOf[Double])).toMap
    got(11L) shouldBe Some(0.3)
    got(12L) shouldBe Some(0.7)
    got(1L) shouldBe Some(1.0)
    got(0L) shouldBe None // root has no parent
  }

  test("internal nodes that are also leaves include their own value") {
    val leaves = Seq((1L, 100L), (12L, 5L)).toDF("k", "v")
    val got = Hierarchy.subtreeRollup(leaves, col("k"), col("v"))
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("subtree_cents")).toMap
    got(1L) shouldBe 105L // own 100 + descendant 12's 5
    got(12L) shouldBe 5L
  }

  test("plan has no joins before the single rollup aggregate") {
    val leaves = Seq((120L, 5L)).toDF("k", "v")
    val plan = Hierarchy.subtreeRollup(leaves, col("k"), col("v"))
      .queryExecution.executedPlan.toString
    // the only join is the final parent lookup on the small node frame
    plan should not include "CartesianProduct"
    plan.split("Join").length should be <= 3
  }
}
