package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class NeymanSpec extends SparkSpec {
  import spark.implicits._

  private def strata(rows: (String, Long)*) = rows.toDF("s", "cents")

  test("allocations sum exactly to the budget") {
    val df = strata((1 to 300).map(i =>
      (s"g${i % 3}", (i * 37L) % 500)): _*)
    val got = Stats.neymanAllocation(df, "s", col("cents"), 997L)
      .collect()
    got.map(_.getAs[Long]("alloc_neyman")).sum shouldBe 997L
    got.map(_.getAs[Long]("alloc_proportional")).sum shouldBe 997L
  }

  test("high-variance strata get more than proportional share") {
    // g_wide: same size as g_tight but much higher spread
    val tight = (1 to 200).map(i => ("tight", 1000L + (i % 3)))
    val wide = (1 to 200).map(i => ("wide", (i % 2) * 100000L))
    val got = Stats.neymanAllocation((tight ++ wide).toDF("s", "cents"),
      "s", col("cents"), 100L).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("alloc_neyman"), r.getAs[Long]("alloc_proportional")))
      .toMap
    got("wide")._1 should be > got("wide")._2 // neyman > proportional
    got("tight")._1 should be < got("tight")._2
    got("wide")._1 + got("tight")._1 shouldBe 100L
  }

  test("proportional allocation tracks stratum sizes") {
    val df = strata(((1 to 90).map(i => ("big", i.toLong)) ++
      (1 to 10).map(i => ("small", i.toLong))): _*)
    val got = Stats.neymanAllocation(df, "s", col("cents"), 10L)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("alloc_proportional")).toMap
    got("big") shouldBe 9L
    got("small") shouldBe 1L
  }

  test("sigma is the exact population standard deviation") {
    val df = strata(("g", 1L), ("g", 3L), ("g", 5L))
    val sigma = Stats.neymanAllocation(df, "s", col("cents"), 10L)
      .collect().head.getAs[Double]("sigma")
    sigma shouldBe math.sqrt(8.0 / 3.0) +- 1e-12
  }
}
