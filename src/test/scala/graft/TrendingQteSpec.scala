package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class TrendingQteSpec extends SparkSpec {
  import spark.implicits._

  test("exactPercentiles feeds symmetric quantile effects") {
    // variant column drives two disjoint distributions; quantile
    // differences recover the constant shift exactly
    val a = (1 to 100).map(i => ("A", i.toLong))
    val b = (1 to 100).map(i => ("B", i.toLong + 50))
    val pcts = Quality.exactPercentiles((a ++ b).toDF("variant", "cents"),
      Seq("variant"), "cents", Seq(0.25, 0.5, 0.75))
    val m = pcts.collect().map(r => r.getString(0) ->
      (r.getAs[Long]("p25"), r.getAs[Long]("p50"), r.getAs[Long]("p75")))
      .toMap
    (m("B")._1 - m("A")._1) shouldBe 50L
    (m("B")._2 - m("A")._2) shouldBe 50L
    (m("B")._3 - m("A")._3) shouldBe 50L
  }

  test("q275 rolling window aggregates exactly 7 calendar days") {
    // brand with 10 on each of days 1..10: rolling at day 10 = 7 * 10
    val daily = (1 to 10).map(i =>
      ("BRAND", java.sql.Date.valueOf(f"2024-01-$i%02d"), 10L))
      .toDF("p_brand", "day", "cents")
    val w7 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"))
      .orderBy(col("day").cast("timestamp").cast("long"))
      .rangeBetween(-6L * 86400, 0)
    val got = daily.withColumn("r", sum(col("cents")).over(w7))
      .orderBy(col("day")).collect().map(_.getAs[Long]("r"))
    got.take(7).toSeq shouldBe (1 to 7).map(_ * 10L)
    got.drop(7).toSeq shouldBe Seq(70L, 70L, 70L)
  }
}
