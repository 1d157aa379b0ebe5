package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  // one group, values spread so residual ranks are unambiguous
  private def fixture(n: Int) =
    (1 to n).map(i => ("g", i.toLong, (1000L + (i % 50) * 10)))
      .toDF("grp", "k", "cents")

  test("conformal coverage on in-distribution data is near 1 - alpha") {
    val got = Eval.conformalIntervals(fixture(2000), Seq("grp"), "k",
      col("cents"), trainPct = 60, calibPct = 20, alphaPct = 10)
      .collect().head
    val cov = got.getAs[Double]("coverage")
    cov should be >= 0.85
    cov should be <= 1.0
    got.getAs[Double]("q_hat") should be > 0.0
    got.getAs[Long]("n_train") + got.getAs[Long]("n_calib") +
      got.getAs[Long]("n_test") shouldBe 2000L
  }

  test("radius grows as alpha shrinks (more confidence, wider interval)") {
    val loose = Eval.conformalIntervals(fixture(2000), Seq("grp"), "k",
      col("cents"), alphaPct = 20).collect().head.getAs[Double]("q_hat")
    val tight = Eval.conformalIntervals(fixture(2000), Seq("grp"), "k",
      col("cents"), alphaPct = 2).collect().head.getAs[Double]("q_hat")
    tight should be >= loose
  }

  test("an extreme outlier in the test split breaks coverage below 1") {
    // find a key that lands in the test bucket (md5 bucket >= 80), then
    // poison exactly that row with an absurd value
    val base = fixture(1000)
    val testKey = base.withColumn("b",
        conv(substring(md5(col("k").cast("string")), 1, 4), 16, 10)
          .cast("int") % 100)
      .filter(col("b") >= 80).select(col("k")).head().getLong(0)
    val got = Eval.conformalIntervals(
      base.withColumn("cents",
        when(col("k") === testKey, lit(900000L)).otherwise(col("cents"))),
      Seq("grp"), "k", col("cents")).collect().head
    got.getAs[Double]("coverage") should be < 1.0
    // the outlier is excluded from train: center stays near the clean mean
    got.getAs[Double]("center") shouldBe 12.0 +- 3.0
  }

  test("groups are calibrated independently") {
    val a = (1 to 600).map(i => ("a", i.toLong, 1000L + (i % 10)))
    val b = (1 to 600).map(i => ("b", i.toLong + 100000, 5000L + (i % 500)))
    val got = Eval.conformalIntervals((a ++ b).toDF("grp", "k", "cents"),
      Seq("grp"), "k", col("cents")).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("q_hat")).toMap
    got("b") should be > got("a") // wider spread -> wider radius
  }
}
