package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class SprtSpec extends SparkSpec {
  import spark.implicits._

  private def run(rates: Seq[(Int, Int)]) = {
    val daily = rates.zipWithIndex.map { case ((n, c), i) => (i, n, c) }
      .toDF("day", "n_new", "c_new")
    Stats.sprtMonitor(daily, "day", col("n_new"), col("c_new"),
      p0 = 0.25, p1 = 0.30, alphaPct = 5)
      .orderBy(col("day")).collect()
  }

  test("a stream converting at p1 crosses the upper boundary") {
    // 30% conversions daily: llr drifts up, eventually accept_h1
    val got = run(Seq.fill(40)((100, 30)))
    got.last.getAs[String]("state") shouldBe "accept_h1"
    got.map(_.getAs[Double]("llr")).toSeq.sliding(2).count {
      case Seq(a, b) => b > a } should be > 30
  }

  test("a stream converting at p0 crosses the lower boundary") {
    val got = run(Seq.fill(40)((100, 25)))
    got.last.getAs[String]("state") shouldBe "accept_h0"
  }

  test("decided flags every day AFTER the first crossing") {
    val got = run(Seq.fill(40)((100, 35)))
    val firstCross = got.indexWhere(_.getAs[String]("state") != "continue")
    firstCross should be >= 0
    got.take(firstCross + 1).foreach(
      _.getAs[Boolean]("decided") shouldBe false)
    got.drop(firstCross + 1).foreach(
      _.getAs[Boolean]("decided") shouldBe true)
  }

  test("cumulative counts accumulate exactly") {
    val got = run(Seq((10, 2), (20, 5), (30, 9)))
    got.map(r => (r.getAs[Long]("n"), r.getAs[Long]("c"))).toSeq shouldBe
      Seq((10L, 2L), (30L, 7L), (60L, 16L))
  }
}
