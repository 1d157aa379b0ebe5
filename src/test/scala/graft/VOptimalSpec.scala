package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class VOptimalSpec extends SparkSpec {
  import spark.implicits._

  test("two well-separated clusters split exactly at the gap") {
    val vals = ((1 to 50).map(_ => 100L) ++ (1 to 50).map(_ => 9000L))
      .toDF("v")
    val got = Stats.vOptimalHistogram(vals, col("v"), preBins = 16,
      buckets = 2).collect().sortBy(_.getAs[Int]("bucket"))
    got.length shouldBe 2
    // each bucket holds one constant cluster -> zero SSE
    got.map(_.getAs[Double]("sse")).sum shouldBe 0.0
    got.map(_.getAs[Long]("n")).toSeq shouldBe Seq(50L, 50L)
    got(0).getAs[Double]("mean") shouldBe 100.0
    got(1).getAs[Double]("mean") shouldBe 9000.0
  }

  test("three clusters with three buckets reach zero SSE; two cannot") {
    val vals = ((1 to 30).map(_ => 0L) ++ (1 to 30).map(_ => 5000L) ++
      (1 to 30).map(_ => 9999L)).toDF("v")
    val three = Stats.vOptimalHistogram(vals, col("v"), 16, 3).collect()
    three.map(_.getAs[Double]("sse")).sum shouldBe 0.0
    val two = Stats.vOptimalHistogram(vals, col("v"), 16, 2).collect()
    two.map(_.getAs[Double]("sse")).sum should be > 0.0
  }

  test("bucket count and coverage invariants hold") {
    val vals = (1 to 500).map(i => (i * 37L) % 10000).toDF("v")
    val got = Stats.vOptimalHistogram(vals, col("v"), 32, 8).collect()
      .sortBy(_.getAs[Int]("bucket"))
    got.length shouldBe 8
    got.map(_.getAs[Long]("n")).sum shouldBe 500L
    got.last.getAs[Int]("hi_bin") shouldBe 32
    // buckets tile the pre-bin range: next lo = prev hi + 1
    got.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Int]("lo_bin") shouldBe a.getAs[Int]("hi_bin") + 1
    }
  }

  test("total SSE never increases with more buckets") {
    val vals = (1 to 400).map(i => (i * i * 7L) % 100000).toDF("v")
    val sse4 = Stats.vOptimalHistogram(vals, col("v"), 32, 4).collect()
      .map(_.getAs[Double]("sse")).sum
    val sse8 = Stats.vOptimalHistogram(vals, col("v"), 32, 8).collect()
      .map(_.getAs[Double]("sse")).sum
    sse8 should be <= sse4
  }

  test("empty input yields an empty histogram") {
    val vals = Seq.empty[Long].toDF("v")
    Stats.vOptimalHistogram(vals, col("v"), 16, 4).count() shouldBe 0L
  }
}
