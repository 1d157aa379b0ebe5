package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Stats}

class ChangepointBfsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- changepoint

  test("changepoint finds an obvious level shift at the right position") {
    // 10 points at 100, then 10 points at 500
    val df = (1 to 20).map(i =>
      ("s", i, if (i <= 10) 100L else 500L)).toDF("g", "pos", "v")
    val got = Stats.changepoint(df, Seq("g"), "pos", "v").collect().head
    got.getAs[Long]("split_pos") shouldBe 10L
    got.getAs[Int]("split_at") shouldBe 10
    got.getAs[Double]("left_mean") shouldBe 100.0
    got.getAs[Double]("right_mean") shouldBe 500.0
    got.getAs[Double]("gain") should be > 0.0
  }

  test("changepoint on a flat series reports zero gain, earliest split") {
    val df = (1 to 8).map(i => ("s", i, 42L)).toDF("g", "pos", "v")
    val got = Stats.changepoint(df, Seq("g"), "pos", "v").collect().head
    got.getAs[Double]("gain") shouldBe 0.0
    got.getAs[Long]("split_pos") shouldBe 1L // tie-break: earliest
  }

  test("changepoint handles multiple series independently") {
    val a = (1 to 10).map(i => ("a", i, if (i <= 3) 0L else 900L))
    val b = (1 to 10).map(i => ("b", i, if (i <= 7) 900L else 0L))
    val got = Stats.changepoint((a ++ b).toDF("g", "pos", "v"),
      Seq("g"), "pos", "v").collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("split_pos")).toMap
    got("a") shouldBe 3L
    got("b") shouldBe 7L
  }

  test("changepoint ramp picks the scatter-optimal middle split") {
    val df = (1 to 21).map(i => ("s", i, i.toLong * 10)).toDF("g", "pos", "v")
    val got = Stats.changepoint(df, Seq("g"), "pos", "v").collect().head
    // a linear ramp's best single split is (near) the midpoint
    got.getAs[Long]("split_pos") should (be >= 9L and be <= 12L)
  }

  // -------------------------------------------- bfsHops

  private val chainNodes = (1L to 7L).map(Tuple1(_)).toDF("id")
  private val chainEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (5L, 6L), (6L, 7L)).toDF("a", "b")

  test("bfsHops computes hop distance along a chain, bounded by maxHops") {
    val got = Clusters.bfsHops(chainNodes, "id", col("id") === 1L,
      chainEdges, "a", "b", maxHops = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("hops")).toMap
    got shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)
  }

  test("bfsHops takes the minimum over multiple sources") {
    val got = Clusters.bfsHops(chainNodes, "id",
      col("id") === 1L || col("id") === 7L,
      chainEdges, "a", "b", maxHops = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("hops")).toMap
    got(4L) shouldBe 3 // equidistant from both ends
    got(5L) shouldBe 2 // closer to 7
    got(6L) shouldBe 1
  }

  test("bfsHops with zero maxHops returns only the sources") {
    val got = Clusters.bfsHops(chainNodes, "id", col("id") === 3L,
      chainEdges, "a", "b", maxHops = 0).collect()
    got.map(r => (r.getLong(0), r.getInt(1))).toSeq shouldBe Seq((3L, 0))
  }

  test("bfsHops edges are undirected") {
    // source at the HEAD of every directed edge: must still reach tails
    val got = Clusters.bfsHops(chainNodes, "id", col("id") === 7L,
      chainEdges, "a", "b", maxHops = 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("hops")).toMap
    got shouldBe Map(7L -> 0, 6L -> 1, 5L -> 2)
  }
}
