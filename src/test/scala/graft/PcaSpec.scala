package graft

import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Points stretched along a known axis: top component must align. */
  private def lineData(dx: Double, dy: Double) =
    (-20 to 20).map { i =>
      (i.toLong, Array((i * dx).toFloat, (i * dy).toFloat, 0.001f * i))
    }.toDF("vec_id", "embedding")

  test("topComponent recovers the dominant axis direction") {
    val got = Pca.topComponent(lineData(3.0, 0.0), "vec_id", "embedding")
      .collect().sortBy(_.getAs[Int]("pos"))
    got.length shouldBe 3
    val v = got.map(_.getAs[Long]("v20"))
    // axis 0 dominates; sign convention makes it positive
    v(0) shouldBe (1L << 20)
    math.abs(v(1).toDouble / (1 << 20)) should be < 0.05
    math.abs(v(2).toDouble / (1 << 20)) should be < 0.05
  }

  test("topComponent on a diagonal axis splits weight evenly") {
    val got = Pca.topComponent(lineData(2.0, 2.0), "vec_id", "embedding")
      .collect().sortBy(_.getAs[Int]("pos"))
    val v = got.map(_.getAs[Long]("v20").toDouble / (1 << 20))
    v(0) shouldBe 1.0 +- 1e-6 // max-normalized: the larger of the pair is 1
    v(1) shouldBe 1.0 +- 0.02
  }

  test("rayleigh quotient is the scatter-matrix eigenvalue (positive)") {
    val got = Pca.topComponent(lineData(3.0, 1.0), "vec_id", "embedding")
      .collect()
    all(got.map(_.getAs[Double]("rayleigh"))) should be > 0.0
    got.map(_.getAs[Double]("rayleigh")).distinct.length shouldBe 1
  }

  test("projectScores orders points along the dominant axis") {
    val scores = Pca.projectScores(lineData(3.0, 0.0), "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score"))
      .toMap
    scores.size shouldBe 41
    // monotone in i (vec_id encodes i shifted): centered, so ~antisymmetric
    val ordered = (-20 to 20).map(i => scores(i.toLong))
    ordered.sliding(2).foreach { case Seq(a, b) => a should be < b }
    math.abs(ordered(20)) should be < 0.05 // center point scores ~0
  }

  test("degenerate all-zero input yields empty outputs") {
    val df = (1 to 5).map(i => (i.toLong, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    Pca.topComponent(df, "vec_id", "embedding").count() shouldBe 0L
    Pca.projectScores(df, "vec_id", "embedding").count() shouldBe 0L
  }

  test("iteration is scale-invariant in sign handling: flipped data " +
    "flips scores, not the reported axis sign convention") {
    val a = Pca.topComponent(lineData(3.0, 0.5), "vec_id", "embedding")
      .collect().sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("v20"))
    val b = Pca.topComponent(lineData(-3.0, -0.5), "vec_id", "embedding")
      .collect().sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("v20"))
    a.head should be > 0L
    b.head should be > 0L // sign convention normalizes the direction
  }
}
