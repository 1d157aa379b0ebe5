package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Sketches}

class R6pOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // -------------------------------------------- PQ codebook + assign

  test("pqCodebook draws k rows with dense 0..k-1 codes") {
    val df = (1L to 30L).map(i => (i, vec(i.toDouble, -i.toDouble)))
      .toDF("id", "e")
    val cb = Similarity.pqCodebook(df, "id", "e", 8).collect()
    cb.length shouldBe 8
    cb.map(_.getAs[Int]("code")).sorted shouldBe (0 until 8).toArray
  }

  test("pqAssign picks the nearest codeword per subspace independently") {
    // dim 4, M 2: codewords at (0,0 | 10,10) and (9,9 | 1,1);
    // a vector near (0,0,1,1) must take subspace codes from DIFFERENT rows
    val data = Seq(
      (1L, vec(0, 0, 10, 10)),
      (2L, vec(9, 9, 1, 1)),
      (3L, vec(0.5, 0.5, 1.5, 1.5))).toDF("id", "e")
    val cb = Similarity.pqCodebook(data.filter($"id" =!= 3L), "id", "e", 2)
    val got = Similarity.pqAssign(data.filter($"id" === 3L), "id", "e",
      cb, embDim = 4, numSubspaces = 2)
      .collect().map(r => r.getAs[Int]("subspace") -> r.getAs[Int]("code"))
      .toMap
    // whichever codes 1/2 were assigned, subspace 0 picks vec 1's slice
    // (0,0) and subspace 1 picks vec 2's slice (1,1) -> different codes
    got(0) should not be got(1)
  }

  test("pqAssign distances are exact squared L2 on the chosen slice") {
    val data = Seq((1L, vec(1, 2, 3, 4))).toDF("id", "e")
    val cb = Seq((0, vec(0, 0, 0, 0))).toDF("code", "code_emb")
    val got = Similarity.pqAssign(data, "id", "e", cb, 4, 2)
      .orderBy("subspace").collect()
    got(0).getAs[Double]("dist") shouldBe 5.0  // 1+4
    got(1).getAs[Double]("dist") shouldBe 25.0 // 9+16
  }

  // -------------------------------------------- PQ ADC top-k

  test("pqAdcTopK ranks by summed per-subspace code distances") {
    // corpus on a line; query at origin; PQ with enough codes is exact here
    val df = (0L to 9L).map(i => (i, vec(i.toDouble, 0, 0, i.toDouble)))
      .toDF("id", "e")
    val cb = Similarity.pqCodebook(df, "id", "e", 10) // every vector a code
    val got = Similarity.pqAdcTopK(df, "id", "e", cb, 4, 2,
      col("id") === 0L, k = 3).collect()
    got.map(_.getAs[Long]("n_id")).toSeq shouldBe Seq(1L, 2L, 3L)
    got.map(_.getAs[Int]("rank")).toSeq shouldBe Seq(1, 2, 3)
    // dist to n=2: subspace dists 4 and 4
    got(1).getAs[Double]("approx_dist") shouldBe 8.0
  }

  test("pqAdcTopK approximation error is bounded by code granularity") {
    // one codeword only: every neighbor collapses to the same approx dist
    val df = (0L to 5L).map(i => (i, vec(i.toDouble, i.toDouble)))
      .toDF("id", "e")
    val cb = Similarity.pqCodebook(df, "id", "e", 1)
    val got = Similarity.pqAdcTopK(df, "id", "e", cb, 2, 1,
      col("id") === 0L, k = 5).collect()
    got.map(_.getAs[Double]("approx_dist")).distinct.length shouldBe 1
    // ties broken by id -> deterministic ranks
    got.map(_.getAs[Long]("n_id")).toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
  }

  // -------------------------------------------- HLL audit

  test("hllDistinctAudit never misses groups and emits the merged row") {
    val df = (for (g <- Seq("a", "b"); i <- 1 to 50)
      yield (g, s"$g-val-$i")).toDF("g", "v")
    val got = Sketches.hllDistinctAudit(df, "g", "v").collect()
    got.map(_.getAs[String]("group")).sorted shouldBe
      Array("__all__", "a", "b")
    val all = got.find(_.getAs[String]("group") == "__all__").get
    all.getAs[Long]("n_exact") shouldBe 100L
  }

  test("hllDistinctAudit estimate tracks exact within coarse HLL error") {
    val df = (1 to 2000).map(i => ("g", s"value-$i")).toDF("g", "v")
    val got = Sketches.hllDistinctAudit(df, "g", "v")
      .filter($"group" === "g").collect().head
    got.getAs[Long]("n_exact") shouldBe 2000L
    // sigma ~ 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
    math.abs(got.getAs[Double]("rel_err")) should be < 0.26
  }

  test("hllDistinctAudit merged registers dominate per-group registers") {
    // union estimate >= max per-group estimate (register max-merge)
    val df = (for (g <- Seq("x", "y"); i <- 1 to 300)
      yield (g, s"$g$i")).toDF("g", "v")
    val got = Sketches.hllDistinctAudit(df, "g", "v").collect()
      .map(r => r.getAs[String]("group") -> r.getAs[Double]("est")).toMap
    got("__all__") should be >= math.max(got("x"), got("y"))
  }

  test("hllDistinctAudit duplicates do not move the estimate") {
    val once = (1 to 400).map(i => ("g", s"t$i")).toDF("g", "v")
    val thrice = (1 to 400).flatMap(i => Seq.fill(3)(("g", s"t$i")))
      .toDF("g", "v")
    val e1 = Sketches.hllDistinctAudit(once, "g", "v")
      .filter($"group" === "g").collect().head.getAs[Double]("est")
    val e3 = Sketches.hllDistinctAudit(thrice, "g", "v")
      .filter($"group" === "g").collect().head.getAs[Double]("est")
    e1 shouldBe e3
  }
}
