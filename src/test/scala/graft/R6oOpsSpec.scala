package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class R6oOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- ROC AUC

  test("rocAuc perfect separation scores 1, inverted scores 0") {
    val df = (Seq(0.9, 0.8, 0.7).map((_, true)) ++
      Seq(0.3, 0.2, 0.1).map((_, false))).toDF("s", "y")
    Stats.rocAuc(df, col("s"), col("y")).collect()
      .head.getAs[Double]("auc") shouldBe 1.0
    Stats.rocAuc(df, col("s"), !col("y")).collect()
      .head.getAs[Double]("auc") shouldBe 0.0
  }

  test("rocAuc random-order score sits at 0.5 with gini 0") {
    // every positive ties every negative -> AUC exactly 1/2
    val df = (Seq.fill(7)((5.0, true)) ++ Seq.fill(9)((5.0, false)))
      .toDF("s", "y")
    val got = Stats.rocAuc(df, col("s"), col("y")).collect().head
    got.getAs[Double]("auc") shouldBe 0.5
    got.getAs[Double]("gini") shouldBe 0.0
  }

  test("rocAuc hand-checked mixed case") {
    // pos {3,1}, neg {2}: pairs won 1 (3>2), lost 1 (1<2) -> AUC 0.5;
    // pos {3,2.5}, neg {2}: AUC 1
    val df = Seq((3.0, true), (1.0, true), (2.0, false)).toDF("s", "y")
    Stats.rocAuc(df, col("s"), col("y")).collect()
      .head.getAs[Double]("auc") shouldBe 0.5
  }

  // -------------------------------------------- WOE / IV

  test("woeIv uninformative feature gives zero WOE and zero IV") {
    // good/bad identically distributed across bins
    val df = (for (v <- 0 to 3; k <- 1 to 10)
      yield (v.toDouble, k <= 5)).toDF("v", "g")
    val got = Stats.woeIv(df, col("v"), col("g"), bins = 4).collect()
    got.foreach { r =>
      r.getAs[Double]("woe") shouldBe 0.0
      r.getAs[Double]("iv_total") shouldBe 0.0
    }
  }

  test("woeIv one-sided bin gets NULL WOE and is excluded from IV") {
    val df = Seq((0.0, true), (0.1, true), (10.0, true), (10.1, false))
      .toDF("v", "g")
    val got = Stats.woeIv(df, col("v"), col("g"), bins = 2)
      .orderBy("bin").collect()
    got.length shouldBe 2
    assert(got.head.isNullAt(got.head.fieldIndex("woe"))) // all-good bin
    // the informative bin carries the whole IV
    got.foreach(r => r.getAs[Double]("iv_total") shouldBe
      got.last.getAs[Double]("iv_term"))
  }

  test("woeIv bin edges tile [min, max] exactly") {
    val df = (0 to 100).map(i => (i.toDouble, i % 3 == 0)).toDF("v", "g")
    val got = Stats.woeIv(df, col("v"), col("g"), bins = 5)
      .orderBy("bin").collect()
    got.head.getAs[Double]("bin_lo") shouldBe 0.0
    got.last.getAs[Double]("bin_hi") shouldBe 100.0
    got.sliding(2).foreach { case Array(a, b) =>
      a.getAs[Double]("bin_hi") shouldBe b.getAs[Double]("bin_lo")
    }
    got.map(r => r.getAs[Long]("n_good") + r.getAs[Long]("n_bad"))
      .sum shouldBe 101L
  }

  // -------------------------------------------- mutual information

  test("mutualInfo independent columns score ~0 bits and identical ~max") {
    val ind = (0 until 64).map(i => (s"x${i % 4}", s"y${i / 16}"))
      .toDF("x", "y")
    val mi0 = Stats.mutualInfo(ind, col("x"), col("y")).collect().head
    mi0.getAs[Double]("mi_bits") shouldBe 0.0 +- 1e-6
    val dep = (0 until 64).map(i => (s"v${i % 4}", s"v${i % 4}"))
      .toDF("x", "y")
    val mi1 = Stats.mutualInfo(dep, col("x"), col("y")).collect().head
    // X == Y uniform over 4 values: MI = H = 2 bits, NMI = 1
    mi1.getAs[Double]("mi_bits") shouldBe 2.0 +- 1e-6
    mi1.getAs[Double]("nmi") shouldBe 1.0 +- 1e-6
  }

  test("mutualInfo is symmetric and bounded by min entropy") {
    val df = (0 until 90).map(i => (s"a${i % 3}", s"b${i % 5}", i))
      .toDF("x", "y", "i")
    val xy = Stats.mutualInfo(df, col("x"), col("y")).collect().head
    val yx = Stats.mutualInfo(df, col("y"), col("x")).collect().head
    xy.getAs[Double]("mi_bits") shouldBe
      yx.getAs[Double]("mi_bits") +- 1e-9
    xy.getAs[Double]("mi_bits") should be <=
      math.min(xy.getAs[Double]("h_x_bits"), xy.getAs[Double]("h_y_bits")) + 1e-9
  }

  test("mutualInfo constant column yields zero entropy and NULL nmi") {
    val df = Seq(("k", "a"), ("k", "b"), ("k", "c")).toDF("x", "y")
    val got = Stats.mutualInfo(df, col("x"), col("y")).collect().head
    got.getAs[Double]("h_x_bits") shouldBe 0.0
    assert(got.isNullAt(got.fieldIndex("nmi")))
  }
}
