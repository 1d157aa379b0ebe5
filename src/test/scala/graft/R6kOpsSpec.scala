package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Windows}

class R6kOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- power analysis

  test("powerAnalysis matches the closed-form MDE") {
    // group g: 2, 4, 6 -> mean 4, var 4 (sample)
    val df = Seq(("g", 2.0), ("g", 4.0), ("g", 6.0))
      .toDF("grp0", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val row = Quality.powerAnalysis(df, col("grp0"), col("v"))
      .collect().head
    row.getAs[Long]("n") shouldBe 3L
    row.getAs[Double]("mean") shouldBe 4.0
    row.getAs[Double]("variance") shouldBe 4.0
    val z = 2.8015852181129683
    row.getAs[Double]("mde_abs") shouldBe
      (z * math.sqrt(2.0 * 4.0 / 3.0))
    row.getAs[Double]("mde_rel") shouldBe
      (z * math.sqrt(2.0 * 4.0 / 3.0) / 4.0)
  }

  test("powerAnalysis drops groups below n=2 and quantizes to cents^2") {
    val df = Seq(("solo", 5.0), ("pair", 1.0), ("pair", 2.0))
      .toDF("g", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Quality.powerAnalysis(df, col("g"), col("v")).collect()
    got.map(_.getAs[String]("grp")).toSeq shouldBe Seq("pair")
    got.head.getAs[Double]("variance") shouldBe 0.5 // (2*12500-90000/…) exact
  }

  // -------------------------------------------- autocorrelation

  /** Scalar replay of the operator's exact-integer formula. */
  private def acfRef(xs: Seq[Long], lag: Int): Double = {
    val n = xs.length.toLong
    val u = xs.map(_ * 100)
    val s = u.sum
    val q = u.map(x => x * x).sum
    val pairs = u.dropRight(lag).zip(u.drop(lag))
    val ck = pairs.length.toLong
    val sxy = pairs.map { case (a, b) => BigInt(a) * b }.sum
    val sx = pairs.map(_._1).sum
    val sy = pairs.map(_._2).sum
    val num = BigInt(n) * n * sxy - BigInt(n) * s * (BigInt(sx) + sy) +
      BigInt(ck) * s * s
    val den = BigInt(n) * (BigInt(n) * q - BigInt(s) * s)
    ((num * 1073741824L) / den).toDouble / 1073741824.0
  }

  test("autocorrelation: alternating series is negative at lag 1, positive at lag 2") {
    val xs = Seq(1L, 3L, 1L, 3L, 1L, 3L, 1L, 3L)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "idx", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Windows.autocorrelation(df, Seq("key"), "idx", "v",
        maxLag = 3)
      .collect().map(r => r.getAs[Int]("lag") ->
        r.getAs[Double]("autocorr")).toMap
    got(1) should be < 0.0
    got(2) should be > 0.0
    got(1) shouldBe acfRef(xs, 1)
    got(2) shouldBe acfRef(xs, 2)
    got(3) shouldBe acfRef(xs, 3)
  }

  test("autocorrelation handles gaps: only existing index pairs count") {
    // indexes 0,1,2,10 -> lag-1 pairs: (0,1),(1,2) only
    val df = Seq(("k", 0L, 1.0), ("k", 1L, 2.0), ("k", 2L, 3.0),
      ("k", 10L, 4.0)).toDF("key", "idx", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Windows.autocorrelation(df, Seq("key"), "idx", "v", 1)
      .collect().head
    got.getAs[Long]("n_pairs") shouldBe 2L
  }

  test("constant series emits NULL autocorr (zero variance)") {
    val df = (0L to 5L).map(i => ("k", i, 7.0)).toDF("key", "idx", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Windows.autocorrelation(df, Seq("key"), "idx", "v", 1)
      .collect().head
    got.isNullAt(got.fieldIndex("autocorr")) shouldBe true
  }
}
