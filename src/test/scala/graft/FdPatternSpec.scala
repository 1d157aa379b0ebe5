package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Windows}

class FdPatternSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- fdViolations

  test("fdViolations reports only broken determinants, worst first") {
    val df = Seq(
      ("p1", "s1"), ("p1", "s1"),              // holds
      ("p2", "s1"), ("p2", "s2"), ("p2", "s2"), // broken, 2 deps
      ("p3", "s1"), ("p3", "s2"), ("p3", "s3")) // broken, 3 deps
      .toDF("det", "dep")
    val got = Quality.fdViolations(df, "det", "dep", topK = 10).collect()
    got.map(_.getString(0)).toSeq shouldBe Seq("p3", "p2")
    val p2 = got.find(_.getString(0) == "p2").get
    p2.getAs[Long]("n_rows") shouldBe 3L
    p2.getAs[Long]("n_dependents") shouldBe 2L
    p2.getAs[Double]("majority_confidence") shouldBe (2.0 / 3.0)
  }

  test("fdViolations topK caps the report deterministically") {
    val df = (1 to 20).flatMap(i =>
      Seq((f"p$i%02d", "a"), (f"p$i%02d", "b"))).toDF("det", "dep")
    Quality.fdViolations(df, "det", "dep", topK = 5).count() shouldBe 5L
  }

  // -------------------------------------------- vBottoms

  test("vBottoms finds the strict down-down-up-up dip") {
    val series = Seq(10L, 8L, 5L, 7L, 9L, 9L) // dip at pos 2; flat tail
    val df = series.zipWithIndex.map { case (v, i) => ("s", i, v) }
      .toDF("k", "pos", "v")
    val got = Windows.vBottoms(df, Seq("k"), col("pos"), col("v"))
      .collect()
    got.length shouldBe 1
    got.head.getAs[Int]("pos") shouldBe 2
    got.head.getAs[Long]("bottom_value") shouldBe 5L
    got.head.getAs[Long]("depth") shouldBe 4L // min(10, 9) - 5
  }

  test("vBottoms requires strict monotone shoulders") {
    // plateau on the way down: 10 8 8 5 7 9 -> not a strict V at 5
    val series = Seq(10L, 8L, 8L, 5L, 7L, 9L)
    val df = series.zipWithIndex.map { case (v, i) => ("s", i, v) }
      .toDF("k", "pos", "v")
    Windows.vBottoms(df, Seq("k"), col("pos"), col("v"))
      .count() shouldBe 0L
  }

  test("vBottoms handles multiple series and multiple dips") {
    val a = Seq(9L, 7L, 1L, 6L, 8L, 7L, 3L, 5L, 9L).zipWithIndex
      .map { case (v, i) => ("a", i, v) }
    val b = Seq(1L, 2L, 3L).zipWithIndex.map { case (v, i) => ("b", i, v) }
    val got = Windows.vBottoms((a ++ b).toDF("k", "pos", "v"),
      Seq("k"), col("pos"), col("v")).collect()
    got.map(r => (r.getString(0), r.getAs[Int]("pos"))).toSet shouldBe
      Set(("a", 2), ("a", 6))
  }
}
