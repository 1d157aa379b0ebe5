package graft

import org.apache.spark.sql.functions._

import graft.operators.{Eval, Stats}

class StumpGainsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- stumpScreen

  test("the informative feature wins and splits at the step") {
    // y jumps when f1 crosses 5; f2 is pure noise-free constant
    val df = (1 to 200).map { i =>
      val f1 = i % 10L
      val y = if (f1 >= 5) 10000L else 1000L
      (f1, (i % 3).toLong, y)
    }.toDF("f1", "f2", "y")
    val got = Stats.stumpScreen(df,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("split_value"), r.getAs[Int]("rank"))).toMap
    got("f1")._1 shouldBe 4L // left side ends at value 4
    got("f1")._2 shouldBe 1  // ranked first
    got("f2")._2 shouldBe 2
  }

  test("means on either side of the split are exact") {
    val df = Seq((1L, 100L), (2L, 100L), (8L, 900L), (9L, 900L))
      .toDF("f", "y")
    val got = Stats.stumpScreen(df, Seq("f" -> col("f")), col("y"))
      .collect().head
    got.getAs[Long]("split_value") shouldBe 2L
    got.getAs[Double]("left_mean") shouldBe 1.0  // 100 cents = 1.00
    got.getAs[Double]("right_mean") shouldBe 9.0
    got.getAs[Double]("gain") should be > 0.0
  }

  // -------------------------------------------- gainsChart

  test("a perfect score captures all positives in the top tiles") {
    // 100 entities, top-20 scores are the 20 positives
    val df = (1 to 100).map(i => (i.toLong, (100 - i).toLong, i <= 20))
      .toDF("id", "score", "label")
    val got = Eval.gainsChart(df, "id", col("score"), col("label"))
      .collect().sortBy(_.getAs[Int]("tile"))
    got(0).getAs[Double]("cum_capture") shouldBe 0.5 // 10 of 20
    got(1).getAs[Double]("cum_capture") shouldBe 1.0
    got(1).getAs[Double]("lift") shouldBe 5.0 // 100% captured at 20% depth
    got.last.getAs[Double]("lift") shouldBe 1.0
  }

  test("a useless score has lift ~1 everywhere") {
    // positives spread evenly across score order
    val df = (1 to 200).map(i => (i.toLong, i.toLong, i % 10 == 0))
      .toDF("id", "score", "label")
    val got = Eval.gainsChart(df, "id", col("score"), col("label"))
      .collect()
    all(got.map(_.getAs[Double]("lift"))) shouldBe 1.0 +- 0.15
  }
}
