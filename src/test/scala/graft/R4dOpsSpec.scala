package graft

import org.apache.spark.sql.functions._

import graft.operators.{NearDup, Quality, Windows}

/** Round-4 wave-4 analytics operators: gaps-and-islands, blocked edit
  * distance, exact-moment statistics, distribution-rank suite. */
class R4dOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- gapsAndIslands -----------------------------------------------------

  test("gapsAndIslands: consecutive days group, gaps split") {
    val df = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (1L, "2024-01-05"),                       // gap -> new island
      (2L, "2024-01-01"), (2L, "2024-01-01"),   // same-day duplicate
      (2L, "2024-02-10")
    ).toDF("k", "d").withColumn("d", to_date($"d"))
    val out = Windows.gapsAndIslands(df, "k", "d")
      .select($"k", $"streak_start".cast("string"),
        $"streak_end".cast("string"), $"n_days")
      .as[(Long, String, String, Long)].collect().toSet
    out shouldBe Set(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-05", "2024-01-05", 1L),
      (2L, "2024-01-01", "2024-01-01", 1L),
      (2L, "2024-02-10", "2024-02-10", 1L))
  }

  // ---- editDistancePairs --------------------------------------------------

  test("editDistancePairs: in-block near matches found, distances exact") {
    val df = Seq(
      (1L, "widget"), (2L, "widgit"),   // dist 1, same block 'w'
      (3L, "gadget"), (4L, "gasket"),   // dist 2, same block 'g'
      (5L, "Widget")                    // case-folded into block 'w'
    ).toDF("id", "name")
    val out = NearDup.editDistancePairs(df, "id", "name", maxDist = 2)
      .select($"a_id", $"b_id", $"distance")
      .as[(Long, Long, Int)].collect().toSet
    out shouldBe Set((1L, 2L, 1), (3L, 4L, 2), (1L, 5L, 1), (2L, 5L, 2))
  }

  test("editDistancePairs: first-char blocking misses cross-block typos") {
    // "zidget" is 1 edit from "widget" but blocks under 'z' — the
    // documented approximation of first-character blocking
    val df = Seq((1L, "widget"), (2L, "zidget")).toDF("id", "name")
    NearDup.editDistancePairs(df, "id", "name", maxDist = 2)
      .count() shouldBe 0L
  }

  test("editDistancePairs: length filter prunes before distance") {
    val df = Seq((1L, "ab"), (2L, "abcdefghij")).toDF("id", "name")
    NearDup.editDistancePairs(df, "id", "name", maxDist = 3)
      .count() shouldBe 0L
  }

  // ---- exactMoments -------------------------------------------------------

  test("exactMoments matches closed-form stats on a known sample") {
    // x = 1..5 (g = A), y = 2x: corr 1, mean 3, var_samp 2.5, skew 0
    val df = (1 to 5).map(i => ("A", i.toDouble, 2.0 * i))
      .toDF("g", "x", "y")
    val r = Quality.exactMoments(df, Seq("g"), "x", "y")
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    r._2 shouldBe 5L
    r._3 shouldBe 3.0
    r._4 shouldBe math.sqrt(2.5) +- 1e-15
    r._5 shouldBe 0.0 +- 1e-12
    r._6 shouldBe 1.0 +- 1e-12
  }

  test("exactMoments: skewness sign tracks the tail") {
    val right = Seq(1.0, 1.0, 1.0, 1.0, 10.0).map(("A", _, 1.0))
      .toDF("g", "x", "y")
    val left = Seq(10.0, 10.0, 10.0, 10.0, 1.0).map(("A", _, 1.0))
      .toDF("g", "x", "y")
    Quality.exactMoments(right, Seq("g"), "x", "y")
      .select($"skewness_x").as[Double].head() should be > 0.0
    Quality.exactMoments(left, Seq("g"), "x", "y")
      .select($"skewness_x").as[Double].head() should be < 0.0
  }

  test("exactMoments: singleton and constant groups degrade to NULL stats") {
    // ANSI mode would abort on the zero divisors without the nullif guards
    val df = Seq(("solo", 5.0, 1.0),
      ("const", 7.0, 2.0), ("const", 7.0, 3.0)).toDF("g", "x", "y")
    val rows = Quality.exactMoments(df, Seq("g"), "x", "y")
      .select($"g", $"stddev_x".isNull, $"skewness_x".isNull,
        $"corr_xy".isNull)
      .as[(String, Boolean, Boolean, Boolean)].collect()
      .map { case (g, a, b, c) => g -> ((a, b, c)) }.toMap
    rows("solo") shouldBe ((true, true, true))   // n = 1
    rows("const")._2 shouldBe true                // m2 = 0 -> NULL skew
    rows("const")._3 shouldBe true                // zero x-variance -> NULL corr
  }

  test("exactMoments is partitioning-invariant (exact decimal sums)") {
    val data = (1 to 1000).map(i => ("G", (i * 37 % 991) + 0.25, i * 3 % 17))
    val one = Quality.exactMoments(
      data.toDF("g", "x", "y").repartition(1), Seq("g"), "x", "y")
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    val many = Quality.exactMoments(
      data.toDF("g", "x", "y").repartition(13), Seq("g"), "x", "y")
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    // bit-identical, not approximately equal — that is the operator's point
    one shouldBe many
  }

  // ---- rankSuite ----------------------------------------------------------

  test("rankSuite: ntile/percent_rank/cume_dist/dense_rank on one window") {
    val df = Seq(("A", 1L, 10.0), ("A", 2L, 20.0), ("A", 3L, 20.0),
      ("A", 4L, 40.0), ("B", 5L, 7.0))
      .toDF("g", "id", "v")
    val out = Windows.rankSuite(df, Seq($"g"), Seq($"v", $"id"), buckets = 2)
      .select($"id", $"bucket", $"pct_rank", $"cume_dist", $"dense_rank")
      .as[(Long, Int, Double, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, 1, 0.0, 0.25, 1))
    out(2L) shouldBe ((2L, 1, 1.0 / 3, 0.5, 2))
    out(3L) shouldBe ((3L, 2, 2.0 / 3, 0.75, 3))
    out(4L) shouldBe ((4L, 2, 1.0, 1.0, 4))
    // single-row partition: percent_rank 0 by convention, cume_dist 1
    out(5L) shouldBe ((5L, 1, 0.0, 1.0, 1))
  }
}
