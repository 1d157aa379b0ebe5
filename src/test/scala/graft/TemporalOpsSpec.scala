package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Windows}

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- locfFill

  private def day(d: Int) = Date.valueOf(f"2024-01-$d%02d")

  test("locfFill carries values across gaps up to the cap") {
    val obs = Seq(("u", day(1), 10L), ("u", day(5), 50L))
      .toDF("k", "day", "v")
    val got = Windows.locfFill(obs, Seq("k"), "day", "v", maxGapDays = 2)
      .collect().map(r => r.getDate(1).toString ->
        (Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("is_filled"), r.getAs[Int]("gap_days"))).toMap
    got("2024-01-01") shouldBe ((Some(10L), false, 0))
    got("2024-01-02") shouldBe ((Some(10L), true, 1))
    got("2024-01-03") shouldBe ((Some(10L), true, 2))
    got("2024-01-04") shouldBe ((None, false, 3)) // beyond the cap
    got("2024-01-05") shouldBe ((Some(50L), false, 0))
  }

  test("locfFill keys fill independently") {
    val obs = Seq(("a", day(1), 1L), ("a", day(3), 3L), ("b", day(2), 2L))
      .toDF("k", "day", "v")
    val got = Windows.locfFill(obs, Seq("k"), "day", "v", 5).collect()
    got.count(_.getString(0) == "a") shouldBe 3
    got.count(_.getString(0) == "b") shouldBe 1 // single-day spine
  }

  // -------------------------------------------- joinForward

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("joinForward picks the earliest right row at or after left ts") {
    val left = Seq((1L, ts(10))).toDF("k", "lt")
    val right = Seq((1L, ts(5), "early"), (1L, ts(12), "next"),
      (1L, ts(20), "late")).toDF("k", "rt", "v")
    val got = AsOf.joinForward(left, right, Seq("k"), col("lt"),
      col("rt"), col("v"), Seq("v")).collect().head
    got.getAs[String]("asof_v") shouldBe "next"
  }

  test("joinForward non-strict includes same-instant rows, strict skips") {
    val left = Seq((1L, ts(10))).toDF("k", "lt")
    val right = Seq((1L, ts(10), "same"), (1L, ts(11), "after"))
      .toDF("k", "rt", "v")
    AsOf.joinForward(left, right, Seq("k"), col("lt"), col("rt"),
      col("v"), Seq("v")).collect().head
      .getAs[String]("asof_v") shouldBe "same"
    AsOf.joinForward(left, right, Seq("k"), col("lt"), col("rt"),
      col("v"), Seq("v"), strict = true).collect().head
      .getAs[String]("asof_v") shouldBe "after"
  }

  test("joinForward maxLeadSec masks matches too far ahead") {
    val left = Seq((1L, ts(0))).toDF("k", "lt")
    val right = Seq((1L, ts(100), "far")).toDF("k", "rt", "v")
    val r = AsOf.joinForward(left, right, Seq("k"), col("lt"), col("rt"),
      col("v"), Seq("v"), maxLeadSec = Some(60L)).collect().head
    r.isNullAt(r.fieldIndex("asof_v")) shouldBe true
  }

  test("joinForward same-instant ties resolve to the smallest tiebreak") {
    val left = Seq((1L, ts(10))).toDF("k", "lt")
    val right = Seq((1L, ts(12), 5L, "five"), (1L, ts(12), 2L, "two"))
      .toDF("k", "rt", "tb", "v")
    AsOf.joinForward(left, right, Seq("k"), col("lt"), col("rt"),
      col("tb"), Seq("v")).collect().head
      .getAs[String]("asof_v") shouldBe "two"
  }

  // -------------------------------------------- clampedRunningBalance

  test("clamped balance matches the sequential recurrence") {
    val deltas = Seq(2L, -5L, 3L, -1L, 4L, -10L, 6L)
    val df = deltas.zipWithIndex.map { case (d, i) => ("k", i, d) }
      .toDF("k", "pos", "d")
    val got = Windows.clampedRunningBalance(df, Seq("k"),
      Seq(col("pos")), col("d"))
      .orderBy(col("pos")).collect().map(_.getAs[Long]("balance"))
    val expected = deltas.scanLeft(0L)((b, x) => math.max(b + x, 0L)).tail
    got.toSeq shouldBe expected
  }

  test("clamped balance never goes negative and tracks unclamped sums " +
    "when positive") {
    val df = (1 to 30).map(i =>
      ("k", i, if (i % 3 == 0) -7L else 4L)).toDF("k", "pos", "d")
    val got = Windows.clampedRunningBalance(df, Seq("k"),
      Seq(col("pos")), col("d")).collect().map(_.getAs[Long]("balance"))
    all(got) should be >= 0L
  }
}
