package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Windows}

class SlopeConcurrencySpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- rollingSlope

  test("rolling slope recovers a linear trend exactly") {
    val df = (1 to 40).map(i => ("s", i.toLong, 500L + i * 7L))
      .toDF("k", "x", "cents")
    val got = Windows.rollingSlope(df, Seq("k"), col("x"), col("cents"),
      windowDays = 10).collect()
    // every full window sees slope exactly 7
    got.filter(_.getAs[Long]("n_days") == 10L)
      .foreach(_.getAs[Double]("slope") shouldBe 7.0)
  }

  test("rolling slope is NULL on a single-point window") {
    val df = Seq(("s", 5L, 100L)).toDF("k", "x", "cents")
    val r = Windows.rollingSlope(df, Seq("k"), col("x"), col("cents"), 10)
      .collect().head
    r.isNullAt(r.fieldIndex("slope")) shouldBe true
  }

  test("rolling slope windows by VALUE range, not row count") {
    // gap larger than the window: second point's window excludes first
    val df = Seq(("s", 1L, 100L), ("s", 100L, 900L)).toDF("k", "x", "cents")
    val got = Windows.rollingSlope(df, Seq("k"), col("x"), col("cents"), 10)
      .collect()
    all(got.map(_.getAs[Long]("n_days"))) shouldBe 1L
  }

  // -------------------------------------------- concurrencyTimeProfile

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("time-weighted percentiles reflect dwell time, not boundary count") {
    // one span of 100 s at concurrency 1, plus a 1 s triple overlap:
    // p50 must be 1 (most TIME at 1), peak 3
    val spans = Seq(
      ("t", 1L, ts(0), ts(100)),
      ("t", 2L, ts(50), ts(51)),
      ("t", 3L, ts(50), ts(51)))
      .toDF("g", "id", "s", "e")
    val got = EventOps.concurrencyTimeProfile(spans, "g", "s", "e", "id",
      Seq(0.5, 0.95)).collect().head
    got.getAs[Long]("peak") shouldBe 3L
    got.getAs[Long]("p50") shouldBe 1L
    got.getAs[Long]("p95") shouldBe 1L
    got.getAs[Long]("total_us") shouldBe 100L * 1000000L
  }

  test("end-before-start at the same instant: no phantom overlap") {
    // back-to-back spans share an instant; concurrency never reaches 2
    val spans = Seq(
      ("t", 1L, ts(0), ts(10)), ("t", 2L, ts(10), ts(20)))
      .toDF("g", "id", "s", "e")
    EventOps.concurrencyTimeProfile(spans, "g", "s", "e", "id", Seq(0.99))
      .collect().head.getAs[Long]("peak") shouldBe 1L
  }

  test("groups profile independently") {
    val spans = Seq(
      ("a", 1L, ts(0), ts(10)), ("a", 2L, ts(0), ts(10)),
      ("b", 3L, ts(0), ts(10)))
      .toDF("g", "id", "s", "e")
    val got = EventOps.concurrencyTimeProfile(spans, "g", "s", "e", "id",
      Seq(0.5)).collect().map(r => r.getString(0) ->
        r.getAs[Long]("peak")).toMap
    got shouldBe Map("a" -> 2L, "b" -> 1L)
  }
}
