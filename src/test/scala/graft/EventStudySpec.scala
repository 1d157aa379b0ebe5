package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventStudySpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 9) =
    Timestamp.valueOf(f"2024-02-$day%02d $h%02d:00:00")

  test("activity aligns to each user's own treatment day") {
    // u1 treated day 10, u2 treated day 20; both have 2 events the day
    // before and 3 the day after their OWN treatment
    val rows =
      Seq((1L, ts(9), "view"), (1L, ts(9, 10), "view"),
        (1L, ts(10), "purchase"),
        (1L, ts(11), "view"), (1L, ts(11, 10), "view"), (1L, ts(11, 11), "view"),
        (2L, ts(19), "view"), (2L, ts(19, 10), "view"),
        (2L, ts(20), "purchase"),
        (2L, ts(21), "view"), (2L, ts(21, 10), "view"), (2L, ts(21, 11), "view"))
    val got = EventOps.eventStudy(rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", col("event_type") === "purchase", radius = 3)
      .collect().map(r => r.getAs[Int]("rel_day") ->
        r.getAs[Double]("mean_events")).toMap
    got(-1) shouldBe 2.0
    got(0) shouldBe 1.0
    got(1) shouldBe 3.0
  }

  test("untreated users never contribute") {
    val rows = Seq(
      (1L, ts(10), "purchase"), (1L, ts(11), "view"),
      (9L, ts(10), "view"), (9L, ts(11), "view")) // never purchases
    val got = EventOps.eventStudy(rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", col("event_type") === "purchase", 3)
      .collect().map(r => r.getAs[Int]("rel_day") ->
        r.getAs[Long]("n_users")).toMap
    all(got.values) shouldBe 1L
  }

  test("days outside the radius are dropped") {
    val rows = Seq(
      (1L, ts(1), "view"), (1L, ts(10), "purchase"), (1L, ts(28), "view"))
    val got = EventOps.eventStudy(rows.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", col("event_type") === "purchase", 3)
      .collect().map(_.getAs[Int]("rel_day")).sorted
    got.toSeq shouldBe Seq(0)
  }
}
