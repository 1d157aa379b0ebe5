package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.operators.EventOps.Step

class FunnelRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: full ordered funnel; user 2: purchase BEFORE signup (must not
  // convert past click); user 3: signup only; user 4: no signup at all
  private lazy val events = Seq(
    (1L, "signup", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    (2L, "purchase", ts("2024-01-02 09:00:00")),
    (2L, "signup", ts("2024-01-02 10:00:00")),
    (2L, "click", ts("2024-01-02 11:00:00")),
    (3L, "signup", ts("2024-01-03 08:00:00")),
    (4L, "click", ts("2024-01-04 08:00:00")),
    (4L, "purchase", ts("2024-01-04 09:00:00")))
    .toDF("user_id", "event_type", "ts")

  private val steps = Seq(
    Step("signup", col("event_type") === "signup"),
    Step("click", col("event_type") === "click"),
    Step("purchase", col("event_type") === "purchase"))

  test("funnel honors step order: events before the prior step don't count") {
    val rows = EventOps.funnel(events, col("user_id"), col("ts"), steps)
      .orderBy("user_id")
      .select("user_id", "signup_ts", "click_ts", "purchase_ts")
      .collect()
    rows.map(_.getLong(0)) shouldBe Seq(1L, 2L, 3L)   // user 4 never signed up
    val u1 = rows(0); val u2 = rows(1); val u3 = rows(2)
    u1.getTimestamp(3) shouldBe ts("2024-01-01 10:10:00")
    u2.getTimestamp(2) shouldBe ts("2024-01-02 11:00:00")
    assert(u2.isNullAt(3))  // the 09:00 purchase precedes the click
    assert(u3.isNullAt(2))
    assert(u3.isNullAt(3))
  }

  test("funnel counts events AT the prior step's instant (>=, not >)") {
    val sameInstant = Seq(
      (9L, "signup", ts("2024-01-01 10:00:00")),
      (9L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    EventOps.funnel(sameInstant, col("user_id"), col("ts"), steps.take(2))
      .filter(col("click_ts").isNotNull).count() shouldBe 1L
  }

  test("funnelCounts: monotone counts and conversion vs step 1") {
    val rows = EventOps.funnelCounts(events, col("user_id"), col("ts"), steps)
      .orderBy("step").collect()
    rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))) shouldBe
      Seq((1, "signup", 3L), (2, "click", 2L), (3, "purchase", 1L))
    rows.map(_.getDouble(3)) shouldBe Seq(1.0, 2.0 / 3, 1.0 / 3)
  }

  test("funnel withinSec: conversions outside the window don't count") {
    // user 2's click is 1 h after signup — a 30-min window rejects it,
    // user 1's 5-min click passes
    val perUser = EventOps.funnel(events, col("user_id"), col("ts"),
      steps.take(2), withinSec = Some(1800L))
      .orderBy("user_id").collect()
    perUser.map(_.getLong(0)) shouldBe Seq(1L, 2L, 3L)
    perUser(0).getTimestamp(1) shouldBe ts("2024-01-01 10:00:00")
    assert(!perUser(0).isNullAt(2))
    assert(perUser(1).isNullAt(2))
    // boundary: exactly AT the window edge still converts
    EventOps.funnel(events, col("user_id"), col("ts"),
      steps.take(2), withinSec = Some(3600L))
      .filter(col("user_id") === 2L)
      .select("click_ts").collect()(0).getTimestamp(0) shouldBe
      ts("2024-01-02 11:00:00")
  }

  test("retention: cohort day 0 always counts; offsets past the cap drop") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-03-01 10:00:00")),                 // offset 60 > cap
      (2L, ts("2024-01-01 23:00:00")), (2L, ts("2024-01-01 23:30:00")),
      (3L, ts("2024-01-02 00:00:00")))
      .toDF("user_id", "ts")
    val got = EventOps.retention(ev, col("user_id"), col("ts"),
        maxOffsetDays = 30)
      .as[(java.sql.Date, Int, Long)].collect().toSeq
      .map { case (d, o, n) => (d.toString, o, n) }.sorted
    got shouldBe Seq(
      ("2024-01-01", 0, 2L),   // users 1 and 2 on their cohort day
      ("2024-01-01", 1, 1L),   // user 1 back next day
      ("2024-01-02", 0, 1L))   // user 3's own cohort
  }
}
