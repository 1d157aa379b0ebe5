package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val events = Seq(
    ("u1", ts("2024-01-01 00:05:00"), 1, 10.0),
    ("u1", ts("2024-01-01 00:20:00"), 2, 20.0),
    ("u1", ts("2024-01-01 01:10:00"), 3, 30.0), // >30min gap → new session
    ("u2", ts("2024-01-01 00:59:59"), 4, 40.0)
  ).toDF("user_id", "ts", "event_id", "value")

  test("tumblingAgg: epoch-aligned hourly windows") {
    val out = EventOps.tumblingAgg(events, $"ts", 3600, Seq($"user_id"),
        Seq(count(lit(1)).as("n"), sum($"value").as("sv")))
      .orderBy("user_id", "window_start")
      .select($"user_id", $"window_start".cast("string"), $"n", $"sv")
      .as[(String, String, Long, Double)].collect().toSeq
    out shouldBe Seq(
      ("u1", "2024-01-01 00:00:00", 2L, 30.0),
      ("u1", "2024-01-01 01:00:00", 1L, 30.0),
      ("u2", "2024-01-01 00:00:00", 1L, 40.0))
  }

  test("slidingAgg: each event lands in size/slide windows") {
    val out = EventOps.slidingAgg(events.filter($"event_id" === 1),
        $"ts", 600, 300, Seq($"user_id"), Seq(count(lit(1)).as("n")))
      .orderBy("window_start")
      .select($"window_start".cast("string")).as[String].collect().toSeq
    // event at 00:05 belongs to [00:00,00:10) and [00:05,00:15)
    out shouldBe Seq("2024-01-01 00:00:00", "2024-01-01 00:05:00")
  }

  test("sliding grid matches Spark's native window() function") {
    val ours = EventOps.slidingAgg(events, $"ts", 600, 300,
        Seq($"user_id"), Seq(count(lit(1)).as("n")))
      .select($"user_id", $"window_start", $"n")
    val native = events.groupBy($"user_id",
        window($"ts", "10 minutes", "5 minutes").getField("start").as("window_start"))
      .agg(count(lit(1)).as("n"))
    ours.except(native).count() shouldBe 0
    native.except(ours).count() shouldBe 0
  }

  test("sessionize: 30-minute gap starts a new session") {
    val out = EventOps.sessionize(events, $"user_id", $"ts", $"event_id", 1800)
      .orderBy("user_id", "ts")
      .select("user_id", "event_id", "session_id")
      .as[(String, Int, Long)].collect().toSeq
    out shouldBe Seq(
      ("u1", 1, 1L), ("u1", 2, 1L), ("u1", 3, 2L), ("u2", 4, 1L))
  }
}
