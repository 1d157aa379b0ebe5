package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Corpus, EventOps}

/** Round-4 wave-7 operators: daily anomaly z-scores, per-group top
  * terms, staleness-bounded as-of join. */
class R4fOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- dailyVolumeAnomaly -------------------------------------------------

  test("dailyVolumeAnomaly: a spike day is flagged, steady days are not") {
    // type A: 5 days at 10 events, one day at 100 -> that day is anomalous
    val rows =
      (for {
        d <- 1 to 5; i <- 1 to 10
      } yield (ts(f"2024-01-0$d%d 12:00:00"), "A", i)) ++
        (1 to 100).map(i => (ts("2024-01-06 12:00:00"), "A", i))
    val out = EventOps.dailyVolumeAnomaly(
      rows.toDF("ts", "etype", "i"), "ts", "etype", zThreshold = 2.0)
      .select($"day".cast("string"), $"n_events", $"is_anomaly")
      .as[(String, Long, Boolean)].collect()
      .map { case (d, n, a) => d -> ((n, a)) }.toMap
    out("2024-01-06")._1 shouldBe 100L
    out("2024-01-06")._2 shouldBe true
    (1 to 5).foreach { d =>
      out(f"2024-01-0$d%d")._2 shouldBe false
    }
  }

  test("dailyVolumeAnomaly is partitioning-invariant (exact moments)") {
    val rows = (1 to 500).map(i =>
      (ts(f"2024-01-${i % 28 + 1}%02d 0${i % 9}%d:00:00"),
        if (i % 2 == 0) "A" else "B", i))
    val one = EventOps.dailyVolumeAnomaly(
      rows.toDF("ts", "etype", "i").repartition(1), "ts", "etype", 2.0)
      .as[(String, java.sql.Date, Long, Double, Double, Double, Boolean)]
      .collect().toSet
    val many = EventOps.dailyVolumeAnomaly(
      rows.toDF("ts", "etype", "i").repartition(13), "ts", "etype", 2.0)
      .as[(String, java.sql.Date, Long, Double, Double, Double, Boolean)]
      .collect().toSet
    one shouldBe many
  }

  test("dailyVolumeAnomaly: single-day and constant-curve types give NULL z") {
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), "oneday", 1),
      // constant 2-a-day curve: stddev 0 -> NULL z, not an abort
      (ts("2024-01-01 10:00:00"), "flat", 1),
      (ts("2024-01-01 11:00:00"), "flat", 2),
      (ts("2024-01-02 10:00:00"), "flat", 3),
      (ts("2024-01-02 11:00:00"), "flat", 4))
    val out = EventOps.dailyVolumeAnomaly(
      rows.toDF("ts", "etype", "i"), "ts", "etype", 2.0)
      .select($"event_type", $"z".isNull).as[(String, Boolean)]
      .collect().toSet
    out shouldBe Set(("oneday", true), ("flat", true))
  }

  test("daily counts: streaming 1-day tumbling == the anomaly batch grain") {
    // the daily grain feeding dailyVolumeAnomaly equals a streaming
    // 86400 s epoch-aligned tumbling count over the same events
    implicit val sc = spark.sqlContext
    val rows = Seq(
      ("A", ts("2024-01-01 00:10:00")), ("A", ts("2024-01-01 23:59:59")),
      ("A", ts("2024-01-02 00:00:00")), ("B", ts("2024-01-01 12:00:00")))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Timestamp)]
    mem.addData(rows: _*)
    val out = graft.streaming.StreamOps.tumblingAgg(
      mem.toDF.toDF("etype", "ts"), "ts", sizeSec = 86400,
      watermark = "0 seconds", keys = Seq(col("etype")),
      aggs = Seq(count(lit(1)).as("n_events")))
    val name = s"daily_parity_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(name)
      .select(to_date($"window_start").cast("string"), $"etype", $"n_events")
      .as[(String, String, Long)].collect().toSet
    val batch = rows.toDF("etype", "ts")
      .groupBy(to_date($"ts").cast("string").as("day"), $"etype")
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    streamed shouldBe batch
  }

  // ---- audienceOverlap / transitionMatrix ----------------------------------

  test("audienceOverlap: distinct-user jaccard per type pair") {
    val ev = Seq(
      (1L, "view"), (1L, "click"), (1L, "view"), // dup row collapses
      (2L, "view"), (3L, "click"))
      .toDF("user_id", "etype")
    val out = EventOps.audienceOverlap(ev, "etype", "user_id")
      .as[(String, String, Long, Long, Long, Double)].collect().toList
    out shouldBe List(("click", "view", 1L, 2L, 2L, 1.0 / 3))
  }

  test("transitionMatrix: per-user sequences, last event has no row") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 10L, ts("2024-01-01 10:01:00"), "click"),
      (3L, 10L, ts("2024-01-01 10:02:00"), "view"),
      (4L, 20L, ts("2024-01-01 10:00:00"), "view")) // singleton user
      .toDF("event_id", "user_id", "ts", "etype")
    val out = EventOps.transitionMatrix(ev, "user_id", "ts", "etype",
        "event_id")
      .as[(String, String, Long)].collect().toSet
    out shouldBe Set(("view", "click", 1L), ("click", "view", 1L))
  }

  test("transitionMatrix: same-timestamp events order by the tiebreak") {
    val ev = Seq(
      (2L, 10L, ts("2024-01-01 10:00:00"), "b"),
      (1L, 10L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("event_id", "user_id", "ts", "etype")
    EventOps.transitionMatrix(ev, "user_id", "ts", "etype", "event_id")
      .as[(String, String, Long)].collect().toList shouldBe
      List(("a", "b", 1L))
  }

  // ---- topTermsPerGroup ---------------------------------------------------

  test("topTermsPerGroup: per-group counts, rank caps at k, tie by token") {
    val docs = Seq(
      ("s1", "a a a b b c"),
      ("s1", "a b"),
      ("s2", "x y y")
    ).toDF("src", "text")
    val out = Corpus.topTermsPerGroup(docs, "text", "src", k = 2)
      .as[(String, String, Long, Int)].collect().toSet
    out shouldBe Set(
      ("s1", "a", 4L, 1), ("s1", "b", 3L, 2),
      ("s2", "y", 2L, 1), ("s2", "x", 1L, 2))
  }

  test("topTermsPerGroup: rank cap stays below the exchange (group limit)") {
    val docs = Seq(("s1", "a b c d e f g h i j")).toDF("src", "text")
    val plan = Corpus.topTermsPerGroup(docs, "text", "src", k = 3)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  // ---- AsOf.join with maxStalenessSec -------------------------------------

  test("asof tolerance: stale matches are nulled, fresh ones survive") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // view 5 min earlier: fresh
      (2L, 10L, ts("2024-01-01 12:00:00")),  // latest view 2h old: stale
      (3L, 20L, ts("2024-01-01 10:00:00"))   // no view at all
    ).toDF("id", "user", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:55:00"), 1.5)
    ).toDF("rid", "user", "ts", "v")
    val out = AsOf.join(left, right, Seq("user"),
        leftTs = col("ts"), rightTs = col("ts"), tiebreak = col("rid"),
        payload = Seq("rid", "v"), strict = false,
        maxStalenessSec = Some(600L))
      .select($"id", $"asof_rid", $"asof_v")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    out(1L) shouldBe ((Some(100L), Some(1.5)))
    out(2L) shouldBe ((None, None))
    out(3L) shouldBe ((None, None))
  }

  test("asof tolerance: boundary is inclusive at exactly maxStaleness") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:10:00"))).toDF("id", "user", "ts")
    val right = Seq((100L, 10L, ts("2024-01-01 10:00:00"), 2.0))
      .toDF("rid", "user", "ts", "v")
    val out = AsOf.join(left, right, Seq("user"),
        col("ts"), col("ts"), col("rid"), Seq("rid"),
        strict = false, maxStalenessSec = Some(600L))
      .select($"asof_rid").as[Option[Long]].collect().head
    out shouldBe Some(100L)
  }

  test("asof without tolerance keeps arbitrarily stale matches (unchanged)") {
    val left = Seq((1L, 10L, ts("2024-06-01 00:00:00"))).toDF("id", "user", "ts")
    val right = Seq((100L, 10L, ts("2020-01-01 00:00:00"), 7.0))
      .toDF("rid", "user", "ts", "v")
    AsOf.join(left, right, Seq("user"), col("ts"), col("ts"), col("rid"),
        Seq("rid"), strict = false)
      .select($"asof_rid").as[Option[Long]].collect()
      .head shouldBe Some(100L)
  }
}
