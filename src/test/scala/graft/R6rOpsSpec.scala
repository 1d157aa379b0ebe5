package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Quality, Windows}

class R6rOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // -------------------------------------------- Markov attribution

  test("markovAttribution credits the only converting channel fully") {
    // u1: a -> conv; u2: b -> null
    val df = Seq(
      (1L, ts(0), 10L, "a"), (1L, ts(1), 11L, "purchase"),
      (2L, ts(0), 20L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.markovAttribution(df, "user_id", "ts", "event_type",
      "event_id", "purchase", Seq("a", "b"))
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Double]("removal_effect"),
          r.getAs[Double]("attribution_share"))).toMap
    got("a")._1 shouldBe 1.0 +- 1e-6 // removing a kills all conversion
    got("a")._2 shouldBe 1.0 +- 1e-6
    got("b")._1 shouldBe 0.0
    got("b")._2 shouldBe 0.0
  }

  test("markovAttribution p_full matches the hand-solved chain") {
    // every user: a then 50/50 conv vs null -> p_full = 0.5
    val rows = (1L to 20L).flatMap { u =>
      val end = if (u % 2 == 0) "purchase" else "x_end"
      Seq((u, ts(0), u * 10, "a"), (u, ts(1), u * 10 + 1, end))
    }
    // x_end is not a channel -> filtered; odd users end at 'a' -> __null
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.markovAttribution(df, "user_id", "ts", "event_type",
      "event_id", "purchase", Seq("a", "b"))
      .collect()
    got.head.getAs[Double]("p_full") shouldBe 0.5 +- 1e-5
  }

  test("markovAttribution splits credit across serial channels") {
    // journeys: a -> b -> conv; removing either kills conversion
    val df = (1L to 5L).flatMap(u => Seq(
      (u, ts(0), u * 10, "a"), (u, ts(1), u * 10 + 1, "b"),
      (u, ts(2), u * 10 + 2, "purchase")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.markovAttribution(df, "user_id", "ts", "event_type",
      "event_id", "purchase", Seq("a", "b"))
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Double]("attribution_share")).toMap
    got("a") shouldBe 0.5 +- 1e-6
    got("b") shouldBe 0.5 +- 1e-6
  }

  test("markovAttribution journeys cut at the first conversion") {
    // events after purchase must not create transitions
    val df = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "purchase"),
      (1L, ts(2), 3L, "b"), (1L, ts(3), 4L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.markovAttribution(df, "user_id", "ts", "event_type",
      "event_id", "purchase", Seq("a", "b"))
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Double]("removal_effect")).toMap
    got("b") shouldBe 0.0 // b only appears post-conversion
  }

  test("markovAttribution fails fast on an over-cap channel vocabulary " +
    "before running any job") {
    val df = Seq((1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    spark.conf.set(EventOps.MaxMarkovStatesKey, "16")
    try {
      val wide = (1 to 64).map(i => s"ch_$i")
      val ex = the[IllegalArgumentException] thrownBy
        EventOps.markovAttribution(df, "user_id", "ts", "event_type",
          "event_id", "purchase", wide)
      ex.getMessage should include(EventOps.MaxMarkovStatesKey)
      // at the cap boundary the call still runs
      EventOps.markovAttribution(df, "user_id", "ts", "event_type",
        "event_id", "purchase", (1 to 13).map(i => s"ch_$i"))
        .count() shouldBe 13L
    } finally spark.conf.unset(EventOps.MaxMarkovStatesKey)
  }

  // -------------------------------------------- truncated EWMA

  test("truncatedEwma of a constant series is the constant") {
    val df = (1 to 40).map(i => ("k", i, 7.5)).toDF("k", "i", "v")
    val got = Windows.truncatedEwma(df, Seq("k"), "i", "v", 1, 5, span = 10)
      .collect()
    got.foreach(_.getAs[Double]("ewma") shouldBe 7.5)
  }

  test("truncatedEwma first row equals its own value; second blends") {
    val df = Seq(("k", 1, 10.0), ("k", 2, 0.0)).toDF("k", "i", "v")
    val got = Windows.truncatedEwma(df, Seq("k"), "i", "v", 1, 5, span = 30)
      .orderBy("i").collect()
    got(0).getAs[Double]("ewma") shouldBe 10.0
    // (1*0 + 0.8*10) / (1 + 0.8) = 4.444..., cent-truncated to 4.44
    got(1).getAs[Double]("ewma") shouldBe 4.44
  }

  test("truncatedEwma responds faster with larger alpha") {
    val df = ((1 to 20).map(i => ("k", i, 0.0)) :+ (("k", 21, 100.0)))
      .toDF("k", "i", "v")
    def last(num: Int, den: Int) =
      Windows.truncatedEwma(df, Seq("k"), "i", "v", num, den, span = 20)
        .orderBy(desc("i")).limit(1).collect().head.getAs[Double]("ewma")
    last(1, 2) should be > last(1, 10)
  }

  // -------------------------------------------- BH drift screen

  test("bhDriftScreen flags the one drifted group") {
    // 9 balanced groups + 1 wildly skewed group
    val balanced = for (g <- 1 to 9; c <- Seq("a", "b", "c"); _ <- 1 to 20)
      yield (s"g$g", c)
    val skewed = Seq.fill(60)(("gX", "a"))
    val got = Quality.bhDriftScreen(
      (balanced ++ skewed).toDF("g", "c"), "g", "c", Seq("a", "b", "c"))
      .collect()
    val flagged = got.filter(_.getAs[Boolean]("drifted"))
      .map(_.getAs[String]("group"))
    flagged should contain("gX")
    // balanced groups all carry the same (high) p -> not flagged
    got.filter(_.getAs[String]("group") != "gX")
      .count(_.getAs[Boolean]("drifted")) shouldBe 0
  }

  test("bhDriftScreen identical groups flag nothing") {
    val df = (for (g <- 1 to 6; c <- Seq("a", "b", "c"); _ <- 1 to 10)
      yield (s"s$g", c)).toDF("g", "c")
    Quality.bhDriftScreen(df, "g", "c", Seq("a", "b", "c")).collect()
      .count(_.getAs[Boolean]("drifted")) shouldBe 0
  }

  test("bhDriftScreen p-values decrease with chi2 and ranks are dense") {
    val df = ((for (g <- Seq("even1", "even2"); c <- Seq("a", "b", "c");
      _ <- 1 to 30) yield (g, c)) ++
      (Seq.fill(50)(("tilt", "a")) ++ Seq.fill(25)(("tilt", "b"))
        ++ Seq.fill(15)(("tilt", "c")))).toDF("g", "c")
    val got = Quality.bhDriftScreen(df, "g", "c", Seq("a", "b", "c"))
      .orderBy("p_rank").collect()
    got.map(_.getAs[Int]("p_rank")).toSeq shouldBe Seq(1, 2, 3)
    got.head.getAs[Double]("chi2") should be >
      got.last.getAs[Double]("chi2")
    got.head.getAs[Double]("p_value") should be <
      got.last.getAs[Double]("p_value")
  }

  // -------------------------------------------- burst dedup

  test("burstDedup: chained bursts collapse to their first event with " +
    "suppressed counts; a gap over the threshold starts a new burst") {
    // u1/click: events at 0s, 50s, 110s (each within 60s of previous ->
    // ONE burst although 0s..110s > 60s), then 300s (new burst)
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:50"), 1L, "click"),
      (3L, Timestamp.valueOf("2024-01-01 00:01:50"), 1L, "click"),
      (4L, Timestamp.valueOf("2024-01-01 00:05:00"), 1L, "click"),
      // different type: independent bursts
      (5L, Timestamp.valueOf("2024-01-01 00:00:10"), 1L, "view"),
      // same-timestamp tiebreak: lower event_id kept
      (7L, Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "click"),
      (6L, Timestamp.valueOf("2024-01-01 00:00:00"), 2L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.burstDedup(df, Seq("user_id", "event_type"),
        "ts", "event_id", gapSec = 60)
      .select("event_id", "n_suppressed")
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 2L, 4L -> 0L, 5L -> 0L, 6L -> 1L)
  }
}
