package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Baskets, EventOps, Quality}

/** Round-4 wave-8 operators: snapshot reconciliation and time-weighted
  * averages. */
class R4gOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- snapshotDiff -------------------------------------------------------

  test("snapshotDiff: added/removed/changed/unchanged all classified") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val neu = Seq((1L, "a", 10.0),     // unchanged
      (2L, "B2", 20.0),                // changed
      (4L, "d", 40.0))                 // added; 3 removed
      .toDF("k", "name", "bal")
    val out = Quality.snapshotDiff(old, neu, Seq("k"), Seq("name", "bal"))
      .select($"k", $"change_type").as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added")
  }

  test("snapshotDiff: canonicalization is case-insensitive, NULL-safe") {
    val old = Seq((1L, Some("abc")), (2L, None: Option[String]))
      .toDF("k", "name")
    val neu = Seq((1L, Some("ABC")), (2L, Some("")))
      .toDF("k", "name")
    val out = Quality.snapshotDiff(old, neu, Seq("k"), Seq("name"))
      .select($"k", $"change_type").as[(Long, String)].collect().toMap
    // upper-case fold: abc == ABC; NULL canonicalizes to '' == empty
    out shouldBe Map(1L -> "unchanged", 2L -> "unchanged")
  }

  // ---- unpivot round-trip -------------------------------------------------

  test("unpivot is pivot's inverse: wide -> tall -> wide round-trips") {
    val wide = Seq((1L, 10.0, 0.5), (2L, 20.0, 0.7))
      .toDF("k", "qty", "disc")
    val tall = wide.unpivot(Array($"k"), Array($"qty", $"disc"),
      "measure", "value")
    tall.count() shouldBe 4L
    val back = tall.groupBy($"k").pivot("measure", Seq("qty", "disc"))
      .agg(first($"value"))
      .select($"k", $"qty", $"disc")
      .as[(Long, Double, Double)].collect().toSet
    back shouldBe wide.as[(Long, Double, Double)].collect().toSet
  }

  // ---- exactPercentiles / groupedMode -------------------------------------

  test("exactPercentiles: nearest-rank values per group") {
    val df = (1 to 100).map(i => ("A", i.toLong)) ++ Seq(("B", 7L))
    val out = Quality.exactPercentiles(df.toDF("g", "v"), Seq("g"), "v",
        Seq(0.5, 0.9, 0.99))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    out("A") shouldBe (("A", 100L, 50L, 90L, 99L))
    // singleton group: every percentile is the single value
    out("B") shouldBe (("B", 1L, 7L, 7L, 7L))
  }

  test("groupedMode: most frequent wins, ties break to the smaller value") {
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"),
      ("h", "z")).toDF("g", "v")
    val out = Quality.groupedMode(df, Seq("g"), "v")
      .as[(String, String, Long)].collect().toSet
    out shouldBe Set(("g", "a", 2L), ("h", "z", 1L))
  }

  test("groupedMode: rank cap stays below the exchange") {
    val df = Seq(("g", "a"), ("g", "b")).toDF("g", "v")
    Quality.groupedMode(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString should include("WindowGroupLimit")
  }

  // ---- coOccurrence -------------------------------------------------------

  test("coOccurrence: pair counts across groups, duplicates collapse") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"),   // dup item in one group: once
      (2L, "x"), (2L, "y"), (2L, "z"),
      (3L, "x")                           // singleton: no pairs
    ).toDF("g", "item")
    val out = Baskets.coOccurrence(df, "g", "item",
        maxItemsPerGroup = 10, topK = 10)
      .select($"item_a", $"item_b", $"n_groups")
      .as[(String, String, Long)].collect().toSet
    out shouldBe Set(("x", "y", 2L), ("x", "z", 1L), ("y", "z", 1L))
  }

  test("coOccurrence: over-cap groups are dropped entirely") {
    val big = (1 to 5).map(i => (1L, s"i$i"))
    val small = Seq((2L, "a"), (2L, "b"))
    val out = Baskets.coOccurrence((big ++ small).toDF("g", "item"),
        "g", "item", maxItemsPerGroup = 4, topK = 10)
      .select($"item_a", $"item_b").as[(String, String)].collect().toSet
    // group 1 exceeds the cap: none of its 10 pairs appear
    out shouldBe Set(("a", "b"))
  }

  // ---- timeWeightedAvg ----------------------------------------------------

  test("timeWeightedAvg: interval weighting, last observation dropped") {
    // value 10 held 60 s, value 40 held 180 s, value 99 has no interval
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, 10L, ts("2024-01-01 00:01:00"), 40.0),
      (3L, 10L, ts("2024-01-01 00:04:00"), 99.0)
    ).toDF("eid", "user", "ts", "v")
    val r = EventOps.timeWeightedAvg(ev, "user", "ts", "v", "eid")
      .as[(Long, Long, Long, Double)].collect().head
    r._2 shouldBe 2L                       // two closed intervals
    r._3 shouldBe 240L * 1000000L          // 4 minutes in micros
    r._4 shouldBe (10.0 * 60 + 40.0 * 180) / 240.0
  }

  test("timeWeightedAvg: single-observation keys emit no row") {
    val ev = Seq((1L, 10L, ts("2024-01-01 00:00:00"), 5.0))
      .toDF("eid", "user", "ts", "v")
    EventOps.timeWeightedAvg(ev, "user", "ts", "v", "eid")
      .count() shouldBe 0L
  }

  test("timeWeightedAvg: all-same-timestamp key yields NULL twa, no abort") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 5.0),
      (2L, 10L, ts("2024-01-01 00:00:00"), 9.0)
    ).toDF("eid", "user", "ts", "v")
    val r = EventOps.timeWeightedAvg(ev, "user", "ts", "v", "eid")
      .select($"total_dur_us", $"twa").as[(Long, Option[Double])]
      .collect().head
    r._1 shouldBe 0L
    r._2 shouldBe None
  }

  test("timeWeightedAvg differs from arithmetic mean under burst sampling") {
    // burst of cheap samples then one long expensive interval: the
    // arithmetic mean is dragged down by the burst, the TWA is not
    val ev = (0 until 10).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 00:00:0$i%d"), 1.0)) :+
      ((10L, 1L, ts("2024-01-01 00:00:10"), 100.0)) :+
      ((11L, 1L, ts("2024-01-01 01:00:10"), 0.0))
    val twa = EventOps.timeWeightedAvg(ev.toDF("eid", "user", "ts", "v"),
        "user", "ts", "v", "eid")
      .select($"twa").as[Double].collect().head
    val mean = ev.map(_._4).sum / ev.size
    twa should be > 90.0
    mean should be < 15.0
  }
}
