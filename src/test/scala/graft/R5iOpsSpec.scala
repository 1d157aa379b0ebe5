package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Scale, Windows}

/** Round-5 wave-9 operators: CUSUM, nested serving export, cadence
  * profile. */
class R5iOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- cusum --------------------------------------------------------------

  test("cusum matches the sequential recurrence") {
    // x - target: +5, -10, +3, +4  ->  S: 5, 0, 3, 7
    val df = Seq(("k", 1, 15L), ("k", 2, 0L), ("k", 3, 13L), ("k", 4, 14L))
      .toDF("key", "t", "x")
    val out = Windows.cusum(df, Seq("key"), "t", col("x"), lit(10L), lit(6L))
      .orderBy("t").collect()
      .map(r => (r.getLong(3), r.getBoolean(4)))
    out shouldBe Array((5L, false), (0L, false), (3L, false), (7L, true))
  }

  test("cusum resets after a dip and keys are independent") {
    def series(key: String, xs: Seq[Long]) =
      xs.zipWithIndex.map { case (x, i) => (key, i, x) }
    val df = (series("a", Seq(20L, 0L, 0L, 25L)) ++
      series("b", Seq(10L, 10L, 10L, 10L)))
      .toDF("key", "t", "x")
    val out = Windows.cusum(df, Seq("key"), "t", col("x"), lit(10L),
      lit(100L))
      .orderBy("key", "t").collect().map(_.getLong(3))
    // a: 10, 0, 0, 15 (the dip swallows the first surge); b: flat 0
    out shouldBe Array(10L, 0L, 0L, 15L, 0L, 0L, 0L, 0L)
  }

  // ---- nestedChildren -----------------------------------------------------

  private val parents = Seq((1L, "x"), (2L, "y"), (3L, "z"))
    .toDF("id", "tag")
  private val children = Seq(
    (1L, 2, "b"), (1L, 1, "a"), (1L, 3, "c"), (2L, 1, "solo"))
    .toDF("id", "seq", "name")

  test("nestedChildren sorts items and empties childless parents") {
    val out = Scale.nestedChildren(parents, children, "id",
      Seq("seq", "name"))
      .orderBy("id").collect()
    out.map(_.getInt(3)) shouldBe Array(3, 1, 0)
    val items1 = out(0).getSeq[org.apache.spark.sql.Row](2)
    items1.map(_.getString(1)) shouldBe Seq("a", "b", "c")
    out(2).getSeq[org.apache.spark.sql.Row](2) shouldBe empty
  }

  test("nestedChildren ordering is input-order independent") {
    val shuffled = children.orderBy(col("name").desc)
    val a = Scale.nestedChildren(parents, children, "id", Seq("seq", "name"))
      .select("id", "items").orderBy("id").collect().map(_.toString)
    val b = Scale.nestedChildren(parents, shuffled, "id", Seq("seq", "name"))
      .select("id", "items").orderBy("id").collect().map(_.toString)
    a shouldBe b
  }

  // ---- cadenceProfile -----------------------------------------------------

  private def t(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision

  test("cadenceProfile computes gaps, median, burst fraction") {
    // user u: events at 0s, 0.5s, 1.0s, 11.0s -> gaps 0.5s, 0.5s, 10s
    // median (rank ceil(1.5)=2 of sorted 0.5,0.5,10) = 0.5s
    // bursts (<1s): 2/3
    val events = Seq(
      ("u", t(0L)), ("u", t(500000L)), ("u", t(1000000L)),
      ("u", t(11000000L)))
      .toDF("user_id", "ts")
    val r = EventOps.cadenceProfile(events, "user_id", "ts",
      minEvents = 3, burstFracThreshold = 0.5).collect()(0)
    r.getLong(1) shouldBe 4L              // n_events
    r.getLong(3) shouldBe 3L              // n_gaps
    r.getLong(4) shouldBe 500000L         // median_gap_us
    r.getDouble(5) shouldBe (2.0 / 3) +- 1e-12
    r.getBoolean(6) shouldBe true         // 0.667 > 0.5, 4 >= 3
  }

  test("cadenceProfile: single-event users get NULL gap stats, not bot") {
    val events = Seq(("a", t(0L)), ("b", t(0L)), ("b", t(100L)))
      .toDF("user_id", "ts")
    val out = EventOps.cadenceProfile(events, "user_id", "ts")
      .orderBy("user").collect()
    out(0).isNullAt(3) shouldBe true
    out(0).isNullAt(4) shouldBe true
    out(0).getBoolean(6) shouldBe false
    out(1).getLong(3) shouldBe 1L
  }

  test("cadenceProfile: tied timestamps yield deterministic gap stats") {
    val events = Seq(("u", t(0L)), ("u", t(0L)), ("u", t(2000000L)))
      .toDF("user_id", "ts")
    val r = EventOps.cadenceProfile(events, "user_id", "ts").collect()(0)
    r.getLong(3) shouldBe 2L       // gaps 0 and 2s regardless of tie order
    r.getLong(4) shouldBe 0L       // median = rank-1 value = 0
  }
}
