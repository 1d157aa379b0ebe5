package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Retrieval}

class R6iOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- position attribution

  private def ev(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))

  test("U-shaped credit: 40/20/40 split, exact 2^30-scaled sums") {
    val S = 1073741824L
    val events = ev(Seq(
      (1L, 1L, "view", 1000000L),   // first touch
      (1L, 2L, "click", 2000000L),  // middle
      (1L, 3L, "view", 3000000L),   // middle
      (1L, 4L, "click", 4000000L),  // last touch
      (1L, 5L, "purchase", 5000000L)))
    val got = EventOps.positionBasedAttribution(events, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("view", "click"), "purchase", windowSec = 3600)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    val endCap = (2L * S) / 5L
    val mid = (S - 2 * endCap) / 2L
    // view: first (endCap) + one middle; click: one middle + last (endCap)
    got("view").getAs[Double]("credit") shouldBe
      ((endCap + mid).toDouble / S)
    got("click").getAs[Double]("credit") shouldBe
      ((endCap + mid).toDouble / S)
    got("view").getAs[Long]("n_conversions") shouldBe 1L
  }

  test("singleton and pair paths take full and half credit") {
    val events = ev(Seq(
      (1L, 1L, "view", 1000000L), (1L, 2L, "purchase", 2000000L),
      (2L, 3L, "view", 1000000L), (2L, 4L, "click", 1500000L),
      (2L, 5L, "purchase", 2000000L)))
    val got = EventOps.positionBasedAttribution(events, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("view", "click"), "purchase", windowSec = 3600)
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Double]("credit")).toMap
    got("view") shouldBe 1.5 // 1.0 (singleton) + 0.5 (pair first)
    got("click") shouldBe 0.5
  }

  test("touches outside the window or after the conversion earn nothing") {
    val events = ev(Seq(
      (1L, 1L, "view", 0L),                 // outside window
      (1L, 2L, "click", 7199000000L),       // inside
      (1L, 3L, "purchase", 7200000000L),
      (1L, 4L, "view", 7300000000L)))       // after conversion
    val got = EventOps.positionBasedAttribution(events, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("view", "click"), "purchase", windowSec = 3600)
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Double]("credit")).toMap
    got.get("view") shouldBe None
    got("click") shouldBe 1.0
  }

  // -------------------------------------------- PMI collocations

  test("pmiCollocations ranks tight pairs above common-word pairs") {
    // "neural network" always together; "the data" both frequent apart
    val base = "the data goes here and the data comes there okay fine "
    val docs = (1L to 10L).map(i =>
      (i, base + "neural network " + base)).toDF("doc_id", "text")
    val got = Retrieval.pmiCollocations(docs, "doc_id", "text",
      minTermLen = 3, minPair = 5, k = 10).collect()
    val top = got.head
    (top.getAs[String]("w1"), top.getAs[String]("w2")) shouldBe
      (("neural", "network"))
    // exact ratio: N * c(ab) / (c(a)c(b)) with c(neural)=c(network)=10
    val n = got.head.getAs[Double]("pmi_ratio")
    val expectedN = got.map(_.getAs[Long]("c_pair")).sum // not N; sanity only
    n should be > 1.0
    got.map(_.getAs[Int]("rank")).toSeq shouldBe (1 to got.length)
  }

  test("pmiCollocations honors the pair-frequency guard") {
    val docs = Seq((1L, "rare pairx only once here today"),
      (2L, "more words that are common common")).toDF("doc_id", "text")
    Retrieval.pmiCollocations(docs, "doc_id", "text",
      minTermLen = 3, minPair = 2, k = 10).count() shouldBe 0L
  }
}
