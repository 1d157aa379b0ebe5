package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Baskets, EventOps, Similarity}
import graft.streaming.StreamOps

class R6fOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- item similarity

  private val baskets = Seq(
    (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"),
    (4L, "x"), (5L, "y")
  ).toDF("basket", "item")

  test("itemSimilarity computes cooc/sqrt(na*nb) neighbor lists") {
    val got = Baskets.itemSimilarity(baskets, "basket", "item",
        maxItemsPerGroup = 10, k = 2)
      .collect().map(r => (r.getAs[String]("item"),
        r.getAs[String]("neighbor")) -> r).toMap
    // n_x=4, n_y=3, n_z=1; cooc(x,y)=2, cooc(x,z)=1
    val xy = got(("x", "y"))
    xy.getAs[Long]("cooc") shouldBe 2L
    xy.getAs[Double]("cosine") shouldBe 2.0 / math.sqrt(12.0)
    got(("x", "z")).getAs[Double]("cosine") shouldBe 1.0 / math.sqrt(4.0)
    // both directions present
    got.keySet should contain(("y", "x"))
    // x's rank-1 neighbor is the higher-cosine one
    val xRows = got.collect { case ((i, n), r) if i == "x" => (n, r.getAs[Int]("rank")) }
    xRows.toMap.apply("y") shouldBe 1
  }

  test("itemSimilarity respects the basket cap and k") {
    val wide = (1L to 3L).flatMap(b =>
      Seq("a", "b", "c", "d").map(i => (b, i))).toDF("basket", "item")
    // cap 3 drops every basket (4 items each) -> no pairs
    Baskets.itemSimilarity(wide, "basket", "item", 3, 5)
      .count() shouldBe 0L
    val got = Baskets.itemSimilarity(wide, "basket", "item", 10, 2)
    got.groupBy("item").count().select(max("count")).as[Long]
      .collect().head should be <= 2L
  }

  // -------------------------------------------- hard negatives

  test("hardNegatives returns only other-label matches, hardest first") {
    val embs = Seq(
      (1L, Seq(1f, 0f, 0f), 0),   // anchor
      (2L, Seq(0.9f, 0.4f, 0f), 0), // same label: excluded
      (3L, Seq(0.9f, 0.1f, 0f), 1), // hard negative
      (4L, Seq(0f, 1f, 0f), 1),     // easy negative
      (5L, Seq(0.7f, 0.2f, 0f), 2)  // another-label negative
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(embs, "vec_id", "embedding",
        "label", col("vec_id") === 1, k = 3)
      .orderBy("rank").collect()
    got.map(_.getAs[Long]("n_id")).toSeq shouldBe Seq(3L, 5L, 4L)
    got.map(_.getAs[Int]("n_label")).toSet should not contain 0
    got.head.getAs[Double]("q_cosine") should be >
      got.last.getAs[Double]("q_cosine")
  }

  test("hardNegatives excludes null labels and respects the broadcast guard") {
    val embs = Seq(
      (1L, Seq(1f, 0f), Some(0)), (2L, Seq(0.9f, 0.1f), None),
      (3L, Seq(0.8f, 0.2f), Some(1))
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(embs, "vec_id", "embedding",
      "label", col("vec_id") === 1, k = 5).collect()
    got.map(_.getAs[Long]("n_id")).toSeq shouldBe Seq(3L)
  }

  // -------------------------------------------- streaming lateness twin

  test("latenessStream == batch latenessPerEvent across batch splits") {
    implicit val sc = spark.sqlContext
    val t0 = 1700000000000000L
    val all = Seq( // (key, seq, us) — arrival order = seq order
      ("u1", "a01", t0), ("u1", "a02", t0 + 10000000L),
      ("u1", "a03", t0 + 5000000L), ("u2", "a04", t0),
      ("u1", "a05", t0 + 20000000L), ("u1", "a06", t0 - 70000000L),
      ("u2", "a07", t0 + 1000000L))
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.TimedEvent]
      val q = StreamOps.latenessStream(mem.toDS())
        .writeStream.format("memory").queryName("lateness_stream")
        .outputMode("append").start()
      // split respecting arrival order: 3 events, then the rest
      mem.addData(all.take(3).map(StreamOps.TimedEvent.tupled): _*)
      q.processAllAvailable()
      mem.addData(all.drop(3).map(StreamOps.TimedEvent.tupled): _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("lateness_stream")
        .select("key", "seq", "lateUs")
        .as[(String, String, Long)].collect().toSet
      val batch = EventOps.latenessPerEvent(
          all.toDF("k", "s", "us")
            .withColumn("ts", timestamp_micros(col("us"))),
          col("k"), col("ts"), col("s"))
        .select("key", "seq", "late_us")
        .as[(String, String, Long)].collect().toSet
      streamed shouldBe batch
      // the out-of-order events carry the expected lateness
      streamed should contain(("u1", "a03", 5000000L))
      streamed should contain(("u1", "a06", 90000000L))
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
