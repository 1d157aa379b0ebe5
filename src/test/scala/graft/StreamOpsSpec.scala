package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.StreamOps

/** Streaming specs: every windowed result must equal its batch analogue on
  * the same data (shared epoch-aligned grid), per SURVEY §2.10. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val data = Seq(
    ("u1", ts("2024-01-01 00:05:00"), 10.0),
    ("u1", ts("2024-01-01 00:20:00"), 20.0),
    ("u1", ts("2024-01-01 01:10:00"), 30.0),
    ("u2", ts("2024-01-01 00:59:59"), 40.0))

  private def runStream(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: String = "complete"): org.apache.spark.sql.DataFrame = {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    mem.addData(data: _*)
    val out = build(mem.toDF.toDF("user_id", "ts", "value"))
    val name = s"stream_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("dedupWithinWatermark: in-watermark duplicates dropped across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val out = StreamOps.dedupWithinWatermark(
      mem.toDF.toDF("key", "ts"), "ts", "10 minutes", Seq("key"))
    val name = s"dedup_wm_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    mem.addData(("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 00:01:00")), // same-batch dup
      ("b", ts("2024-01-01 00:02:00")))
    q.processAllAvailable()
    mem.addData(("a", ts("2024-01-01 00:03:00")), // cross-batch dup, in wm
      ("c", ts("2024-01-01 00:04:00")))
    q.processAllAvailable()
    q.stop()
    val keys = spark.table(name).select($"key").as[String]
      .collect().sorted.toList
    keys shouldBe List("a", "b", "c") // each key exactly once
    // parity with the all-time batch dedup on the same fixture
    keys shouldBe Seq(("a"), ("a"), ("b"), ("a"), ("c"))
      .toDF("key").dropDuplicates("key")
      .as[String].collect().sorted.toList
  }

  test("streaming tumbling agg equals batch EventOps on the same grid") {
    val streamed = runStream(df => StreamOps.tumblingAgg(df, "ts", 3600,
      "10 minutes", Seq($"user_id"),
      Seq(count(lit(1)).as("n"), sum($"value").as("sv"))))
    val batch = EventOps.tumblingAgg(data.toDF("user_id", "ts", "value"),
      $"ts", 3600, Seq($"user_id"),
      Seq(count(lit(1)).as("n"), sum($"value").as("sv")))
    streamed.except(batch).count() shouldBe 0
    batch.except(streamed).count() shouldBe 0
  }

  test("streaming sliding agg equals batch EventOps on the same grid") {
    val streamed = runStream(df => StreamOps.slidingAgg(df, "ts", 600, 300,
      "10 minutes", Seq($"user_id"), Seq(count(lit(1)).as("n"))))
    val batch = EventOps.slidingAgg(data.toDF("user_id", "ts", "value"),
      $"ts", 600, 300, Seq($"user_id"), Seq(count(lit(1)).as("n")))
    streamed.except(batch).count() shouldBe 0
    batch.except(streamed).count() shouldBe 0
  }

  test("tumbling agg supports APPEND mode: watermark survives the grouping " +
    "and finalized windows are emitted") {
    // grouping by window(...).getField("start") used to strip the event-time
    // watermark from the key — append mode failed analysis and update-mode
    // state was never evicted
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val out = StreamOps.tumblingAgg(mem.toDF.toDF("user_id", "ts", "value"),
      "ts", 3600, "10 minutes", Seq($"user_id"),
      Seq(count(lit(1)).as("n")))
    val q = out.writeStream.format("memory").queryName("tumble_append")
      .outputMode("append").start() // throws here without the watermark
    mem.addData(data: _*)
    q.processAllAvailable() // watermark -> 01:00 (max ts 01:10 - 10 min)
    // a later event pushes the watermark past the hour-0 windows
    mem.addData(("u9", ts("2024-01-01 05:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("tumble_append")
      .select($"user_id", $"n").as[(String, Long)].collect().toSet
    // the hour-0 windows (ends <= watermark) are finalized and emitted
    emitted should contain allOf (("u1", 2L), ("u2", 1L))
  }

  test("streaming session windows match the batch sessionization rollup") {
    val streamed = runStream(df => StreamOps.sessionAgg(df, "ts", 1800,
      "1 hour", Seq($"user_id"), Seq(count(lit(1)).as("n"))))
    // u1: events at 00:05 and 00:20 in one session; 01:10 in another
    streamed.count() shouldBe 3
    streamed.filter($"user_id" === "u1" && $"n" === 2).count() shouldBe 1
    val batch = EventOps.sessionize(data.toDF("user_id", "ts", "value"),
        $"user_id", $"ts", $"value", 1800)
      .groupBy("user_id", "session_id").count()
    batch.count() shouldBe 3
  }

  test("flatMapGroupsWithState running stats accumulate per key") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamOps.KeyedEvent]
    mem.addData(data.map(t => StreamOps.KeyedEvent(t._1, t._2, t._3)): _*)
    val q = StreamOps.runningStats(mem.toDS())
      .writeStream.format("memory").queryName("running_stats")
      .outputMode("update").start()
    q.processAllAvailable()
    // second batch: state carries over
    mem.addData(StreamOps.KeyedEvent("u1", ts("2024-01-01 02:00:00"), 5.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("running_stats")
      .filter($"key" === "u1").orderBy($"count".desc).collect().head
    last.getAs[Long]("count") shouldBe 4
    last.getAs[Double]("sum") shouldBe 65.0 +- 1e-9
    last.getAs[Double]("max") shouldBe 30.0 +- 1e-9
  }

  test("transformWithState dedup emits only the first record per key") {
    implicit val sc = spark.sqlContext
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[StreamOps.KeyedRecord]
      val q = StreamOps.dedupFirstSeen(mem.toDS())
        .writeStream.format("memory").queryName("tws_dedup")
        .outputMode("append").start()
      mem.addData(StreamOps.KeyedRecord("a", "first"),
        StreamOps.KeyedRecord("a", "dup-same-batch"),
        StreamOps.KeyedRecord("b", "first"))
      q.processAllAvailable()
      mem.addData(StreamOps.KeyedRecord("a", "dup-later-batch"),
        StreamOps.KeyedRecord("c", "first"))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_dedup")
        .as[StreamOps.KeyedRecord].collect().sortBy(_.key)
      rows.map(r => (r.key, r.payload)).toSeq shouldBe
        Seq(("a", "first"), ("b", "first"), ("c", "first"))
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incrementalLoad foreachBatch processes a file backlog and stops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val ckpt = s"$dir/ckpt"
    val src = s"$dir/in"
    new java.io.File(src).mkdirs()
    data.toDF("user_id", "ts", "value").write.parquet(s"$src/batch0")

    val schema = data.toDF("user_id", "ts", "value").schema
    val stream = spark.readStream.schema(schema).parquet(s"$src/*")
    var seen = 0L
    val q = StreamOps.incrementalLoad(stream, ckpt) { (df, _) =>
      seen += df.count()
    }
    q.awaitTermination(60000)
    seen shouldBe 4
  }

  test("maintainLogBucketSketch: two-batch maintained sketch == " +
    "from-scratch batch sketch, quantiles agree") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    val (in, store, ckpt) = (s"$root/in", s"$root/store", s"$root/ckpt")
    val b1 = (1L to 400L).map(v => ("g", v))
    val b2 = (300L to 1000L).map(v => ("g", v))
    val schema = b1.toDF("g", "v").schema
    def run(): Unit = StreamOps.maintainLogBucketSketch(spark, in, schema,
      store, ckpt, Seq("g"), "v", subBuckets = 16)
    b1.toDF("g", "v").write.mode("append").parquet(in); run()
    b2.toDF("g", "v").write.mode("append").parquet(in); run()
    val S = graft.operators.Stats
    val maintained = spark.read.parquet(store)
    val scratch = S.logBucketSketch((b1 ++ b2).toDF("g", "v"), Seq("g"), "v")
    maintained.collect().map(_.toSeq).toSet shouldBe
      scratch.collect().map(_.toSeq).toSet
    val qm = S.logBucketQuantilesFromSketch(maintained, Seq("g"), 16,
      Seq(0.5, 0.99)).collect().map(_.toSeq).toSet
    val qs = S.logBucketQuantiles((b1 ++ b2).toDF("g", "v"), Seq("g"), "v",
      16, Seq(0.5, 0.99)).collect().map(_.toSeq).toSet
    qm shouldBe qs
  }

  test("burstDedupStream == batch burstDedup on an in-order feed, " +
    "across batch boundaries") {
    val before = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // k1: 0s, 50s, 110s chain one burst (gap 60s); 300s starts a new
      // one — and the 300s event arrives in a LATER micro-batch, so the
      // state handoff is exercised; k2: independent key
      def ev(k: String, seq: String, sec: Long) =
        StreamOps.TimedEvent(k, seq, sec * 1000000L)
      val b1 = Seq(ev("k1", "e1", 0), ev("k1", "e2", 50),
        ev("k1", "e3", 110), ev("k2", "f1", 10))
      val b2 = Seq(ev("k1", "e4", 300), ev("k2", "f2", 500))
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[StreamOps.TimedEvent]
      val q = StreamOps.burstDedupStream(mem.toDS(), gapSec = 60)
        .writeStream.format("memory").queryName("tws_burst")
        .outputMode("append").start()
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      q.stop()
      val streamed = spark.table("tws_burst")
        .as[StreamOps.TimedEvent].collect().map(e => (e.key, e.seq)).toSet
      streamed shouldBe Set(("k1", "e1"), ("k1", "e4"), ("k2", "f1"),
        ("k2", "f2"))
      // batch parity on the same rows
      val all = (b1 ++ b2)
        .map(e => (e.key, new Timestamp(e.us / 1000L), e.seq))
        .toDF("k", "ts", "seq")
      val batch = graft.operators.EventOps.burstDedup(all, Seq("k"),
          "ts", "seq", gapSec = 60)
        .select("k", "seq").as[(String, String)].collect().toSet
      batch shouldBe streamed
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
