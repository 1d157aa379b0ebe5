package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TopK
import graft.streaming.StreamOps
import graft.streaming.StreamOps.ScoredRecord

/** Stream == batch parity for the grouped top-k maintenance twin:
  * after any prefix of batches, the max-version rows per key equal
  * `TopK.perGroup` (the custom physical operator) on the data seen so
  * far. */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** transformWithState needs the RocksDB provider (column families). */
  private def withRocksDb[T](body: => T): T = {
    val before = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally before match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private val batch1 = Seq(
    ScoredRecord("a", "a1", 5.0), ScoredRecord("a", "a2", 9.0),
    ScoredRecord("a", "a3", 1.0), ScoredRecord("a", "a4", 7.0),
    ScoredRecord("b", "b1", 2.0), ScoredRecord("b", "b2", 2.0))
  private val batch2 = Seq(
    ScoredRecord("a", "a5", 8.0),  // displaces a1 from a's top-3
    ScoredRecord("b", "b3", 1.0),  // below b's cut once b has 3
    ScoredRecord("c", "c1", 4.0))  // new key

  /** Current top-k per key = rows carrying each key's max version. */
  private def currentTopK(table: String) = {
    val rows = spark.table(table)
      .select("key", "id", "score", "rnk", "ver").collect()
    val maxVer = rows.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(4)).max }
    rows.filter(r => r.getLong(4) == maxVer(r.getString(0)))
      .map(r => Seq(r.get(0), r.get(1), r.get(2), r.get(3)).mkString("|"))
      .toSeq.sorted
  }

  private def batchTopK(data: Seq[ScoredRecord], k: Int) =
    TopK.perGroup(data.toDF, Seq(col("key")),
        Seq(col("score").desc, col("id")), k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("score").desc, col("id"))))
      .select("key", "id", "score", "rnk")
      .collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("stream state equals the batch operator after each batch prefix") { withRocksDb {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ScoredRecord]
    val out = StreamOps.topKStream(mem.toDS(), 3)
    val name = s"topk_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      currentTopK(name) shouldBe batchTopK(batch1, 3)

      mem.addData(batch2: _*)
      q.processAllAvailable()
      currentTopK(name) shouldBe batchTopK(batch1 ++ batch2, 3)
    } finally q.stop()
  }}

  test("stream == batch when the partial flush cap forces mid-partition flushes") { withRocksDb {
    // cap=1: the batch operator's partial pass can hold ONE group at a
    // time, flushing k-row heaps mid-partition; the stream splits the
    // same keys across two micro-batches. Both degradations must still
    // agree on the exact per-key top-k.
    val capKey = graft.plans.GroupedTopKExec.MaxGroupsConf
    spark.conf.set(capKey, "1")
    try {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[ScoredRecord]
      val out = StreamOps.topKStream(mem.toDS(), 3)
      val name = s"topk_capped_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        // interleaved keys so the cap=1 partial map flushes repeatedly
        val b1 = Seq(
          ScoredRecord("a", "a1", 5.0), ScoredRecord("b", "b1", 2.0),
          ScoredRecord("a", "a2", 9.0), ScoredRecord("b", "b2", 6.0),
          ScoredRecord("a", "a3", 1.0), ScoredRecord("b", "b3", 4.0),
          ScoredRecord("a", "a4", 7.0))
        // every key recurs across the batch split
        val b2 = Seq(
          ScoredRecord("b", "b4", 8.0), ScoredRecord("a", "a5", 8.0),
          ScoredRecord("b", "b5", 5.0), ScoredRecord("a", "a6", 2.0))
        mem.addData(b1: _*)
        q.processAllAvailable()
        currentTopK(name) shouldBe batchTopK(b1, 3)
        mem.addData(b2: _*)
        q.processAllAvailable()
        currentTopK(name) shouldBe batchTopK(b1 ++ b2, 3)
      } finally q.stop()
    } finally spark.conf.unset(capKey)
  }}

  test("unchanged keys emit nothing in later batches") { withRocksDb {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ScoredRecord]
    val out = StreamOps.topKStream(mem.toDS(), 2)
    val name = s"topk_quiet_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData(ScoredRecord("a", "a1", 5.0), ScoredRecord("a", "a2", 9.0))
      q.processAllAvailable()
      val afterB1 = spark.table(name).count()
      // b changes; a receives a row BELOW its current top-2 cut
      mem.addData(ScoredRecord("a", "a3", 0.5), ScoredRecord("b", "b1", 1.0))
      q.processAllAvailable()
      val rows = spark.table(name)
      rows.count() shouldBe afterB1 + 1           // only b's new singleton
      rows.filter(col("key") === "a").count() shouldBe afterB1
    } finally q.stop()
  }}

  test("ties at the boundary resolve by id, matching the batch order") { withRocksDb {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ScoredRecord]
    val data = Seq(ScoredRecord("t", "x2", 3.0), ScoredRecord("t", "x1", 3.0),
      ScoredRecord("t", "x3", 3.0))
    val out = StreamOps.topKStream(mem.toDS(), 2)
    val name = s"topk_ties_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      currentTopK(name) shouldBe batchTopK(data, 2)
      currentTopK(name).map(_.split('|')(1)) shouldBe Seq("x1", "x2")
    } finally q.stop()
  }}
}
