package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Geo

/** Streaming twin for the geo family: per-cell density computed over a
  * stream must equal the batch [[Geo.cellDensity]] on the same points —
  * the stream==batch discipline (SURVEY §2.10) extended to the round-7
  * spatial operators. The density aggregation is a plain keyed
  * aggregate, so it runs unchanged under `complete` output mode with no
  * watermark: what the batch scan groups once, the stream folds
  * incrementally into the same cells.
  */
class GeoStreamSpec extends SparkSpec {
  import spark.implicits._

  private val points = (1 to 200).map(i =>
    (i.toLong, (i * 397L) % 18000, (i * 811L) % 36000, (i % 7).toDouble))

  private def runStream(build: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    mem.addData(points: _*)
    val out = build(mem.toDF.toDF("k", "latC0", "lonC0", "m"))
    val name = s"geo_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("streaming cell density equals the batch operator on the same " +
    "points, including across incremental batches") {
    val batch = Geo.cellDensity(
      points.toDF("k", "latC0", "lonC0", "m"), col("m"), 1000)
    val streamed = runStream(df => Geo.cellDensity(df, col("m"), 1000))
    rowsAsStrings(streamed) shouldBe rowsAsStrings(batch)
    streamed.count() should be > 10L
  }

  test("late-added points fold into existing cells, not new duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val (first, second) = points.splitAt(100)
    mem.addData(first: _*)
    val out = Geo.cellDensity(
      mem.toDF.toDF("k", "latC0", "lonC0", "m"), col("m"), 1000)
    val name = s"geo_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table(name)
    val batch = Geo.cellDensity(
      points.toDF("k", "latC0", "lonC0", "m"), col("m"), 1000)
    rowsAsStrings(streamed) shouldBe rowsAsStrings(batch)
  }
}
