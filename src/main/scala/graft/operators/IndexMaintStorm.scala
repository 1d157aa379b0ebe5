package graft.operators

import org.apache.spark.sql.SparkSession

/** Child-process body for the CROSS-PROCESS index-maintenance spec: a
  * full SparkSession in its own JVM (index maintenance is Spark work,
  * unlike the pure-FS [[graft.sources.VersionCommitStorm]]) that lands
  * `n` batches into a SHARED near-dup index. Maintenance is serialized
  * by [[IndexMaintenanceLock]]; a child that loses the claim RETRIES —
  * queueing politely is the contract, interleaving steps is the bug.
  *
  * args: root writerId nBatches
  *
  * Exit 0 iff every batch landed; `INDEXED <batch>` prints per success.
  * Doc ids/texts are a closed-form function of (writer, batch, j) so
  * the parent can rebuild the exact union corpus for the serial twin. */
object IndexMaintStorm {

  /** The deterministic corpus shared between children and the parent's
    * serial twin: 3 docs per (writer, batch), texts drawn from a small
    * pool so near-dup candidates cross writers and batches. */
  def docsFor(writer: Int, batch: Int): Seq[(Long, String)] = {
    val pool = Vector(
      "the quick brown fox jumps over the lazy dog again and again",
      "entirely different content about spark catalyst optimizers",
      "completely unrelated text concerning csv ingestion quirks",
      "the quick brown fox jumps over the lazy dog again today")
    (0 until 3).map { j =>
      val id = writer * 1000L + batch * 10L + j
      (id, pool((id % pool.size).toInt))
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(root, writerStr, nStr) = args
    val writer = writerStr.toInt
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-index-storm-w$writer")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft_ims",
        classOf[graft.sources.QuirkCsvCatalog].getName)
      .config("spark.sql.catalog.graft_ims.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      (1 to n).foreach { i =>
        val docs = docsFor(writer, i).toDF("doc_id", "text")
        val batch = s"w$writer-b$i"
        var landed = false
        var attempts = 0
        while (!landed) {
          try {
            NearDupIndex.indexBatch(spark, "graft_ims", "ns", "idx",
              docs, "doc_id", "text", batch)
            landed = true
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("maintenance already in progress") =>
              attempts += 1
              require(attempts < 600,
                s"starved on the maintenance lock for $batch")
              Thread.sleep(100)
          }
        }
        println(s"INDEXED $batch")
      }
    } finally spark.stop()
  }
}
