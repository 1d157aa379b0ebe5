package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the persisted MinHash-LSH near-dup index at data
  * volume (not part of the driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.NearDupIndexProbe <documentsParquet> <newPct>" }}}
  *
  * The daily question of a training-data pipeline: "which of today's
  * documents near-duplicate anything we already hold?" Measures the
  * incremental answer off the maintained catalog index
  * ([[operators.NearDupIndex.indexBatch]] +
  * [[operators.NearDupIndex.candidatePairsFor]] — band ONLY the new
  * batch, join against the persisted bands) against the from-scratch
  * twin ([[operators.NearDup.minHashLshCandidates]] over the union
  * corpus, filtered to pairs touching the batch). Equality is asserted
  * (both exceptAll directions); the scale claim measured, not guessed:
  * the incremental path re-shingles/re-hashes only `newPct` of the
  * corpus, so its cost should approach the banding cost of the batch
  * plus the band-table join, independent of how much history the full
  * twin would recompute. */
object NearDupIndexProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0)
      else "/root/testdata/sf0.1/documents.parquet"
    val newPct = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft_ndp",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ndp.root",
      java.nio.file.Files.createTempDirectory("graft_ndp").toString)
    val docs = spark.read.parquet(src).select(col("doc_id"), col("text"))
    val isNew = col("doc_id") % 100 < newPct
    val nAll = docs.count()
    val nNew = docs.filter(isNew).count()
    println(s"corpus=$nAll docs, new batch=$nNew (${newPct}%)")

    // one-time: the historical corpus is banded into the index
    var t0 = System.nanoTime
    graft.operators.NearDupIndex.build(spark, "graft_ndp", "p", "nd",
      docs.filter(!isNew), "doc_id", "text")
    println(f"base index build (one-time): ${(System.nanoTime - t0) / 1e9}%.1f s")

    // the daily increment: band the batch, join the persisted bands
    t0 = System.nanoTime
    graft.operators.NearDupIndex.indexBatch(spark, "graft_ndp", "p", "nd",
      docs.filter(isNew), "doc_id", "text", "day1")
    val tIndex = (System.nanoTime - t0) / 1e9
    t0 = System.nanoTime
    val served = graft.operators.NearDupIndex.candidatePairsFor(spark,
      "graft_ndp", "p", "nd", "day1").localCheckpoint()
    val nPairs = served.count()
    val tServe = (System.nanoTime - t0) / 1e9
    println(f"incremental: band batch $tIndex%.1f s + pair vs corpus " +
      f"$tServe%.1f s = ${tIndex + tServe}%.1f s ($nPairs pairs)")

    // the from-scratch twin: re-shingle/re-hash/re-pair EVERYTHING
    t0 = System.nanoTime
    val docsStr = docs.select(col("doc_id").cast("string").as("doc_id"),
      col("text"))
    val full = graft.operators.NearDup.minHashLshCandidates(docsStr,
        "doc_id", "text")
      .filter(col("a_id").cast("long") % 100 < newPct ||
        col("b_id").cast("long") % 100 < newPct)
      .localCheckpoint()
    val nFull = full.count()
    val tFull = (System.nanoTime - t0) / 1e9
    println(f"from-scratch twin: $tFull%.1f s ($nFull pairs)")
    require(served.exceptAll(full).isEmpty && full.exceptAll(served).isEmpty,
      "incremental and from-scratch answers must be identical")
    println(f"identical answers; incremental speedup: " +
      f"${tFull / (tIndex + tServe)}%.1fx")
    spark.stop()
  }
}
