package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the NearDupIndex SERVE plans (the frames the registry queries
  * localCheckpoint away) to files — the plan evidence for the stored
  * per-version saturation audit: before the audit tier, every serve
  * planned a counting HashAggregate over the band-table scan beneath
  * its hot-band anti-join; after it, the exclusion list comes off the
  * tiny `_hot` sidecar (or disappears entirely for an audited-clean
  * version).
  *
  * Usage: `runMain graft.ServePlanDump <outDir> <suffix>` */
object ServePlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ServePlanDump <outDir> <suffix>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graft_spd",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_spd.root",
      java.nio.file.Files.createTempDirectory("graft_spd").toString)
    val docs = (0 until 40).map(i =>
      (s"d$i", if (i % 7 == 0) "the quick brown fox jumps over the lazy dog"
        else s"document number $i with its own words and content $i"))
      .toDF("doc_id", "text")
    // cap 3: the 6 identical docs saturate their buckets, so the serve
    // carries a real exclusion branch in both worlds
    graft.operators.NearDupIndex.build(spark, "graft_spd", "ns", "sp",
      docs, "doc_id", "text", shingleN = 3, numHashes = 12, bandSize = 3,
      maxBucket = 3)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[serveplandump] wrote $name")
    }
    dump("neardup_serve",
      graft.operators.NearDupIndex.allCandidatePairs(
        spark, "graft_spd", "ns", "sp"))
    dump("neardup_audit",
      graft.operators.NearDupIndex.saturationAudit(
        spark, "graft_spd", "ns", "sp"))
    spark.stop()
  }
}
