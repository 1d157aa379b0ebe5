package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for parallel per-partition compaction (not part of the
  * driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.CompactFanoutProbe <nPartitions> <rowsPerPart>" }}}
  *
  * system.compact on a partitioned table folds each value directory as
  * one small Spark job. Issuing those jobs serially leaves the cluster
  * idle between them — the per-job latency (planning + task dispatch)
  * dominates when dirs are many and small, exactly the maintenance
  * shape of a heavily-partitioned 100-TB table. This probe builds the
  * same multi-epoch partitioned fixture twice and measures
  * [[graft.sources.QuirkCsvMaintenance.compactValueDirs]] at
  * parallelism 1 (the old serial loop) vs the bounded pool default,
  * asserting identical table content both ways. The speedup is the
  * measured claim behind the procedure's pool. */
object CompactFanoutProbe {
  def main(args: Array[String]): Unit = {
    val nParts = if (args.length > 0) args(0).toInt else 120
    val rowsPer = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft_cfp",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_cfp").toString
    spark.conf.set("spark.sql.catalog.graft_cfp.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cfp.ns")

    def build(t: String): Seq[String] = {
      spark.sql(s"CREATE TABLE graft_cfp.ns.$t (k STRING, b STRING) " +
        "PARTITIONED BY (b)")
      val src = spark.range(0, nParts.toLong * rowsPer).select(
        col("id").cast("string").as("k"),
        (col("id") % nParts).cast("string").as("b"),
        ((col("id") / nParts).cast("long") % 3).as("epoch"))
      (0 until 3).foreach { e =>
        src.filter(col("epoch") === e).drop("epoch")
          .writeTo(s"graft_cfp.ns.$t").append()
      }
      new java.io.File(s"$root/ns/$t").listFiles()
        .filter(d => d.isDirectory && !d.getName.startsWith("_"))
        .map(_.toString).sorted.toSeq
    }

    val serialDirs = build("ser")
    var t0 = System.nanoTime
    val (sb, sa) = graft.sources.QuirkCsvMaintenance.compactValueDirs(
      spark, serialDirs, numFiles = 1, parallelism = 1)
    val serialSec = (System.nanoTime - t0) / 1e9
    println(f"serial:   $nParts dirs, $sb -> $sa files, $serialSec%.1f s")

    val poolDirs = build("par")
    t0 = System.nanoTime
    val (pb, pa) = graft.sources.QuirkCsvMaintenance.compactValueDirs(
      spark, poolDirs, numFiles = 1)
    val poolSec = (System.nanoTime - t0) / 1e9
    println(f"parallel: $nParts dirs, $pb -> $pa files, $poolSec%.1f s " +
      f"(${serialSec / poolSec}%.1fx)")

    val ser = spark.table("graft_cfp.ns.ser").orderBy("k")
    val par = spark.table("graft_cfp.ns.par").orderBy("k")
    require(ser.exceptAll(par).isEmpty && par.exceptAll(ser).isEmpty,
      "serial and parallel compaction must leave identical content")
    println("content identical: OK")
    spark.stop()
  }
}
