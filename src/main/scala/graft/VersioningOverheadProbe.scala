package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the cost of DEFAULT-ON table versioning (not part of
  * the driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.VersioningOverheadProbe <ordersParquet> <epochs>" }}}
  *
  * Twin partitioned catalog tables — versioned (default) vs
  * `TBLPROPERTIES('versioning'='false')` — take the same mutation
  * sequence: `epochs` appends, one partition-scoped dynamic overwrite,
  * one metadata DELETE of a partition. Per commit, versioning adds one
  * log-dir listing, one exclusive create, one tiny entry write, and
  * rename-instead-of-delete for retirements — all driver-side metadata
  * ops whose cost must stay invisible next to the write itself; this
  * probe is the evidence. */
object VersioningOverheadProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0)
      else "/root/testdata/sf0.1/orders.parquet"
    val epochs = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft_vop",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_vop.root",
      java.nio.file.Files.createTempDirectory("graft_vop").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_vop.ns")
    val src0 = spark.read.parquet(src).select(
      col("o_orderkey").cast("string").as("okey"),
      col("o_orderpriority").as("prio")).localCheckpoint()
    val n = src0.count()
    println(s"source: $n rows x $epochs epochs, + 1 dynamic overwrite " +
      "+ 1 metadata DELETE")

    def drive(table: String, props: String): Double = {
      spark.sql(s"""CREATE TABLE graft_vop.ns.$table
        (okey STRING, prio STRING) PARTITIONED BY (prio)$props""")
      val t0 = System.nanoTime
      (0 until epochs).foreach { i =>
        src0.filter(col("okey").cast("long") % epochs === i)
          .writeTo(s"graft_vop.ns.$table").append()
      }
      src0.filter(col("prio") === "1-URGENT" &&
          col("okey").cast("long") % 2 === 0)
        .writeTo(s"graft_vop.ns.$table").overwritePartitions()
      spark.sql(s"DELETE FROM graft_vop.ns.$table WHERE prio = '5-LOW'")
      (System.nanoTime - t0) / 1e9
    }
    // a full warmup pass of BOTH paths first — the measured pair then
    // runs under the same JIT/caches (a single-order run hands the
    // second table a warm-JVM discount either way)
    drive("warm_plain", " TBLPROPERTIES ('versioning'='false')")
    drive("warm_ver", "")
    val tPlain = drive("plain", " TBLPROPERTIES ('versioning'='false')")
    val tVer = drive("ver", "")
    println(f"unversioned: $tPlain%.1f s  versioned: $tVer%.1f s  " +
      f"overhead: ${(tVer / tPlain - 1) * 100}%.1f%%")
    val a = spark.table("graft_vop.ns.ver").orderBy("okey", "prio")
    val b = spark.table("graft_vop.ns.plain").orderBy("okey", "prio")
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "versioned and unversioned tables must hold identical rows")
    println("identical contents; history entries: " +
      graft.sources.QuirkCsvVersions.history(spark,
        spark.conf.get("spark.sql.catalog.graft_vop.root") + "/ns/ver")
        .count())
    spark.stop()
  }
}
