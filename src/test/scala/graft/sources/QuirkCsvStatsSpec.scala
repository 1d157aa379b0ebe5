package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.sources.EqualTo
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

/** `estimateStatistics` feeds the planner's broadcast/join decisions:
  * it must shrink with pruning and serve exact sidecar row counts when
  * nothing discriminates within files. */
class QuirkCsvStatsSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(opts: Map[String, String],
                     filters: Array[org.apache.spark.sql.sources.Filter])
  : QuirkCsvScan = {
    val m = new java.util.HashMap[String, String]()
    opts.foreach { case (k, v) => m.put(k, v) }
    val cis = new CaseInsensitiveStringMap(m)
    val schema = new QuirkCsvDataSource().inferSchema(cis)
    val sb = new QuirkCsvScanBuilder(schema, cis)
    if (filters.nonEmpty) sb.pushFilters(filters)
    sb.build().asInstanceOf[QuirkCsvScan]
  }

  test("stats shrink with zone pruning; row count served from fresh sidecars") {
    val dir = java.nio.file.Files.createTempDirectory("qcsv_stats").toString
    Seq("0001", "0002", "0003").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    Seq("0101", "0102").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val base = scanOf(Map("path" -> dir), Array.empty)
    val s0 = base.estimateStatistics()
    s0.numRows().getAsLong shouldBe 5L // exact, from the sidecar
    // a point filter zone-prunes to one file: size drops, and the row
    // count goes UNKNOWN (the filter discriminates within the file)
    val filtered = scanOf(Map("path" -> dir),
      Array(EqualTo("k", "0101")))
    val s1 = filtered.estimateStatistics()
    assert(s1.sizeInBytes().getAsLong < s0.sizeInBytes().getAsLong,
      "pushed-filter stats must reflect pruned files")
    s1.numRows().isPresent shouldBe false
    // a hand-dropped file without a sidecar entry: size known, rows not
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "hand.csv"), "k\r\n9999\r\n",
      java.nio.charset.StandardCharsets.ISO_8859_1)
    scanOf(Map("path" -> dir), Array.empty)
      .estimateStatistics().numRows().isPresent shouldBe false
  }

  test("metadata aggregate plans ONE synthetic partition at the scan " +
      "level (the final-RDD partition count would be vacuously 1)") {
    import org.apache.spark.sql.SaveMode
    val dir = java.nio.file.Files.createTempDirectory("qcsv_stats_m")
      .toString
    Seq("a", "b").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    Seq("c").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val m = new java.util.HashMap[String, String]()
    m.put("path", dir)
    val cis = new CaseInsensitiveStringMap(m)
    val schema = new QuirkCsvDataSource().inferSchema(cis)
    val scan = new QuirkCsvAggScan(schema, Array.empty,
      QuirkCsvAgg(Array.empty, Array(QuirkCsvCountStar), 100000), cis)
    val parts = scan.planInputPartitions()
    parts.length shouldBe 1 // 2 data files, zero splits
    parts(0) shouldBe a[QuirkCsvMetaAggPartition]
    parts(0).asInstanceOf[QuirkCsvMetaAggPartition]
      .values.toSeq shouldBe Seq(java.lang.Long.valueOf(3L))
    // with sidecars distrusted, the same scan falls back to real splits
    m.put("zoneMapPruning", "false")
    val scan2 = new QuirkCsvAggScan(schema, Array.empty,
      QuirkCsvAgg(Array.empty, Array(QuirkCsvCountStar), 100000),
      new CaseInsensitiveStringMap(m))
    scan2.planInputPartitions().foreach { p =>
      p should not be a[QuirkCsvMetaAggPartition]
    }
  }

  test("partitioned: a partition-column filter keeps the count exact " +
      "for the surviving dirs") {
    val root = java.nio.file.Files.createTempDirectory("qcsv_stats_p")
      .toString
    spark.conf.set("spark.sql.catalog.graft_st",
      classOf[QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_st.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_st.ns")
    spark.sql("""CREATE TABLE graft_st.ns.t (k STRING, p STRING)
      PARTITIONED BY (p)""")
    spark.sql("""INSERT INTO graft_st.ns.t VALUES
      ('a','x'), ('b','x'), ('c','y')""")
    val opts = Map("path" -> s"$root/ns/t", "partitionCol" -> "p")
    scanOf(opts, Array.empty).estimateStatistics()
      .numRows().getAsLong shouldBe 3L
    val oneDir = scanOf(opts, Array(EqualTo("p", "x")))
    oneDir.estimateStatistics().numRows().getAsLong shouldBe 2L
    // a data-column filter: unknown rows (within-file discrimination)
    scanOf(opts, Array(EqualTo("k", "a"))).estimateStatistics()
      .numRows().isPresent shouldBe false
  }

  test("pruned stats are LOAD-BEARING: the partition-filtered join side " +
      "broadcasts, the unfiltered twin shuffles") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("qcsv_stats_b")
      .toString
    spark.conf.set("spark.sql.catalog.graft_sb",
      classOf[QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sb.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sb.ns")
    spark.sql("""CREATE TABLE graft_sb.ns.t (k STRING, p STRING)
      PARTITIONED BY (p)""")
    // 4 same-sized partitions; threshold sits between one dir and total
    (0 until 4).foreach { i =>
      spark.range(200).selectExpr(
        s"CAST(id + ${i * 1000} AS STRING) AS k", s"'p$i' AS p")
        .writeTo("graft_sb.ns.t").append()
    }
    val dirs = new java.io.File(s"$root/ns/t").listFiles()
      .filter(_.isDirectory)
    def bytes(d: java.io.File): Long = d.listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_")).map(_.length()).sum
    val one = bytes(dirs.find(_.getName == "p=p0").get)
    val total = dirs.map(bytes).sum
    val threshold = (one + total) / 2
    def planOf(filtered: Boolean): String = {
      val probe = spark.table("graft_sb.ns.t")
        .select(col("k"), col("p").as("pp"))
      val dim0 = spark.table("graft_sb.ns.t")
      val dim = (if (filtered) dim0.filter(col("p") === "p0") else dim0)
        .select(col("k"), col("p").as("dp"))
      probe.join(dim, Seq("k")).queryExecution.executedPlan.toString
    }
    val priorT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val priorA = spark.conf.getOption("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        threshold.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      planOf(filtered = true) should include("BroadcastHashJoin")
      val twin = planOf(filtered = false)
      twin should include("SortMergeJoin")
      twin should not include "BroadcastHashJoin"
    } finally {
      priorT.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      priorA.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
        spark.conf.set("spark.sql.adaptive.enabled", _))
    }
  }
}
