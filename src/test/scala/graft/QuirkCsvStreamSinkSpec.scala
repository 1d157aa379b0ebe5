package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The graftcsv STREAMING sink: append-only epochs through the same
  * writers as batch, epoch-keyed file names (idempotent replay), and
  * zone-map sidecar entries merged per epoch so streamed files prune
  * exactly like batch-written ones. */
class QuirkCsvStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writeStream -> graftcsv -> batch read back, sidecar maintained") {
    val dir = java.nio.file.Files.createTempDirectory("csv_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("csv_ckpt").toString
    val in = MemoryStream[(String, String)](spark)
    val q = in.toDF().toDF("k", "v")
      .writeStream.format("graftcsv")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      in.addData(("a", "West"), ("b", "East"))
      q.processAllAvailable()
      in.addData(("c", "West"), ("d", null: String))
      q.processAllAvailable()
    } finally q.stop()

    val back = spark.read.format("graftcsv").load(dir)
    back.count() shouldBe 4
    back.filter(col("v").isNull).count() shouldBe 1
    // the sidecar covers the streamed files: an equality filter prunes
    // epoch files whose [min,max] excludes the probe
    new java.io.File(dir, "_graft_zonemap.tsv").exists() shouldBe true
    val nFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".csv"))
    val miss = spark.read.format("graftcsv").load(dir)
      .filter(col("v") === "Nowhere")
    miss.rdd.getNumPartitions should be < nFiles
    miss.count() shouldBe 0
  }

  test("streaming into a PARTITIONED catalog table routes epochs into " +
      "value dirs with per-dir sidecars") {
    val root = java.nio.file.Files.createTempDirectory("csv_psink").toString
    spark.conf.set("spark.sql.catalog.graft_ss",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ss.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ss.ns")
    spark.sql("""CREATE TABLE graft_ss.ns.ev (k STRING, day STRING)
      PARTITIONED BY (day)""")
    val ckpt = java.nio.file.Files.createTempDirectory("csv_pck").toString
    val in = MemoryStream[(String, String)](spark)
    val q = in.toDF().toDF("k", "day")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").toTable("graft_ss.ns.ev")
    try {
      in.addData(("a", "d1"), ("b", "d2"))
      q.processAllAvailable()
      in.addData(("c", "d1"), ("d", "d3")) // existing + NEW partition
      q.processAllAvailable()
    } finally q.stop()
    // routed layout: epoch files under value dirs, nothing at the root
    val subs = new java.io.File(s"$root/ns/ev").listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
      .map(_.getName).sorted
    subs.toSeq shouldBe Seq("day=d1", "day=d2", "day=d3")
    val back = spark.table("graft_ss.ns.ev")
    back.count() shouldBe 4
    rowsAsStrings(back.filter(col("day") === "d1").select("k")) shouldBe
      Seq("a", "c")
    // partition pruning works on the streamed layout
    back.filter(col("day") === "d3").rdd.getNumPartitions shouldBe 1
    // the streamed files carry per-dir zone sidecars like batch writes
    new java.io.File(s"$root/ns/ev/day=d1/_graft_zonemap.tsv")
      .exists() shouldBe true
    // value subdirs are the compaction unit for streamed epochs too
    graft.operators.Scale.compactCsv(spark, s"$root/ns/ev/day=d1", 1)
    spark.table("graft_ss.ns.ev").count() shouldBe 4
    rowsAsStrings(spark.table("graft_ss.ns.ev")
      .filter(col("day") === "d1").select("k")) shouldBe Seq("a", "c")
  }

  test("a second query into the same directory appends, never clobbers") {
    // regression: epoch ids restart at 0 for every query — without the
    // checkpoint-stable queryId in the file names, query 2's epoch 0
    // would overwrite query 1's
    val dir = java.nio.file.Files.createTempDirectory("csv_sink3").toString
    def runOnce(rows: Seq[(String, String)]): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("ck3").toString
      val in = MemoryStream[(String, String)](spark)
      val q = in.toDF().toDF("k", "v")
        .writeStream.format("graftcsv")
        .option("path", dir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try { in.addData(rows: _*); q.processAllAvailable() }
      finally q.stop()
    }
    runOnce(Seq(("a", "1"), ("b", "2")))
    runOnce(Seq(("c", "3")))
    val back = spark.read.format("graftcsv").load(dir)
    back.count() shouldBe 3
    rowsAsStrings(back.select(col("k"))) shouldBe Seq("a", "b", "c")
  }

  test("compactCsv folds accumulated epoch files; sidecar + pruning survive") {
    val dir = java.nio.file.Files.createTempDirectory("csv_cmp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ck_cmp").toString
    val in = MemoryStream[(String, String)](spark)
    val q = in.toDF().toDF("k", "v")
      .writeStream.format("graftcsv")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      (1 to 5).foreach { i =>
        in.addData((s"k$i", if (i % 2 == 0) "even" else "odd"))
        q.processAllAvailable() // one epoch (=> >=1 file) per batch
      }
    } finally q.stop()
    val (before, after) =
      graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    before should be >= 5L
    after shouldBe 1L
    val back = spark.read.format("graftcsv").load(dir)
    back.count() shouldBe 5
    // the rebuilt sidecar still prunes: no file's [min,max] covers 'zzz'
    back.filter(col("v") === "zzz").rdd.getNumPartitions shouldBe 0
    back.filter(col("v") === "even").count() shouldBe 2
  }

  test("complete/truncate output modes are rejected") {
    val dir = java.nio.file.Files.createTempDirectory("csv_sink2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("csv_ck2").toString
    val in = MemoryStream[(String, String)](spark)
    val agg = in.toDF().toDF("k", "v").groupBy("k")
      .agg(max(col("v")).as("v"))
    val e = intercept[Exception] {
      val q = agg.writeStream.format("graftcsv")
        .option("path", dir).option("checkpointLocation", ckpt)
        .outputMode("complete").start()
      try { in.addData(("a", "1")); q.processAllAvailable() }
      finally q.stop()
    }
    e.getMessage.toLowerCase should include("append")
  }
}
