package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.superstore.Ingest

/** The `graftcsv` DataSourceV2 (sources/QuirkCsv.scala): quirk-parity with
  * Ingest.readRaw, byte-range splits, column pruning, filter pushdown. */
class QuirkCsvSourceSpec extends SparkSpec {

  private val csv = "/root/reference/Project1/superstore.csv"

  private def dsv2(opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graftcsv"))((r, kv) =>
      r.option(kv._1, kv._2)).load(csv)

  private def ingest(excelCompat: Boolean = false): DataFrame =
    Ingest.readRaw(spark, csv, excelCompat)
      .drop("source_file", "ingested_at")

  test("all 9,994 rows parse and match Ingest.readRaw exactly") {
    val d = dsv2()
    d.columns.toSeq shouldBe Ingest.rawColumns
    d.count() shouldBe 9994
    val e = ingest()
    d.except(e).count() shouldBe 0
    e.except(d).count() shouldBe 0
  }

  test("excelCompat reproduces the workbook's lossy 7,484-row load") {
    val d = dsv2("excelCompat" -> "true")
    d.count() shouldBe 7484
    d.except(ingest(excelCompat = true)).count() shouldBe 0
  }

  test("byte-range splits: many partitions, identical result set") {
    val d = dsv2("maxSplitBytes" -> "100000")
    d.rdd.getNumPartitions should be > 20
    d.count() shouldBe 9994
    d.except(dsv2()).count() shouldBe 0
    dsv2().except(d).count() shouldBe 0
  }

  test("column pruning reaches the scan's read schema") {
    val d = dsv2().select("OrderID", "Sales")
    val scan = d.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    scan.readSchema().fieldNames.toSeq shouldBe Seq("OrderID", "Sales")
    d.count() shouldBe 9994
  }

  test("string filters push into the reader; post-scan Filter disappears") {
    val d = dsv2("maxSplitBytes" -> "400000")
      .filter(col("Segment") === "Consumer")
    val plan = d.queryExecution.executedPlan
    val scan = plan.collectFirst { case b: BatchScanExec => b.scan }.get
    scan.description() should include("EqualTo(Segment,Consumer)")
    plan.collect { case f: FilterExec => f } shouldBe empty
    d.count() shouldBe
      ingest().filter(col("Segment") === "Consumer").count()
  }

  test("filter on a column pruned from the output still applies") {
    val d = dsv2().filter(col("Category") === "Furniture")
      .select("OrderID")
    val scan = d.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    scan.readSchema().fieldNames.toSeq shouldBe Seq("OrderID")
    d.count() shouldBe
      ingest().filter(col("Category") === "Furniture").count()
  }

  test("quirk rows (wrapped, embedded commas, NBSP) survive split reads") {
    // the fully-quoted wrapped rows parse identically under small splits
    val wrappedIds = ingest()
      .join(ingest(excelCompat = true), Ingest.rawColumns, "left_anti")
      .select("RowID")
    wrappedIds.count() shouldBe (9994 - 7484)
    val d = dsv2("maxSplitBytes" -> "50000")
    d.join(ingest(), Ingest.rawColumns, "left_anti").count() shouldBe 0
    // NBSP byte decoded as latin-1, not mangled
    d.filter(col("ProductName").contains("\u00a0")).count() shouldBe
      ingest().filter(col("ProductName").contains("\u00a0")).count()
  }

  test("write path: superstore round-trips bit-for-bit through the sink") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv_w").toString
    val src = ingest()
    src.repartition(4).write.format("graftcsv").mode("append").save(dir)
    new java.io.File(dir).listFiles().count(_.getName.endsWith(".csv")) shouldBe 4
    val back = spark.read.format("graftcsv").load(dir)
    back.count() shouldBe 9994
    back.except(src).count() shouldBe 0
    src.except(back).count() shouldBe 0
  }

  test("write path: overwrite truncates previous files at commit") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv_o").toString
    val a = ingest().limit(100).repartition(2)
    a.write.format("graftcsv").mode("append").save(dir)
    val b = ingest().limit(37).repartition(1)
    b.write.format("graftcsv").mode("overwrite").save(dir)
    spark.read.format("graftcsv").load(dir).count() shouldBe 37
  }

  test("write path: NULL vs empty-string fields survive the round-trip") {
    import spark.implicits._
    val df = Seq(
      ("1", "plain", "x"),
      ("2", null, "y"),
      ("3", "", "z"),
      ("4", "has,comma", "with \"quotes\""),
      ("5", "sp nbsp", "")).toDF("id", "a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graftcsv_n").toString
    df.write.format("graftcsv").mode("append").save(dir)
    val back = spark.read.format("graftcsv").load(dir)
    back.count() shouldBe 5
    back.except(df).count() shouldBe 0
    df.except(back).count() shouldBe 0
  }

  test("write path rejects non-string columns with a clear error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftcsv_e").toString
    val err = intercept[Exception] {
      Seq((1, "a")).toDF("n", "s")
        .write.format("graftcsv").mode("append").save(dir)
    }
    err.getMessage should include("cast to string first")
  }

  test("split boundary exactly at a line start loses and duplicates nothing") {
    // every line is exactly 10 bytes ("dddddddd?\n"), so maxSplitBytes=10
    // puts EVERY split boundary exactly on a line start — the case where
    // a discard-from-start reader silently drops one record per split
    val dir = java.nio.file.Files.createTempDirectory("graftcsv_b").toString
    val lines = ("id,colx".padTo(9, 'h') + "\n") +
      (0 until 200).map(i => f"$i%04d,$i%04d" + "\n").mkString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.csv"),
      lines.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    for (split <- Seq("10", "7", "13", "1000000")) {
      val d = spark.read.format("graftcsv")
        .option("maxSplitBytes", split).load(dir)
      withClue(s"maxSplitBytes=$split: ") {
        d.count() shouldBe 200
        d.select(d.columns.head).distinct().count() shouldBe 200
      }
    }
  }

  test("SQL path: the source registers by short name with USING") {
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW qcsv USING graftcsv OPTIONS (path '$csv')")
    spark.sql("SELECT count(*) FROM qcsv").collect()(0).getLong(0) shouldBe 9994
    spark.sql("SELECT count(DISTINCT Segment) FROM qcsv")
      .collect()(0).getLong(0) shouldBe 3
  }
}
