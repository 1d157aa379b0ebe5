package graft

import org.apache.spark.sql.functions._

import graft.superstore.Pipeline

/** The Superstore pipeline eating its own DSv2 dogfood
  * (`Pipeline.runViaCatalog`): the raw layer is a `graft_cat` TABLE
  * loaded through the graftcsv source (reference raw layer,
  * SQLproject1.sql:82-127), the reload is overwrite-by-truncate like the
  * reference's TRUNCATE + BULK INSERT, and raw-layer slicer scans show
  * pushed filters plus zone-map file skipping — the same golden
  * invariants as SuperstorePipelineSpec, through the catalog path. */
class SuperstoreCatalogPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val csv = "/root/reference/Project1/superstore.csv"
  private def available = new java.io.File(csv).exists()

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_cat_pipe").toString
  private lazy val out =
    Pipeline.runViaCatalog(spark, csv, root, rawLayoutFiles = 4, catalogName = "graft_sstore")

  test("golden invariants hold end-to-end through graft_cat") {
    assume(available)
    out.raw.count() shouldBe 9994
    out.deduped.count() shouldBe 9986
    val sums = out.raw.agg(
      sum($"Sales".cast("decimal(18,4)")).cast("decimal(18,2)").cast("string"))
      .as[String].head()
    sums shouldBe "2297200.86"
    out.dims.shipMode.count() shouldBe 4
    out.dims.category.count() shouldBe 3
    out.dims.subCategory.count() shouldBe 17
    out.dims.customer.count() shouldBe 793
    out.fact.count() shouldBe 9986
  }

  test("reload is an overwrite, not an append (reference TRUNCATE+BULK)") {
    assume(available)
    out
    val again = Pipeline.runViaCatalog(spark, csv, root, rawLayoutFiles = 4, catalogName = "graft_sstore")
    again.raw.count() shouldBe 9994
    spark.table("graft_sstore.raw.superstore").count() shouldBe 9994
  }

  test("raw-layer slicer filters push into the scan and skip files") {
    assume(available)
    out
    val tableDir = new java.io.File(new java.io.File(root, "raw"),
      "superstore")
    val nFiles = tableDir.listFiles().count(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    nFiles should be > 1 // region-range clustering wrote a real layout
    val west = spark.table("graft_sstore.raw.superstore")
      .filter(col("Region") === "West")
    val plan = west.queryExecution.executedPlan.toString
    plan should include("EqualTo(Region,West)") // pushed to the reader
    // zone-map sidecar skips the part files whose Region range excludes
    // West — the scan plans fewer splits than there are files
    west.rdd.getNumPartitions should be < nFiles
    west.count() shouldBe spark.read.format("graftcsv").load(csv)
      .filter(col("Region") === "West").count()
  }

  test("fact.sales lands YEAR-partitioned; the idempotent re-load " +
      "leaves every partition byte-identical; a new day touches one year") {
    assume(available)
    out
    val landed = Pipeline.landFactPartitioned(spark, out.fact,
      "graft_sstore")
    landed.count() shouldBe 9986
    // one value dir per order year, golden fact invariants intact
    val tableDir = new java.io.File(new java.io.File(root, "fact"), "sales")
    val years = tableDir.listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
      .map(_.getName).sorted
    years.toSeq shouldBe Seq("order_year=2014", "order_year=2015",
      "order_year=2016", "order_year=2017")
    landed.select("order_id", "order_line_no").distinct()
      .count() shouldBe 9986
    // value-dir byte-identity only: the hidden _graft_versions log
    // legitimately gains one entry per committed mutation
    def snapshot(): Map[String, Set[(String, Long, Long)]] =
      tableDir.listFiles()
        .filter(d => d.isDirectory && !d.getName.startsWith("_")).map { d =>
        d.getName -> d.listFiles()
          .filter(f => f.isFile && !f.getName.startsWith(".") &&
            !f.getName.startsWith("_"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
    val before = snapshot()
    // re-landing the SAME batch is the reference's NOT EXISTS no-op:
    // nothing is written, every partition stays byte-identical
    Pipeline.landFactPartitioned(spark, out.fact, "graft_sstore")
      .count() shouldBe 9986
    snapshot() shouldBe before
    // a new day (fabricated 2018 lines) appends ONLY its own year dir
    val newDay = out.fact
      .limit(5)
      .withColumn("order_id", concat(lit("NEW-"), col("order_id")))
      .withColumn("order_date_key", lit(20180105))
    Pipeline.landFactPartitioned(spark, newDay, "graft_sstore")
      .count() shouldBe 9991
    val after = snapshot()
    after.filterKeys(_ != "order_year=2018").toMap shouldBe before
    after.keySet should contain("order_year=2018")
  }
}
