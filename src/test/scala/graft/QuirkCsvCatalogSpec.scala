package graft

import org.apache.spark.sql.functions._

/** The graft_cat DSv2 catalog plugin: CREATE / INSERT / SELECT / RENAME /
  * DROP on graftcsv tables from pure SQL, with the source's scan
  * optimizations intact through the catalog path. */
class QuirkCsvCatalogSpec extends SparkSpec {

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat.root", r)
    r
  }

  test("create / insert / select round-trip through SQL") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.staging")
    spark.sql(
      "CREATE TABLE graft_cat.staging.orders (id STRING, region STRING)")
    // freshly created table is empty but fully typed
    val empty = spark.sql("SELECT * FROM graft_cat.staging.orders")
    empty.columns.toSeq shouldBe Seq("id", "region")
    empty.count() shouldBe 0
    spark.sql("""INSERT INTO graft_cat.staging.orders VALUES
      ('1', 'West'), ('2', 'East'), ('3', NULL)""")
    spark.sql("SELECT * FROM graft_cat.staging.orders").count() shouldBe 3
    spark.sql("""SELECT region FROM graft_cat.staging.orders
      WHERE region IS NOT NULL ORDER BY region""")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("East", "West")
  }

  test("scan optimizations survive the catalog path") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.opt")
    spark.sql("CREATE TABLE graft_cat.opt.t (k STRING, v STRING)")
    spark.sql("INSERT INTO graft_cat.opt.t VALUES ('a','1'), ('b','2')")
    val agg = spark.sql("SELECT count(*) FROM graft_cat.opt.t")
    agg.queryExecution.executedPlan.toString should
      include("PushedAggregation: [COUNT(*)]")
    agg.collect().head.getLong(0) shouldBe 2L
    val filtered = spark.sql("SELECT * FROM graft_cat.opt.t WHERE k = 'a'")
    filtered.queryExecution.executedPlan.toString should
      include("EqualTo(k,a)")
    filtered.count() shouldBe 1L
  }

  test("show tables / rename / drop") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.adm")
    spark.sql("CREATE TABLE graft_cat.adm.t1 (a STRING)")
    spark.sql("SHOW TABLES IN graft_cat.adm").collect()
      .map(_.getString(1)).toSeq should contain("t1")
    // the TO identifier resolves within the same catalog — repeating
    // the catalog name would be parsed as a namespace level
    spark.sql("ALTER TABLE graft_cat.adm.t1 RENAME TO adm.t2")
    spark.sql("SHOW TABLES IN graft_cat.adm").collect()
      .map(_.getString(1)).toSeq should contain("t2")
    spark.sql("DROP TABLE graft_cat.adm.t2")
    spark.sql("SHOW TABLES IN graft_cat.adm").collect() shouldBe empty
  }

  test("raw-layer contract: non-string columns rejected at CREATE") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.bad")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_cat.bad.t (a STRING, n INT)")
    }
    e.getMessage should include("all-string raw layer")
  }

  test("column names that would not survive the header round-trip are rejected") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.badname")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_cat.badname.t (`order id` STRING)")
    }
    e.getMessage should include("identifier-safe")
  }

  test("tables and namespaces do not masquerade as each other") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.mixed")
    spark.sql("CREATE TABLE graft_cat.mixed.t (a STRING)")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.mixed.sub")
    // the table is not a child namespace...
    spark.sql("SHOW NAMESPACES IN graft_cat.mixed").collect()
      .map(_.getString(0)).toSeq should not contain "t"
    // ...and the namespace is not a table
    spark.sql("SHOW TABLES IN graft_cat.mixed").collect()
      .map(_.getString(1)).toSeq shouldBe Seq("t")
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[graft.sources.QuirkCsvCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    cat.tableExists(
      Identifier.of(Array("mixed"), "sub")) shouldBe false
    // DROP TABLE must not recursively delete a namespace directory
    cat.dropTable(Identifier.of(Array("mixed"), "sub")) shouldBe false
    cat.namespaceExists(Array("mixed", "sub")) shouldBe true
  }

  test("files dropped into the directory are immediately queryable") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.drop_in")
    spark.sql("CREATE TABLE graft_cat.drop_in.t (x STRING, y STRING)")
    val dir = new java.io.File(new java.io.File(
      new java.io.File(root), "drop_in"), "t")
    java.nio.file.Files.write(
      new java.io.File(dir, "part-external.csv").toPath,
      "x,y\nhello,world\n".getBytes("ISO-8859-1"))
    spark.sql("SELECT * FROM graft_cat.drop_in.t").count() shouldBe 1
  }

  test("atomic CTAS / RTAS through the staging catalog") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.ctas")
    def stagedResidue(): Seq[String] =
      new java.io.File(s"$root/ctas").listFiles()
        .filter(f => f.getName.startsWith(".staged-") ||
          f.getName.startsWith(".replaced-"))
        .map(_.getName).toSeq
    // CTAS: skeleton + query output land together
    spark.sql("""CREATE TABLE graft_cat.ctas.t AS
      SELECT CAST(id AS STRING) AS k,
             CAST(id % 3 AS STRING) AS m FROM range(9)""")
    spark.table("graft_cat.ctas.t").count() shouldBe 9
    stagedResidue() shouldBe Seq.empty
    // the created table is a full citizen: versioned, appendable
    spark.sql("INSERT INTO graft_cat.ctas.t VALUES ('x', 'y')")
    spark.sql("SELECT k FROM graft_cat.ctas.t VERSION AS OF 1")
      .count() shouldBe 9
    // duplicate CTAS fails, leaving the original untouched
    an[Exception] should be thrownBy
      spark.sql("CREATE TABLE graft_cat.ctas.t AS SELECT '1' AS k")
    spark.table("graft_cat.ctas.t").count() shouldBe 10
    // a FAILING query aborts the stage: no table, no residue
    an[Exception] should be thrownBy spark.sql(
      """CREATE TABLE graft_cat.ctas.boom AS
        SELECT raise_error('mid-query failure') AS k FROM range(3)""")
    spark.catalog.tableExists("graft_cat.ctas.boom") shouldBe false
    stagedResidue() shouldBe Seq.empty
    // RTAS: the old table stays COMPLETE until the swap; a failing
    // replacement query must leave it untouched (the non-staged
    // fallback drops the table before running the query)
    an[Exception] should be thrownBy spark.sql(
      """REPLACE TABLE graft_cat.ctas.t AS
        SELECT raise_error('replacement failed') AS k FROM range(3)""")
    spark.table("graft_cat.ctas.t").count() shouldBe 10
    stagedResidue() shouldBe Seq.empty
    spark.sql("""REPLACE TABLE graft_cat.ctas.t AS
      SELECT CAST(id AS STRING) AS k FROM range(4)""")
    spark.table("graft_cat.ctas.t").collect()
      .map(_.getString(0)).toSet shouldBe Set("0", "1", "2", "3")
    stagedResidue() shouldBe Seq.empty
    // REPLACE of a missing table is loud; CREATE OR REPLACE creates
    an[Exception] should be thrownBy
      spark.sql("REPLACE TABLE graft_cat.ctas.missing AS SELECT '1' AS k")
    spark.sql(
      "CREATE OR REPLACE TABLE graft_cat.ctas.t2 AS SELECT '1' AS k")
    spark.table("graft_cat.ctas.t2").count() shouldBe 1
    // partitioned CTAS routes through the same staged write
    spark.sql("""CREATE TABLE graft_cat.ctas.p PARTITIONED BY (m) AS
      SELECT CAST(id AS STRING) AS k,
             CAST(id % 2 AS STRING) AS m FROM range(6)""")
    spark.table("graft_cat.ctas.p").count() shouldBe 6
    new java.io.File(s"$root/ctas/p").listFiles()
      .count(d => d.isDirectory && d.getName.startsWith("m=")) shouldBe 2
  }
}
