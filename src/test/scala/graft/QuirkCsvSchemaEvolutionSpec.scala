package graft

import org.apache.spark.sql.functions._

/** Append-only schema evolution on graft_cat tables: ALTER TABLE ADD
  * COLUMN widens the seed header without touching data files; pre-ALTER
  * rows surface NULL for appended columns; the scan tier (filters, zone
  * maps, pushed aggregates) stays correct across the generation mix. */
class QuirkCsvSchemaEvolutionSpec extends SparkSpec {

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_evo").toString
    spark.conf.set("spark.sql.catalog.graft_evo",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_evo.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_evo.ns")
    r
  }

  test("ADD COLUMN: old rows NULL, new rows populated, schema widened") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.t (id STRING, v STRING)")
    spark.sql("INSERT INTO graft_evo.ns.t VALUES ('1','a'), ('2','b')")
    spark.sql("ALTER TABLE graft_evo.ns.t ADD COLUMN extra STRING")
    spark.table("graft_evo.ns.t").columns.toSeq shouldBe
      Seq("id", "v", "extra")
    spark.sql("INSERT INTO graft_evo.ns.t VALUES ('3','c','X')")
    val rows = spark.sql(
      "SELECT id, v, extra FROM graft_evo.ns.t ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    rows.toSeq shouldBe Seq(("1", "a", null), ("2", "b", null),
      ("3", "c", "X"))
  }

  test("filters on the appended column work across generations") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.f (k STRING)")
    spark.sql("INSERT INTO graft_evo.ns.f VALUES ('old1'), ('old2')")
    spark.sql("ALTER TABLE graft_evo.ns.f ADD COLUMN tag STRING")
    spark.sql("INSERT INTO graft_evo.ns.f VALUES ('new1','t1'), ('new2','t2')")
    // IS NULL catches exactly the pre-ALTER generation
    spark.sql("SELECT k FROM graft_evo.ns.f WHERE tag IS NULL ORDER BY k")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("old1", "old2")
    // equality on the new column: filter pushes into the scan and must
    // not wrongly drop/keep old-generation files
    val eq = spark.sql("SELECT k FROM graft_evo.ns.f WHERE tag = 't2'")
    eq.queryExecution.executedPlan.toString should include("EqualTo(tag,t2)")
    eq.collect().map(_.getString(0)).toSeq shouldBe Seq("new2")
    // pushed aggregate over the generation mix
    spark.sql("SELECT count(tag) FROM graft_evo.ns.f")
      .collect().head.getLong(0) shouldBe 2L
    spark.sql("SELECT count(*) FROM graft_evo.ns.f")
      .collect().head.getLong(0) shouldBe 4L
  }

  test("multiple adds in one statement; duplicate and unsafe names rejected") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.m (a STRING)")
    spark.sql("ALTER TABLE graft_evo.ns.m ADD COLUMNS (b STRING, c STRING)")
    spark.table("graft_evo.ns.m").columns.toSeq shouldBe Seq("a", "b", "c")
    val dup = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.m ADD COLUMN a STRING")
    }
    dup.getMessage.toLowerCase should include("exist")
    val unsafe = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.m ADD COLUMN `bad name` STRING")
    }
    unsafe.getMessage should include("identifier-safe")
  }

  test("non-append evolutions are rejected with the positional rationale") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.r (a STRING, b STRING)")
    spark.sql("INSERT INTO graft_evo.ns.r VALUES ('1','x')")
    val drop = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.r DROP COLUMN b")
    }
    drop.getMessage should include("ADD COLUMN")
    val rename = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.r RENAME COLUMN b TO c")
    }
    rename.getMessage should include("ADD COLUMN")
    val typed = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.r ADD COLUMN n INT")
    }
    typed.getMessage should include("all-string")
    val positioned = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.r ADD COLUMN z STRING FIRST")
    }
    positioned.getMessage should include("last")
    // the failed ALTERs changed nothing
    spark.table("graft_evo.ns.r").columns.toSeq shouldBe Seq("a", "b")
    spark.sql("SELECT a, b FROM graft_evo.ns.r").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("1", "x"))
  }

  test("versioned seeds: highest wins; a stale lower seed never narrows the schema") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.v (a STRING)")
    spark.sql("ALTER TABLE graft_evo.ns.v ADD COLUMN b STRING")
    spark.sql("ALTER TABLE graft_evo.ns.v ADD COLUMN c STRING")
    val dir = new java.io.File(s"$root/ns/v")
    // only the newest seed survives a clean ALTER
    dir.listFiles().map(_.getName).filter(_.startsWith("part-seed-"))
      .toSeq shouldBe Seq("part-seed-00002.csv")
    // simulate a crash between new-seed rename and old-seed delete: a
    // STALE lower version reappears — the highest version must stay the
    // schema authority
    val stale = new java.io.File(dir, "part-seed-00000.csv")
    val w = new java.io.FileOutputStream(stale)
    w.write("a\n".getBytes("ISO-8859-1")); w.close()
    spark.table("graft_evo.ns.v").columns.toSeq shouldBe Seq("a", "b", "c")
  }

  test("zone maps keep pruning on old columns after the widen") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.z (k STRING, v STRING)")
    // two clustered inserts -> distinct files with tight k ranges
    spark.range(100).selectExpr(
      "CAST(id AS STRING) AS k", "'lo' AS v")
      .where("id < 50").repartition(1)
      .writeTo("graft_evo.ns.z").append()
    spark.range(100).selectExpr(
      "CAST(id AS STRING) AS k", "'hi' AS v")
      .where("id >= 50").repartition(1)
      .writeTo("graft_evo.ns.z").append()
    spark.sql("ALTER TABLE graft_evo.ns.z ADD COLUMN extra STRING")
    // a filter on an appended column must not prune ANY file (old
    // entries lack its stats), while the result stays correct
    spark.sql("SELECT count(*) FROM graft_evo.ns.z WHERE extra IS NULL")
      .collect().head.getLong(0) shouldBe 100L
    // and equality on the old column still returns the right rows
    spark.sql("SELECT v FROM graft_evo.ns.z WHERE k = '7'")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("lo")
  }
}
