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

  test("unsupported evolutions are rejected with the positional rationale") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.r (a STRING, b STRING)")
    spark.sql("INSERT INTO graft_evo.ns.r VALUES ('1','x')")
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

  // -------------------------- tier 2: RENAME / DROP, positions frozen

  private def dataSnapshot(table: String): Set[(String, Long, Long)] =
    new java.io.File(s"$root/ns/$table").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("part-seed-"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet

  test("RENAME COLUMN: metadata-only, mixed generations read correctly, " +
      "zone stats keep serving under the physical key") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.rn (id STRING, val STRING)")
    spark.sql("INSERT INTO graft_evo.ns.rn VALUES ('1','a'), ('2','b')")
    val before = dataSnapshot("rn")
    spark.sql("ALTER TABLE graft_evo.ns.rn RENAME COLUMN val TO amount")
    // data files byte-identical — the rename touched metadata only
    dataSnapshot("rn") shouldBe before
    spark.table("graft_evo.ns.rn").columns.toSeq shouldBe Seq("id", "amount")
    // post-rename writes mix with pre-rename files transparently
    spark.sql("INSERT INTO graft_evo.ns.rn VALUES ('3','c')")
    spark.sql(
      "SELECT id, amount FROM graft_evo.ns.rn ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("1", "a"), ("2", "b"), ("3", "c"))
    // metadata-only aggregate still engages: old sidecar stats are keyed
    // by the physical name and the lookup translates through the journal
    val agg = spark.table("graft_evo.ns.rn")
      .agg(min(col("amount")).as("lo"), max(col("amount")).as("hi"))
    agg.queryExecution.executedPlan.toString should
      include("MetadataOnlyAggregate: true")
    agg.collect().head.toSeq shouldBe Seq("a", "c")
    // a second rename chains; rename back to a reserved name is rejected
    spark.sql("ALTER TABLE graft_evo.ns.rn RENAME COLUMN amount TO price")
    spark.sql("SELECT price FROM graft_evo.ns.rn WHERE id = '1'")
      .collect().head.getString(0) shouldBe "a"
    val reuse = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.rn ADD COLUMN val STRING")
    }
    reuse.getMessage should include("reserved")
  }

  test("RENAME COLUMN: zone pruning survives under the renamed name") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.rz (k STRING, v STRING)")
    spark.range(50).selectExpr("lpad(CAST(id AS STRING), 4, '0') AS k",
      "'lo' AS v").repartition(1).writeTo("graft_evo.ns.rz").append()
    spark.range(50, 100).selectExpr("lpad(CAST(id AS STRING), 4, '0') AS k",
      "'hi' AS v").repartition(1).writeTo("graft_evo.ns.rz").append()
    spark.sql("ALTER TABLE graft_evo.ns.rz RENAME COLUMN k TO key")
    // the point probe on the RENAMED column still prunes the out-of-range
    // data file — stats live under the physical name and the lookup
    // translates. (The header-only schema seed has no sidecar entry and
    // always plans its one split: 3 files -> 2 splits, not 3.)
    spark.table("graft_evo.ns.rz").rdd.getNumPartitions shouldBe 3
    val hit = spark.table("graft_evo.ns.rz").filter(col("key") === "0007")
    hit.rdd.getNumPartitions shouldBe 2
    hit.collect().map(_.getString(1)).toSeq shouldBe Seq("lo")
  }

  test("DROP COLUMN: projection-masked, positions frozen, later columns " +
      "do not shift, files untouched") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.dr (a STRING, b STRING, c STRING)")
    spark.sql("INSERT INTO graft_evo.ns.dr VALUES ('1','x','p'), ('2','y','q')")
    val before = dataSnapshot("dr")
    spark.sql("ALTER TABLE graft_evo.ns.dr DROP COLUMN b")
    dataSnapshot("dr") shouldBe before
    spark.table("graft_evo.ns.dr").columns.toSeq shouldBe Seq("a", "c")
    // c still reads its own values — the dropped position is masked,
    // never compacted away
    spark.sql("SELECT a, c FROM graft_evo.ns.dr ORDER BY a")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("1", "p"), ("2", "q"))
    // post-drop writes emit the dropped position as NULL so old and new
    // generations share one frozen layout
    spark.sql("INSERT INTO graft_evo.ns.dr VALUES ('3','r')")
    spark.sql("SELECT a, c FROM graft_evo.ns.dr WHERE a = '3'")
      .collect().head.getString(1) shouldBe "r"
    // re-adding the dropped name is rejected (stale stats / position
    // aliasing); a fresh name appends fine and reads across generations
    val reuse = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.dr ADD COLUMN b STRING")
    }
    reuse.getMessage should include("reserved")
    spark.sql("ALTER TABLE graft_evo.ns.dr ADD COLUMN d STRING")
    spark.sql("INSERT INTO graft_evo.ns.dr VALUES ('4','s','D4')")
    spark.sql("SELECT a, c, d FROM graft_evo.ns.dr ORDER BY a")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq shouldBe
      Seq(("1", "p", null), ("2", "q", null), ("3", "r", null),
        ("4", "s", "D4"))
  }

  test("DROP then RENAME compose; raw directory reads see the same " +
      "logical schema as the catalog") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.cx (a STRING, b STRING, c STRING)")
    spark.sql("INSERT INTO graft_evo.ns.cx VALUES ('1','x','p')")
    spark.sql("ALTER TABLE graft_evo.ns.cx DROP COLUMN b")
    spark.sql("ALTER TABLE graft_evo.ns.cx RENAME COLUMN c TO cc")
    spark.table("graft_evo.ns.cx").columns.toSeq shouldBe Seq("a", "cc")
    // a non-catalog read of the directory applies the same journal
    val raw = spark.read.format("graftcsv").load(s"$root/ns/cx")
    raw.columns.toSeq shouldBe Seq("a", "cc")
    raw.select("a", "cc").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq shouldBe Seq(("1", "p"))
  }

  test("compaction of a RENAME/DROP-journaled table folds the FROZEN " +
      "physical layout — values stay correct, stats keep serving") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.cp (a STRING, b STRING, c STRING)")
    spark.sql("INSERT INTO graft_evo.ns.cp VALUES ('1','x','p')")
    spark.sql("INSERT INTO graft_evo.ns.cp VALUES ('2','y','q')")
    spark.sql("ALTER TABLE graft_evo.ns.cp DROP COLUMN b")
    spark.sql("ALTER TABLE graft_evo.ns.cp RENAME COLUMN c TO cc")
    val dir = s"$root/ns/cp"
    // the fold must read+write the physical layout: a logical fold would
    // swap in 2-field files the journal then positionally mis-reads
    // (cc at physical index 2 would read NULL / a later column's values)
    graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    spark.sql("SELECT a, cc FROM graft_evo.ns.cp ORDER BY a")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("1", "p"), ("2", "q"))
    // folded files carry PHYSICAL headers (a,b,c) so any generation mix
    // keeps reading; and their sidecar stats are keyed physically, so
    // the metadata-only aggregate still engages under the renamed name
    val agg = spark.table("graft_evo.ns.cp")
      .agg(min(col("cc")).as("lo"), max(col("cc")).as("hi"))
    agg.queryExecution.executedPlan.toString should
      include("MetadataOnlyAggregate: true")
    agg.collect().head.toSeq shouldBe Seq("p", "q")
    // post-compaction writes still mix fine
    spark.sql("INSERT INTO graft_evo.ns.cp VALUES ('3','r')")
    spark.sql("SELECT a, cc FROM graft_evo.ns.cp ORDER BY a")
      .collect().map(_.getString(1)).toSeq shouldBe Seq("p", "q", "r")
  }

  test("a data-bearing file wearing the seed name falls back to the " +
      "scan, never silently vanishing from a metadata aggregate") {
    root
    spark.sql("CREATE TABLE graft_evo.ns.sd (k STRING)")
    spark.sql("INSERT INTO graft_evo.ns.sd VALUES ('a'), ('b')")
    // smuggle data rows into a seed-named file (out-of-contract)
    val rogue = new java.io.File(s"$root/ns/sd/part-seed-00099.csv")
    val w = new java.io.PrintWriter(rogue, "ISO-8859-1")
    w.print("k\r\nz1\r\nz2\r\n"); w.close()
    val agg = spark.table("graft_evo.ns.sd")
      .agg(count(lit(1)).as("n"), max(col("k")).as("hi"))
    // the header-only verification rejects the exemption -> no sidecar
    // entry for the rogue file -> metadata path bails to the scan, which
    // reads the rogue rows (the seed-named file IS still scanned)
    agg.queryExecution.executedPlan.toString should
      not include "MetadataOnlyAggregate"
    agg.collect().head.toSeq shouldBe Seq(4L, "z2")
  }

  test("partition column can be neither renamed nor dropped") {
    root
    spark.sql("""CREATE TABLE graft_evo.ns.pc (id STRING, day STRING)
      PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft_evo.ns.pc VALUES ('1','d1')")
    val rn = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.pc RENAME COLUMN day TO dt")
    }
    rn.getMessage should include("partition column")
    val dr = intercept[Exception] {
      spark.sql("ALTER TABLE graft_evo.ns.pc DROP COLUMN day")
    }
    dr.getMessage should include("partition column")
    // non-partition columns still evolve on partitioned tables
    spark.sql("ALTER TABLE graft_evo.ns.pc RENAME COLUMN id TO key")
    spark.sql("INSERT INTO graft_evo.ns.pc VALUES ('2','d2')")
    spark.sql("SELECT key, day FROM graft_evo.ns.pc ORDER BY key")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("1", "d1"), ("2", "d2"))
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
