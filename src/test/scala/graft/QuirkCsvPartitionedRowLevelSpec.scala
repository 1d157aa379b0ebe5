package graft

import org.apache.spark.sql.functions._

/** Partition-granular mutations on partitioned graft_cat tables:
  * MERGE/UPDATE/DELETE as copy-on-write over exactly the value
  * directories containing matched rows (runtime group filtering),
  * metadata-only DELETE on partition-column predicates (directory
  * removal, zero files read), dynamic partition overwrite, and static
  * partition-scoped INSERT OVERWRITE.
  *
  * The load-bearing assert everywhere: after a scoped mutation, the
  * files of every UNTOUCHED partition are byte-identical — same names,
  * lengths, modification times, and content — proving the scan never
  * planned them and the write never replaced them. */
class QuirkCsvPartitionedRowLevelSpec extends SparkSpec {

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_prl").toString
    spark.conf.set("spark.sql.catalog.graft_prl",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_prl.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_prl.ns")
    r
  }

  /** (fileName -> (length, mtime, content)) for one value dir. */
  private def dirState(table: String, dirName: String)
  : Map[String, (Long, Long, String)] = {
    val d = new java.io.File(s"$root/ns/$table/$dirName")
    if (!d.exists()) Map.empty
    else d.listFiles().filter(f => f.isFile && !f.getName.startsWith(".") &&
      !f.getName.startsWith("_"))
      .map(f => f.getName -> ((f.length(), f.lastModified(),
        new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.ISO_8859_1))))
      .toMap
  }

  private def seed(table: String): Unit = {
    spark.sql(s"""CREATE TABLE graft_prl.ns.$table (k STRING, v STRING,
      day STRING) PARTITIONED BY (day)""")
    spark.sql(s"""INSERT INTO graft_prl.ns.$table VALUES
      ('k1','a','d1'), ('k2','b','d1'),
      ('k3','c','d2'), ('k4','d','d2'),
      ('k5','e','d3'), ('k6','f','d3')""")
  }

  private def rows(table: String): Set[(String, String, String)] =
    spark.table(s"graft_prl.ns.$table").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("MERGE rewrites only partitions with matched rows; untouched " +
      "partitions stay byte-identical") {
    root; seed("m")
    val d1Before = dirState("m", "day=d1")
    val d2Before = dirState("m", "day=d2")
    val d3Before = dirState("m", "day=d3")
    d1Before should not be empty
    // source touches d2 (update) and inserts a NEW day d4
    spark.sql("""MERGE INTO graft_prl.ns.m t
      USING (SELECT 'k3' AS k, 'C2' AS v, 'd2' AS day
             UNION ALL SELECT 'k9', 'z', 'd4') s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    rows("m") shouldBe Set(
      ("k1", "a", "d1"), ("k2", "b", "d1"),
      ("k3", "C2", "d2"), ("k4", "d", "d2"),
      ("k5", "e", "d3"), ("k6", "f", "d3"),
      ("k9", "z", "d4"))
    // runtime group filtering kept d1/d3 out of the rewrite entirely
    dirState("m", "day=d1") shouldBe d1Before
    dirState("m", "day=d3") shouldBe d3Before
    // the matched partition WAS rewritten: copy-on-write replaces its
    // files wholesale, so no pre-MERGE file name survives in d2
    dirState("m", "day=d2").keySet
      .intersect(d2Before.keySet) shouldBe empty
    new java.io.File(s"$root/ns/m/day=d4").exists() shouldBe true
  }

  test("UPDATE is partition-granular too") {
    root; seed("u")
    val d2Before = dirState("u", "day=d2")
    val d3Before = dirState("u", "day=d3")
    spark.sql("UPDATE graft_prl.ns.u SET v = upper(v) WHERE k = 'k1'")
    rows("u") should contain(("k1", "A", "d1"))
    rows("u") should have size 6
    dirState("u", "day=d2") shouldBe d2Before
    dirState("u", "day=d3") shouldBe d3Before
  }

  test("row-level DELETE on a non-partition predicate removes rows, " +
      "keeps other partitions' files") {
    root; seed("d")
    val d1Before = dirState("d", "day=d1")
    spark.sql("DELETE FROM graft_prl.ns.d WHERE v = 'c'")
    rows("d") shouldBe Set(
      ("k1", "a", "d1"), ("k2", "b", "d1"),
      ("k4", "d", "d2"),
      ("k5", "e", "d3"), ("k6", "f", "d3"))
    dirState("d", "day=d1") shouldBe d1Before
    // d2 still exists (k4 carried over into rewritten files)
    dirState("d", "day=d2") should not be empty
  }

  test("row-level DELETE that empties a partition leaves the dir empty " +
      "but present (DROP PARTITION is the removal story)") {
    root; seed("de")
    spark.sql("DELETE FROM graft_prl.ns.de WHERE v IN ('c','d')")
    rows("de") should have size 4
    dirState("de", "day=d2") shouldBe empty
    new java.io.File(s"$root/ns/de/day=d2").exists() shouldBe true
  }

  test("metadata DELETE: partition-column predicate removes whole dirs, " +
      "zero data files read") {
    root; seed("md")
    val d1Before = dirState("md", "day=d1")
    spark.sql("DELETE FROM graft_prl.ns.md WHERE day = 'd2'")
    // the DIRECTORY is gone — a row-level rewrite would have left it
    // present (empty or with fresh files); removal is the metadata path
    new java.io.File(s"$root/ns/md/day=d2").exists() shouldBe false
    dirState("md", "day=d1") shouldBe d1Before
    rows("md") shouldBe Set(
      ("k1", "a", "d1"), ("k2", "b", "d1"),
      ("k5", "e", "d3"), ("k6", "f", "d3"))
    // IN-predicates route through metadata too
    spark.sql("DELETE FROM graft_prl.ns.md WHERE day IN ('d1','d3')")
    new java.io.File(s"$root/ns/md/day=d1").exists() shouldBe false
    new java.io.File(s"$root/ns/md/day=d3").exists() shouldBe false
    spark.table("graft_prl.ns.md").count() shouldBe 0L
  }

  test("dynamic partition overwrite replaces exactly the written days") {
    root; seed("dyn")
    val d1Before = dirState("dyn", "day=d1")
    val d3Before = dirState("dyn", "day=d3")
    import spark.implicits._
    // re-load day d2 with corrected content — idempotent day re-load
    Seq(("k3", "C!", "d2"), ("k4", "D!", "d2")).toDF("k", "v", "day")
      .writeTo("graft_prl.ns.dyn").overwritePartitions()
    rows("dyn") shouldBe Set(
      ("k1", "a", "d1"), ("k2", "b", "d1"),
      ("k3", "C!", "d2"), ("k4", "D!", "d2"),
      ("k5", "e", "d3"), ("k6", "f", "d3"))
    dirState("dyn", "day=d1") shouldBe d1Before
    dirState("dyn", "day=d3") shouldBe d3Before
    // re-running the same load is a no-op on the result
    Seq(("k3", "C!", "d2"), ("k4", "D!", "d2")).toDF("k", "v", "day")
      .writeTo("graft_prl.ns.dyn").overwritePartitions()
    spark.table("graft_prl.ns.dyn").count() shouldBe 6L
    // SQL INSERT OVERWRITE under dynamic mode takes the same path
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      spark.sql(
        "INSERT OVERWRITE graft_prl.ns.dyn VALUES ('k7','g','d3')")
    }
    rows("dyn") shouldBe Set(
      ("k1", "a", "d1"), ("k2", "b", "d1"),
      ("k3", "C!", "d2"), ("k4", "D!", "d2"),
      ("k7", "g", "d3"))
    dirState("dyn", "day=d1") shouldBe d1Before
  }

  test("static INSERT OVERWRITE ... PARTITION replaces one day only") {
    root; seed("st")
    val d1Before = dirState("st", "day=d1")
    spark.sql("""INSERT OVERWRITE graft_prl.ns.st
      PARTITION (day = 'd2') VALUES ('k8', 'h')""")
    rows("st") shouldBe Set(
      ("k1", "a", "d1"), ("k2", "b", "d1"),
      ("k8", "h", "d2"),
      ("k5", "e", "d3"), ("k6", "f", "d3"))
    dirState("st", "day=d1") shouldBe d1Before
  }

  test("overwrite-by-filter validates rows stay inside the region") {
    root; seed("val")
    import spark.implicits._
    val before = rows("val")
    val e = intercept[Exception] {
      Seq(("k9", "x", "d9")).toDF("k", "v", "day")
        .writeTo("graft_prl.ns.val")
        .overwrite(col("day") === lit("d2"))
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    msgs(e) should include("outside the overwritten region")
    // aborted commit changed nothing
    rows("val") shouldBe before
  }

  test("UPDATE that changes the PARTITION column migrates the row " +
      "between value dirs") {
    root; seed("mv")
    val d3Before = dirState("mv", "day=d3")
    // k3 moves from d2 to d9: the matched partition (d2) is rewritten
    // without the row, the row's new file lands in a fresh d9 dir, and
    // unmatched partitions stay byte-identical
    spark.sql("UPDATE graft_prl.ns.mv SET day = 'd9' WHERE k = 'k3'")
    rows("mv") shouldBe Set(
      ("k1", "a", "d1"), ("k2", "b", "d1"),
      ("k4", "d", "d2"),
      ("k5", "e", "d3"), ("k6", "f", "d3"),
      ("k3", "c", "d9"))
    new java.io.File(s"$root/ns/mv/day=d9").exists() shouldBe true
    dirState("mv", "day=d3") shouldBe d3Before
    // the moved row is gone from d2's files (not just masked)
    dirState("mv", "day=d2").values.map(_._3).mkString should
      not include "k3"
    // pruning still works on the migrated layout
    spark.table("graft_prl.ns.mv").filter(col("day") === "d9")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("k3")
  }

  test("ALTER TABLE ADD COLUMN composes with partitioned MERGE: " +
      "pre-ALTER files read NULL, the rewrite emits full-width rows") {
    root; seed("ev")
    spark.sql("ALTER TABLE graft_prl.ns.ev ADD COLUMN note STRING")
    // pre-ALTER rows surface NULL for the new column
    spark.table("graft_prl.ns.ev").filter(col("note").isNotNull)
      .count() shouldBe 0L
    val d1Before = dirState("ev", "day=d1")
    spark.sql("""MERGE INTO graft_prl.ns.ev t
      USING (SELECT 'k3' AS k, 'c2' AS v, 'd2' AS day, 'patched' AS note
             UNION ALL SELECT 'k9', 'z', 'd2', 'fresh') s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, note = s.note
      WHEN NOT MATCHED THEN INSERT *""")
    val d2 = spark.table("graft_prl.ns.ev").filter(col("day") === "d2")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(3)).getOrElse("-"))).toSet
    d2 shouldBe Set(("k3", "c2", "patched"), ("k4", "d", "-"),
      ("k9", "z", "fresh"))
    // untouched partitions keep their narrow pre-ALTER files untouched
    dirState("ev", "day=d1") shouldBe d1Before
    spark.table("graft_prl.ns.ev").count() shouldBe 7L
  }

  test("MERGE falls back to rewriting every partition when group " +
      "filtering is disabled — and still answers correctly") {
    root; seed("nf")
    withSQLConf(
      "spark.sql.optimizer.runtime.rowLevelOperationGroupFilter.enabled"
        -> "false") {
      spark.sql("""MERGE INTO graft_prl.ns.nf t
        USING (SELECT 'k1' AS k, 'A2' AS v, 'd1' AS day) s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    rows("nf") should contain(("k1", "A2", "d1"))
    rows("nf") should have size 6
  }
}
