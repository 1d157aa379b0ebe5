package graft

import org.apache.spark.sql.functions._

import graft.sources.QuirkCsvVersions

/** The version-diff change feed: multiset row diff between two
  * snapshots, computed over only the files that differ (common files
  * cancel exactly), with the full-snapshot fallback for journaled
  * tables. */
class QuirkCsvChangesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_chg").toString
    spark.conf.set("spark.sql.catalog.graft_chg",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_chg.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_chg.ns")
    r
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(2))).toSeq.sorted

  test("append + COW delete: inserts and deletes surface; carried-over " +
      "rows cancel; identical versions diff to nothing") {
    root
    spark.sql("CREATE TABLE graft_chg.ns.u (k STRING, v STRING)")
    Seq(("1", "a"), ("2", "b")).toDF("k", "v")
      .writeTo("graft_chg.ns.u").append()                    // v1
    Seq(("3", "c")).toDF("k", "v").writeTo("graft_chg.ns.u").append() // v2
    spark.sql("DELETE FROM graft_chg.ns.u WHERE k = '2'")    // v3 (COW)
    val dir = s"$root/ns/u"
    rows(QuirkCsvVersions.changes(spark, dir, 1, 2)) shouldBe
      Seq(("3", "insert"))
    // v2 -> v3 rewrites the whole dir (unpartitioned COW) but rows 1,3
    // carry over and CANCEL — only the deletion surfaces
    rows(QuirkCsvVersions.changes(spark, dir, 2, 3)) shouldBe
      Seq(("2", "delete"))
    rows(QuirkCsvVersions.changes(spark, dir, 1, 3)) shouldBe
      Seq(("2", "delete"), ("3", "insert"))
    QuirkCsvVersions.changes(spark, dir, 2, 2).count() shouldBe 0
    // compaction changes files but not rows: the diff is empty
    graft.operators.Scale.compactCsv(spark, dir, numFiles = 1) // v4
    QuirkCsvVersions.changes(spark, dir, 3, 4).count() shouldBe 0
  }

  test("partitioned: the file delta is confined to the mutated " +
      "partition; a journaled table falls back to the full diff") {
    root
    spark.sql("""CREATE TABLE graft_chg.ns.p (k STRING, day STRING)
      PARTITIONED BY (day)""")
    Seq(("1", "d1"), ("2", "d2")).toDF("k", "day")
      .writeTo("graft_chg.ns.p").append()                    // v1
    Seq(("2b", "d2")).toDF("k", "day")
      .writeTo("graft_chg.ns.p").overwritePartitions()       // v2
    val dir = s"$root/ns/p"
    val (aOnly, bOnly) = QuirkCsvVersions.changedFileSets(spark, dir, 1, 2)
    (aOnly ++ bOnly).map(_.path).foreach(_ should include("day=d2"))
    rows(QuirkCsvVersions.changes(spark, dir, 1, 2)
      .select(col("k"), col("day"), col("change_type"))) shouldBe
      Seq(("2", "delete"), ("2b", "insert"))
    // RENAME journal: the per-file fast path would bypass the journal —
    // the fallback must produce the same change set under logical names
    spark.sql("ALTER TABLE graft_chg.ns.p RENAME COLUMN k TO key")
    val chg = QuirkCsvVersions.changes(spark, dir, 1, 2)
    chg.columns.toSeq shouldBe Seq("key", "day", "change_type")
    rows(chg.select(col("key"), col("day"), col("change_type"))) shouldBe
      Seq(("2", "delete"), ("2b", "insert"))
  }
}
