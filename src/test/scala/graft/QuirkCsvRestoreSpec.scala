package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.QuirkCsvVersions

/** RESTORE to a past version as a NEW version: the one-call undo over
  * the versioning tier — history is never rewritten, time travel works
  * across the restore in both directions, and a second restore undoes
  * the first. */
class QuirkCsvRestoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_rst").toString
    spark.conf.set("spark.sql.catalog.graft_rst",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rst.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_rst.ns")
    r
  }

  private def ks(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.getString(0)).toSeq.sorted

  test("restore undoes a COW delete; history append-only; a second " +
      "restore undoes the first; restore-to-current is a no-op") {
    root
    spark.sql("CREATE TABLE graft_rst.ns.u (k STRING)")
    Seq("1", "2").toDF("k").writeTo("graft_rst.ns.u").append() // v1
    spark.sql("DELETE FROM graft_rst.ns.u WHERE k = '2'")      // v2
    val p = new Path(s"$root/ns/u")
    val fs = p.getFileSystem(new Configuration())
    QuirkCsvVersions.restore(fs, p, 1L) shouldBe 3L
    ks("SELECT k FROM graft_rst.ns.u") shouldBe Seq("1", "2")
    // history is append-only: all four states remain readable
    ks("SELECT k FROM graft_rst.ns.u VERSION AS OF 1") shouldBe Seq("1", "2")
    ks("SELECT k FROM graft_rst.ns.u VERSION AS OF 2") shouldBe Seq("1")
    ks("SELECT k FROM graft_rst.ns.u VERSION AS OF 3") shouldBe Seq("1", "2")
    QuirkCsvVersions.readLog(fs, p).map(_.action) shouldBe
      Seq("append", "overwrite", "restore-v1")
    // undo the undo: back to the post-delete state
    QuirkCsvVersions.restore(fs, p, 2L) shouldBe 4L
    ks("SELECT k FROM graft_rst.ns.u") shouldBe Seq("1")
    // restoring to the state the table already has records nothing
    QuirkCsvVersions.restore(fs, p, 4L) shouldBe 4L
  }

  test("partitioned: restore brings a metadata-DELETEd partition back " +
      "and drops a dynamically-overwritten rewrite") {
    root
    spark.sql("""CREATE TABLE graft_rst.ns.p (k STRING, day STRING)
      PARTITIONED BY (day)""")
    Seq(("1", "d1"), ("2", "d2"), ("3", "d3")).toDF("k", "day")
      .writeTo("graft_rst.ns.p").append()                      // v1
    spark.sql("DELETE FROM graft_rst.ns.p WHERE day = 'd1'")   // v2
    Seq(("2b", "d2")).toDF("k", "day")
      .writeTo("graft_rst.ns.p").overwritePartitions()         // v3
    ks("SELECT k FROM graft_rst.ns.p") shouldBe Seq("2b", "3")
    val p = new Path(s"$root/ns/p")
    val fs = p.getFileSystem(new Configuration())
    QuirkCsvVersions.restore(fs, p, 1L) shouldBe 4L
    ks("SELECT k FROM graft_rst.ns.p") shouldBe Seq("1", "2", "3")
    // the restored partition prunes like any other
    spark.table("graft_rst.ns.p").filter(col("day") === "d1")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("1")
  }

  test("CALL system.restore; vacuumed targets are loud") {
    root
    spark.sql("CREATE TABLE graft_rst.ns.c (k STRING)")
    Seq("1").toDF("k").writeTo("graft_rst.ns.c").append()      // v1
    spark.sql("DELETE FROM graft_rst.ns.c WHERE k = '1'")      // v2
    Seq("2").toDF("k").writeTo("graft_rst.ns.c").append()      // v3
    spark.sql("CALL graft_rst.system.restore('ns.c', 2)")
      .collect()(0).getLong(0) shouldBe 4L
    ks("SELECT k FROM graft_rst.ns.c") shouldBe Seq()
    spark.sql("CALL graft_rst.system.vacuum('ns.c', 0)")
      .collect()(0).getLong(0) shouldBe 4L
    an[Exception] should be thrownBy
      spark.sql("CALL graft_rst.system.restore('ns.c', 1)").collect()
  }
}
