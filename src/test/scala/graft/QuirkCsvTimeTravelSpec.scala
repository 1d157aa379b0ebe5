package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.QuirkCsvVersions

/** Table versioning on graft_cat tables: every mutation retires the
  * files it replaces into `_graft_attic/v<n>/` (renames, never copies)
  * and appends one `_graft_versions/v-<n>.tsv` entry, so `VERSION AS
  * OF` / `TIMESTAMP AS OF` reconstruct any retained snapshot — across
  * appends, copy-on-write, dynamic overwrite, metadata DELETE, DROP
  * PARTITION, TRUNCATE, compaction, and streaming epochs. */
class QuirkCsvTimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_tt").toString
    spark.conf.set("spark.sql.catalog.graft_tt",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_tt.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_tt.ns")
    r
  }

  private def ks(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.getString(0)).toSeq.sorted

  test("unpartitioned lifecycle: appends + copy-on-write DELETE, " +
      "every version readable, history recorded") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.u (k STRING, v STRING)")
    Seq(("1", "a"), ("2", "b")).toDF("k", "v")
      .writeTo("graft_tt.ns.u").append() // v1
    Seq(("3", "c"), ("4", "d")).toDF("k", "v")
      .writeTo("graft_tt.ns.u").append() // v2
    spark.sql("DELETE FROM graft_tt.ns.u WHERE k = '2'") // v3 (COW)
    ks("SELECT k FROM graft_tt.ns.u") shouldBe Seq("1", "3", "4")
    ks("SELECT k FROM graft_tt.ns.u VERSION AS OF 1") shouldBe Seq("1", "2")
    ks("SELECT k FROM graft_tt.ns.u VERSION AS OF 2") shouldBe
      Seq("1", "2", "3", "4")
    ks("SELECT k FROM graft_tt.ns.u VERSION AS OF 3") shouldBe
      Seq("1", "3", "4")
    // version 0 = the freshly-created empty table
    ks("SELECT k FROM graft_tt.ns.u VERSION AS OF 0") shouldBe Seq()
    val hist = QuirkCsvVersions.history(spark, s"$root/ns/u")
      .orderBy("version")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    hist.map(_._1) shouldBe Seq(1L, 2L, 3L)
    hist.map(_._2) shouldBe Seq("append", "append", "overwrite")
    // the COW retired BOTH v2-visible files into the attic
    val attic = new java.io.File(s"$root/ns/u/_graft_attic/v0000000003")
    attic.listFiles().count(_.getName.endsWith(".csv")) should be >= 2
  }

  test("snapshot reads are read-only and batch-only; bad versions loud") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.g (k STRING)")
    Seq("1").toDF("k").writeTo("graft_tt.ns.g").append()
    the[Exception] thrownBy
      ks("SELECT k FROM graft_tt.ns.g VERSION AS OF 99") should not be null
    val snap = spark.read.format("graftcsv")
      .option("asOfVersion", "1").load(s"$root/ns/g")
    snap.count() shouldBe 1
    an[Exception] should be thrownBy
      Seq("2").toDF("k").write.format("graftcsv").mode("append")
        .option("asOfVersion", "1").save(s"$root/ns/g")
    // the stream thread hits the batch-only guard; surface it via the
    // query's terminal exception
    an[Exception] should be thrownBy {
      val q = spark.readStream.format("graftcsv")
        .option("asOfVersion", "1")
        .load(s"$root/ns/g").writeStream.format("noop")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("graft_tt_sg").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // raw (non-catalog) dirs are unversioned: asOf rejected, deletes stay
    // physical
    val raw = java.nio.file.Files.createTempDirectory("graft_tt_raw")
      .toString
    Seq("1").toDF("k").write.format("graftcsv").mode("append").save(raw)
    an[Exception] should be thrownBy
      spark.read.format("graftcsv").option("asOfVersion", "0").load(raw)
        .count()
    new java.io.File(raw, QuirkCsvVersions.LogDirName)
      .exists() shouldBe false
  }

  test("partitioned lifecycle: dynamic overwrite, metadata DELETE and " +
      "DROP PARTITION all keep their granularity AND their history") {
    root
    spark.sql("""CREATE TABLE graft_tt.ns.p (k STRING, day STRING)
      PARTITIONED BY (day)""")
    Seq(("1", "d1"), ("2", "d2"), ("3", "d3")).toDF("k", "day")
      .writeTo("graft_tt.ns.p").append() // v1
    // v2: dynamic overwrite of d2 only
    Seq(("2b", "d2")).toDF("k", "day")
      .writeTo("graft_tt.ns.p").overwritePartitions()
    // v3: metadata DELETE of d1 — still zero data files read: the value
    // dir is ONE rename into the attic
    spark.sql("DELETE FROM graft_tt.ns.p WHERE day = 'd1'")
    // v4: DROP PARTITION d3
    spark.sql("ALTER TABLE graft_tt.ns.p DROP PARTITION (day='d3')")
    ks("SELECT k FROM graft_tt.ns.p") shouldBe Seq("2b")
    ks("SELECT k FROM graft_tt.ns.p VERSION AS OF 1") shouldBe
      Seq("1", "2", "3")
    ks("SELECT k FROM graft_tt.ns.p VERSION AS OF 2") shouldBe
      Seq("1", "2b", "3")
    ks("SELECT k FROM graft_tt.ns.p VERSION AS OF 3") shouldBe
      Seq("2b", "3")
    // partition pruning still works INSIDE a snapshot (attic dirs keep
    // their col=value parents)
    val pruned = spark.sql(
      "SELECT k FROM graft_tt.ns.p VERSION AS OF 1 WHERE day = 'd2'")
    pruned.collect().map(_.getString(0)).toSeq shouldBe Seq("2")
    val hist = QuirkCsvVersions.history(spark, s"$root/ns/p")
      .orderBy("version").collect().map(_.getString(1)).toSeq
    hist shouldBe Seq("append", "dynamicOverwrite", "delete",
      "dropPartition")
  }

  test("TRUNCATE is time-travelable; version log survives") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.tr (k STRING)")
    Seq("1", "2").toDF("k").writeTo("graft_tt.ns.tr").append() // v1
    spark.sql("TRUNCATE TABLE graft_tt.ns.tr")                 // v2
    ks("SELECT k FROM graft_tt.ns.tr") shouldBe Seq()
    ks("SELECT k FROM graft_tt.ns.tr VERSION AS OF 1") shouldBe Seq("1", "2")
    Seq("3").toDF("k").writeTo("graft_tt.ns.tr").append()      // v3
    ks("SELECT k FROM graft_tt.ns.tr VERSION AS OF 2") shouldBe Seq()
    ks("SELECT k FROM graft_tt.ns.tr") shouldBe Seq("3")
  }

  test("compaction folds are a version: the pre-fold snapshot reads the " +
      "ORIGINAL files from the attic, bytes intact") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.c (k STRING)")
    (0 until 3).foreach { i =>
      Seq(s"$i").toDF("k").writeTo("graft_tt.ns.c").append() // v1..v3
    }
    val dir = new java.io.File(s"$root/ns/c")
    def live() = dir.listFiles().filter(f => f.isFile &&
      f.getName.endsWith(".csv") && !f.getName.startsWith("part-seed-"))
    val preFold = live().map(f => f.getName -> f.length()).toMap
    live().length shouldBe 3
    graft.operators.Scale.compactCsv(spark, dir.toString, numFiles = 1) // v4
    live().length shouldBe 1
    ks("SELECT k FROM graft_tt.ns.c") shouldBe Seq("0", "1", "2")
    ks("SELECT k FROM graft_tt.ns.c VERSION AS OF 3") shouldBe
      Seq("0", "1", "2")
    // the attic holds the original files byte-for-byte (same names and
    // lengths the live dir had before the fold; compaction also pins —
    // and retires — the header-only schema seed, exclude it)
    val attic = new java.io.File(s"$root/ns/c/_graft_attic/v0000000004")
    attic.listFiles().filter(f => f.getName.endsWith(".csv") &&
        !f.getName.startsWith("part-seed-"))
      .map(f => f.getName -> f.length()).toMap shouldBe preFold
  }

  test("streaming epochs commit versions; a mid-stream snapshot is stable") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.s (k STRING)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tt_ck")
      .toString
    val in = MemoryStream[String](spark)
    val q = in.toDF().toDF("k")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").toTable("graft_tt.ns.s")
    try {
      in.addData("1"); q.processAllAvailable()
      in.addData("2"); q.processAllAvailable()
    } finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(s"$root/ns/s")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val cur = QuirkCsvVersions.currentVersion(fs,
      new org.apache.hadoop.fs.Path(s"$root/ns/s"))
    cur should be >= 2L
    ks(s"SELECT k FROM graft_tt.ns.s VERSION AS OF 1") shouldBe Seq("1")
    ks(s"SELECT k FROM graft_tt.ns.s") shouldBe Seq("1", "2")
  }

  test("TIMESTAMP AS OF resolves the greatest version at or before the " +
      "stamp") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.ts (k STRING)")
    Seq("1").toDF("k").writeTo("graft_tt.ns.ts").append() // v1
    Thread.sleep(15)
    val between = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(15)
    Seq("2").toDF("k").writeTo("graft_tt.ns.ts").append() // v2
    ks(s"SELECT k FROM graft_tt.ns.ts TIMESTAMP AS OF '$between'") shouldBe
      Seq("1")
    val now = new java.sql.Timestamp(System.currentTimeMillis() + 1000)
    ks(s"SELECT k FROM graft_tt.ns.ts TIMESTAMP AS OF '$now'") shouldBe
      Seq("1", "2")
  }

  test("vacuum drops attic generations at/below the horizon and pins it: " +
      "older snapshots fail loudly, newer ones keep working") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.v (k STRING)")
    Seq("1").toDF("k").writeTo("graft_tt.ns.v").append()  // v1
    spark.sql("DELETE FROM graft_tt.ns.v WHERE k = '1'")  // v2 retires v1's file
    Seq("2").toDF("k").writeTo("graft_tt.ns.v").append()  // v3
    spark.sql("DELETE FROM graft_tt.ns.v WHERE k = '2'")  // v4 retires v3's file
    ks("SELECT k FROM graft_tt.ns.v VERSION AS OF 1") shouldBe Seq("1")
    val p = new org.apache.hadoop.fs.Path(s"$root/ns/v")
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val horizon = QuirkCsvVersions.vacuum(fs, p, retainLast = 1)
    horizon shouldBe 3L
    // v1 needed attic v2 (<= horizon, dropped) -> loud
    an[Exception] should be thrownBy
      ks("SELECT k FROM graft_tt.ns.v VERSION AS OF 1")
    // v3 needs attic v4 (> horizon, retained) -> still served
    ks("SELECT k FROM graft_tt.ns.v VERSION AS OF 3") shouldBe Seq("2")
    ks("SELECT k FROM graft_tt.ns.v") shouldBe Seq()
    // history metadata survives the vacuum
    QuirkCsvVersions.history(spark, s"$root/ns/v").count() shouldBe 4L
  }

  test("TBLPROPERTIES('versioning'='false') opts out: mutations delete " +
      "physically, no log, no attic") {
    root
    spark.sql("""CREATE TABLE graft_tt.ns.nv (k STRING)
      TBLPROPERTIES ('versioning'='false')""")
    Seq("1").toDF("k").writeTo("graft_tt.ns.nv").append()
    spark.sql("DELETE FROM graft_tt.ns.nv WHERE k = '1'")
    val d = new java.io.File(s"$root/ns/nv")
    d.listFiles().map(_.getName) should not contain
      QuirkCsvVersions.LogDirName
    d.listFiles().map(_.getName) should not contain
      QuirkCsvVersions.AtticDirName
    an[Exception] should be thrownBy
      ks("SELECT k FROM graft_tt.ns.nv VERSION AS OF 0")
  }

  test("metadata-only aggregates serve append-only snapshots exactly and " +
      "degrade to a scan the moment a snapshot needs the attic") {
    root
    spark.sql("CREATE TABLE graft_tt.ns.m (k STRING)")
    Seq("1", "2").toDF("k").writeTo("graft_tt.ns.m").append() // v1
    Seq("3").toDF("k").writeTo("graft_tt.ns.m").append()      // v2
    // snapshot v1 is a pure SUBSET of live files: per-file sidecar rows
    // answer COUNT(*) without reading data
    spark.sql("SELECT COUNT(*) AS c FROM graft_tt.ns.m VERSION AS OF 1")
      .collect()(0).getLong(0) shouldBe 2L
    spark.sql("DELETE FROM graft_tt.ns.m WHERE k = '1'")      // v3 (COW)
    // v2's snapshot now needs attic files (no sidecar entries) — the
    // answer must still be exact, via the scan fallback
    spark.sql("SELECT COUNT(*) AS c FROM graft_tt.ns.m VERSION AS OF 2")
      .collect()(0).getLong(0) shouldBe 3L
  }
}
