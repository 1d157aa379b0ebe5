package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.QuirkCsvVersions

/** Hardening of the versioning tier found in review: atomic version
  * allocation under concurrent commits, phantom-sweep retirement on
  * versioned tables, vacuum pin-before-destroy ordering, and safe
  * identifier validation on the index operators. */
class QuirkCsvVersionHardeningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_vh").toString
    spark.conf.set("spark.sql.catalog.graft_vh",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_vh.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_vh.ns")
    r
  }

  test("concurrent commits allocate DISTINCT versions; none is lost") {
    root
    spark.sql("CREATE TABLE graft_vh.ns.cc (k STRING)")
    val dir = new Path(s"$root/ns/cc")
    val fs = dir.getFileSystem(new Configuration())
    // seed 8 live files to retire concurrently
    (0 until 8).foreach { i =>
      val f = fs.create(new Path(dir, s"part-x$i.csv"), true)
      f.write(s"k\n$i\n".getBytes("ISO-8859-1")); f.close()
    }
    val versions = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val threads = (0 until 8).map { i =>
      new Thread(() => versions.add(
        QuirkCsvVersions.commit(fs, dir, s"t$i",
          Nil, Seq(new Path(dir, s"part-x$i.csv")))))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    versions.size() shouldBe 8
    val log = QuirkCsvVersions.readLog(fs, dir)
    log.size shouldBe 8
    log.map(_.version).toSet shouldBe versions.asInstanceOf[java.util.Set[Long]]
      .toArray.map(_.asInstanceOf[Long]).toSet
    // every retirement landed in its OWN attic generation
    log.foreach { e =>
      e.retired.size shouldBe 1
      fs.exists(new Path(dir,
        f"_graft_attic/v${e.version}%010d/${e.retired.head}")) shouldBe true
    }
  }

  test("a zero-length claimed entry consumes its number and carries no " +
      "events; snapshots stay serveable") {
    root
    spark.sql("CREATE TABLE graft_vh.ns.cl (k STRING)")
    Seq("1").toDF("k").writeTo("graft_vh.ns.cl").append() // v1
    val dir = new Path(s"$root/ns/cl")
    val fs = dir.getFileSystem(new Configuration())
    // simulate a crashed claim: exclusive create, no content
    fs.create(new Path(dir, "_graft_versions/v-0000000002.tsv"), false)
      .close()
    QuirkCsvVersions.currentVersion(fs, dir) shouldBe 2L
    QuirkCsvVersions.readLog(fs, dir).map(_.version) shouldBe Seq(1L)
    // the claimed-but-empty version reads exactly like its predecessor
    spark.sql("SELECT k FROM graft_vh.ns.cl VERSION AS OF 2")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("1")
    // the next commit claims PAST the crashed number
    Seq("2").toDF("k").writeTo("graft_vh.ns.cl").append()
    QuirkCsvVersions.currentVersion(fs, dir) shouldBe 3L
  }

  test("streaming phantom sweep RETIRES on versioned tables: a replayed " +
      "epoch's orphan is moved to the attic, history stays closed") {
    root
    spark.sql("CREATE TABLE graft_vh.ns.s (k STRING)")
    val dir = s"$root/ns/s"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vh_ck")
      .toString
    val in = MemoryStream[String](spark)
    def start(cp: String) = in.toDF().toDF("k")
      .writeStream.option("checkpointLocation", cp)
      .outputMode("append").toTable("graft_vh.ns.s")
    val q = start(ckpt)
    try { in.addData("1"); q.processAllAvailable() }
    finally { q.stop(); q.awaitTermination() }
    val fs = new Path(dir).getFileSystem(new Configuration())
    val epochFile = fs.listStatus(new Path(dir))
      .map(_.getPath.getName)
      .find(n => n.contains("-epoch-") && n.endsWith(".csv")).get
    // simulate the died-driver window: a same-epoch file from a
    // different task partitioning, already RECORDED as added by the
    // first instance's commit
    val phantomName = epochFile.replaceAll("-(\\d{5})\\.csv$", "-99998.csv")
    val src = fs.open(new Path(dir, epochFile))
    val buf = new Array[Byte](
      fs.getFileStatus(new Path(dir, epochFile)).getLen.toInt)
    src.readFully(buf); src.close()
    val outF = fs.create(new Path(dir, phantomName), true)
    outF.write(buf); outF.close()
    QuirkCsvVersions.commit(fs, new Path(dir), "streamEpoch-0",
      Seq(new Path(dir, phantomName)), Nil)
    // force the replay: restart from a checkpoint COPY that lacks the
    // sink commit record of epoch 0 (Spark 4's in-place commit-log guard
    // would flag a same-path deletion as concurrent use)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_vh_ck2")
      .toString
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        src.listFiles().foreach(f =>
          copyTree(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    copyTree(new java.io.File(ckpt), new java.io.File(ckpt2))
    new java.io.File(s"$ckpt2/commits/0").delete() shouldBe true
    // the checksum sidecar too — a stale .0.crc makes the replacement
    // commit-log rename fail, which Spark reports as concurrent use
    new java.io.File(s"$ckpt2/commits/.0.crc").delete()
    val q2 = start(ckpt2)
    try q2.processAllAvailable() finally q2.stop()
    // swept — but into the attic, with a version entry, not destroyed
    fs.exists(new Path(dir, phantomName)) shouldBe false
    val log = QuirkCsvVersions.readLog(fs, new Path(dir))
    val retireEntry = log.find(_.retired.contains(phantomName))
    retireEntry.isDefined shouldBe true
    fs.exists(new Path(dir,
      f"_graft_attic/v${retireEntry.get.version}%010d/$phantomName")
    ) shouldBe true
    // every version in history still reconstructs without a
    // "history modified out-of-band" error
    (0L to QuirkCsvVersions.currentVersion(fs, new Path(dir))).foreach {
      v =>
        spark.read.format("graftcsv").option("asOfVersion", v.toString)
          .load(dir).count() should be >= 0L
    }
    spark.table("graft_vh.ns.s").collect()
      .map(_.getString(0)).toSeq.sorted shouldBe Seq("1")
  }

  test("retire-alias replace: a re-landed final name keeps its PRIOR " +
      "bytes time-travelable (R before A within one version)") {
    root
    spark.sql("CREATE TABLE graft_vh.ns.ra (k STRING)")
    val dir = new Path(s"$root/ns/ra")
    val fs = dir.getFileSystem(new Configuration())
    // v1: final file F lands with bytes OLD and is recorded as added
    val f = new Path(dir, "part-replay-00000.csv")
    val w1 = fs.create(f, true)
    w1.write("k\nOLD\n".getBytes("ISO-8859-1")); w1.close()
    QuirkCsvVersions.commit(fs, dir, "streamEpoch-0", Seq(f), Nil) shouldBe 1L
    // a replay displaces F exactly as QuirkCsvRenamingWriter would:
    // rename aside, land new bytes, then the epoch commit retires the
    // aside UNDER F's relpath while adding the new F in the same version
    val aside = new Path(dir, ".part-replay-00000.csv.pre-replay")
    require(fs.rename(f, aside))
    val w2 = fs.create(f, true)
    w2.write("k\nNEW\n".getBytes("ISO-8859-1")); w2.close()
    QuirkCsvVersions.commit(fs, dir, "streamEpoch-0", Seq(f), Nil,
      retiredAliases = Seq((aside, "part-replay-00000.csv"))) shouldBe 2L
    // the attic holds the OLD bytes under the ORIGINAL relpath
    fs.exists(new Path(dir,
      "_graft_attic/v0000000002/part-replay-00000.csv")) shouldBe true
    def at(v: Long) = spark.read.format("graftcsv")
      .option("asOfVersion", v.toString).load(dir.toString)
      .collect().map(_.getString(0)).toSeq
    at(1) shouldBe Seq("OLD")
    at(2) shouldBe Seq("NEW")
    spark.table("graft_vh.ns.ra").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("NEW")
  }

  test("an UNSEALED v2 entry (crashed direct-write commit) consumes its " +
      "number, carries no events, and is never served as history") {
    root
    spark.sql("CREATE TABLE graft_vh.ns.us (k STRING)")
    Seq("1").toDF("k").writeTo("graft_vh.ns.us").append() // v1
    val dir = new Path(s"$root/ns/us")
    val fs = dir.getFileSystem(new Configuration())
    // a torn v2 entry: header + one event line, NO seal (crash before E)
    val torn = fs.create(
      new Path(dir, "_graft_versions/v-0000000002.tsv"), false)
    torn.write(("graft-version-v2\tappend\t123\nA\tpart-ghost.csv\n")
      .getBytes("ISO-8859-1"))
    torn.close()
    QuirkCsvVersions.currentVersion(fs, dir) shouldBe 2L
    QuirkCsvVersions.readLog(fs, dir).map(_.version) shouldBe Seq(1L)
    // the ghost add is NOT served: v2 reads like v1, no missing-file error
    spark.sql("SELECT k FROM graft_vh.ns.us VERSION AS OF 2")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("1")
    // a truncated HEADER (first flush in flight) is in-progress, not loud
    val torn2 = fs.create(
      new Path(dir, "_graft_versions/v-0000000003.tsv"), false)
    torn2.write("graft-vers".getBytes("ISO-8859-1")); torn2.close()
    QuirkCsvVersions.readLog(fs, dir).map(_.version) shouldBe Seq(1L)
    // the next commit claims PAST both torn numbers and seals normally
    Seq("2").toDF("k").writeTo("graft_vh.ns.us").append()
    QuirkCsvVersions.currentVersion(fs, dir) shouldBe 4L
    QuirkCsvVersions.readLog(fs, dir).map(_.version) shouldBe Seq(1L, 4L)
  }

  test("a seal line torn mid-write reads as an unsealed claim, never " +
      "as corruption; a seal claiming MORE events than present is loud") {
    root
    spark.sql("CREATE TABLE graft_vh.ns.ts (k STRING)")
    Seq("1").toDF("k").writeTo("graft_vh.ns.ts").append() // v1
    val dir = new Path(s"$root/ns/ts")
    val fs = dir.getFileSystem(new Configuration())
    def tornEntry(v: Long, tail: String): Unit = {
      val o = fs.create(
        new Path(dir, f"_graft_versions/v-$v%010d.tsv"), false)
      o.write(("graft-version-v2\tappend\t123\n" +
        "A\tpart-ghost-a.csv\nA\tpart-ghost-b.csv\n" + tail)
        .getBytes("ISO-8859-1"))
      o.close()
    }
    // seal torn right after the tab: 'E\t' (no digits yet)
    tornEntry(2L, "E\t")
    // seal torn MID-DIGITS: 'E\t1' is a prefix of the true 'E\t2' ...
    // any numeric prefix is <= the true count, so < events = torn
    tornEntry(3L, "E\t1")
    // both read as unsealed claims: numbers consumed, no events served
    QuirkCsvVersions.currentVersion(fs, dir) shouldBe 3L
    QuirkCsvVersions.readLog(fs, dir).map(_.version) shouldBe Seq(1L)
    spark.sql("SELECT k FROM graft_vh.ns.ts VERSION AS OF 3")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("1")
    // later commits proceed past the torn claims
    Seq("2").toDF("k").writeTo("graft_vh.ns.ts").append()
    QuirkCsvVersions.readLog(fs, dir).map(_.version) shouldBe Seq(1L, 4L)
    // a seal counting MORE events than the file holds cannot come from
    // crash truncation (the seal is written last) — that stays loud
    tornEntry(5L, "E\t7\n")
    val ex = intercept[Exception] { QuirkCsvVersions.readLog(fs, dir) }
    ex.getMessage should include("history corrupted")
  }

  test("unsafe identifiers are rejected before any SQL text is built") {
    root
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    an[Exception] should be thrownBy
      graft.operators.NearDupIndex.build(spark, "graft_vh", "ns",
        "bad'name", docs, "doc_id", "text")
    graft.operators.NearDupIndex.build(spark, "graft_vh", "ns", "ok",
      docs, "doc_id", "text")
    an[Exception] should be thrownBy
      graft.operators.NearDupIndex.indexBatch(spark, "graft_vh", "ns",
        "ok", docs, "doc_id", "text", "b'2026")
    an[Exception] should be thrownBy
      graft.operators.NearDupIndex.dropBatch(spark, "graft_vh", "ns",
        "ok", "x') ; DROP TABLE y --")
  }
}
