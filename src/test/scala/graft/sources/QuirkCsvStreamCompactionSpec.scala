package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

/** The compaction↔streaming-read restart contract: the micro-batch
  * stream persists its arrival order as a manifest in its checkpoint,
  * `compactCsv` records every fold's folded→replaced mapping in the
  * directory's hidden fold log, and a (re)started stream classifies
  * folded files by provenance — skip when their originals were already
  * consumed, read when never seen, fail LOUDLY when mixed or when an
  * uncommitted replay spans compacted-away files. Stream == batch across
  * any number of mid-stream compactions; no dupes, no loss. */
class QuirkCsvStreamCompactionSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      ("id\r\n" +: rows.map(_ + "\r\n")).mkString.getBytes(
        StandardCharsets.ISO_8859_1))

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"sc_$tag").toString

  private def outIds(out: String): Seq[String] =
    spark.read.format("graftcsv").load(out)
      .collect().map(_.getString(0)).toSeq.sorted

  test("restarted stream over a compacted dir is exactly-once, " +
      "including across CHAINED folds") {
    val src = freshDir("src"); val out = freshDir("out")
    val ckpt = freshDir("ckpt")
    def run(): Unit = {
      val q = spark.readStream.format("graftcsv").load(src)
        .writeStream.format("graftcsv")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeFile(src, "a.csv", Seq("1", "2"))
    writeFile(src, "b.csv", Seq("3"))
    run()
    outIds(out) shouldBe Seq("1", "2", "3")
    // compaction replaces the consumed files with one folded file...
    graft.operators.Scale.compactCsv(spark, src, numFiles = 1)
    writeFile(src, "c.csv", Seq("4"))
    // ...and the restarted stream must read ONLY the new file
    run()
    outIds(out) shouldBe Seq("1", "2", "3", "4")
    // chain: fold the fold (folded file + c into a second generation)
    graft.operators.Scale.compactCsv(spark, src, numFiles = 1)
    writeFile(src, "d.csv", Seq("5"))
    run()
    // the chained fold resolves through the log: F2 -> {F1, c} -> all
    // consumed -> skipped; only d arrives
    outIds(out) shouldBe Seq("1", "2", "3", "4", "5")
  }

  test("a LIVE stream skips the folded copy of files it already consumed") {
    val src = freshDir("lsrc"); val out = freshDir("lout")
    writeFile(src, "a.csv", Seq("1"))
    writeFile(src, "b.csv", Seq("2"))
    val q = spark.readStream.format("graftcsv").load(src)
      .writeStream.format("graftcsv")
      .option("path", out).option("checkpointLocation", freshDir("lck"))
      .start()
    try {
      q.processAllAvailable()
      graft.operators.Scale.compactCsv(spark, src, numFiles = 1)
      writeFile(src, "c.csv", Seq("3"))
      q.processAllAvailable()
      outIds(out) shouldBe Seq("1", "2", "3")
    } finally q.stop()
  }

  test("a FRESH stream over an already-compacted dir reads folded rows " +
      "exactly once") {
    val src = freshDir("fsrc"); val out = freshDir("fout")
    writeFile(src, "a.csv", Seq("1", "2"))
    writeFile(src, "b.csv", Seq("3"))
    graft.operators.Scale.compactCsv(spark, src, numFiles = 1)
    val q = spark.readStream.format("graftcsv").load(src)
      .writeStream.format("graftcsv")
      .option("path", out).option("checkpointLocation", freshDir("fck"))
      .start()
    try q.processAllAvailable() finally q.stop()
    outIds(out) shouldBe Seq("1", "2", "3")
  }

  // ---- unit-level windows on the stream class itself ----

  private def streamOver(dir: String, ckpt: String): QuirkCsvMicroBatchStream = {
    val m = new java.util.HashMap[String, String]()
    m.put("path", dir)
    val cis = new CaseInsensitiveStringMap(m)
    val schema = new QuirkCsvDataSource().inferSchema(cis)
    new QuirkCsvMicroBatchStream(schema, schema, Array.empty, cis,
      maxSplit = 128L * 1024 * 1024, header = true, excelCompat = false,
      checkpointLocation = ckpt)
  }

  test("replaying an UNCOMMITTED batch across a compaction fails loudly") {
    val src = freshDir("usrc"); val ckpt = freshDir("uck")
    writeFile(src, "a.csv", Seq("1"))
    // the stream observes the file (offset + manifest durable) but the
    // batch never commits; then compaction removes the original
    streamOver(src, ckpt).latestOffset()
      .asInstanceOf[QuirkCsvOffset].n shouldBe 1
    graft.operators.Scale.compactCsv(spark, src, numFiles = 1)
    val restarted = streamOver(src, ckpt)
    val e = intercept[IllegalStateException] {
      restarted.planInputPartitions(QuirkCsvOffset(0), QuirkCsvOffset(1))
    }
    e.getMessage should include("cannot replay")
    e.getMessage should include("a.csv")
  }

  test("a folded file MIXING consumed and never-seen originals fails loudly") {
    val src = freshDir("msrc"); val ckpt = freshDir("mck")
    writeFile(src, "a.csv", Seq("1"))
    val s = streamOver(src, ckpt)
    s.latestOffset().asInstanceOf[QuirkCsvOffset].n shouldBe 1
    // a second file lands WITHOUT the stream observing it, then both are
    // folded together: the folded file cannot be split at file granularity
    writeFile(src, "b.csv", Seq("2"))
    graft.operators.Scale.compactCsv(spark, src, numFiles = 1)
    val e = intercept[IllegalStateException] { s.latestOffset() }
    e.getMessage should include("mixes")
  }

  test("PARTITIONED catalog table: value-dir compaction between restarts " +
      "stays exactly-once") {
    val root = freshDir("proot"); val out = freshDir("pout")
    val ckpt = freshDir("pck")
    spark.conf.set("spark.sql.catalog.graft_sc",
      classOf[QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sc.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sc.ns")
    spark.sql("""CREATE TABLE graft_sc.ns.ev (id STRING, day STRING)
      PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft_sc.ns.ev VALUES ('1','d1')")
    spark.sql("INSERT INTO graft_sc.ns.ev VALUES ('2','d1'), ('3','d2')")
    def run(): Unit = {
      val q = spark.readStream.table("graft_sc.ns.ev")
        .writeStream.format("graftcsv")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // d1 accumulated two epoch files -> compact just that value dir
    graft.operators.Scale.compactCsv(spark, s"$root/ns/ev/day=d1",
      numFiles = 1)
    spark.sql("INSERT INTO graft_sc.ns.ev VALUES ('4','d1'), ('5','d9')")
    run()
    spark.read.format("graftcsv").load(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("1", "d1"), ("2", "d1"), ("3", "d2"), ("4", "d1"), ("5", "d9"))
    spark.read.format("graftcsv").load(out).count() shouldBe 5L
  }
}
