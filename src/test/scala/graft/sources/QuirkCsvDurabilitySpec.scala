package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Durability and staleness contracts of the graftcsv source/sink:
  * batch task atomicity (attempt tmp + rename-on-commit), the
  * live-sink-safe compaction protocol (pin → append → swap with a
  * crash-recoverable intent), latin-1 write validation, header-name
  * collision handling, the no-backing-file zero-partial for global
  * pushed aggregates, and the (length, mtime) zone-map staleness key. */
class QuirkCsvDurabilitySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"dur_$tag").toString

  private def visibleCsvs(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
      .map(_.getName).toSeq.sorted

  private def row(vs: String*): GenericInternalRow =
    new GenericInternalRow(
      vs.map(v => if (v == null) null else UTF8String.fromString(v))
        .toArray[Any])

  test("batch task output is invisible until DataWriter.commit") {
    val dir = freshDir("atomic")
    val factory =
      new QuirkCsvWriterFactory(dir, Array("k", "v"), header = true, "jobA")
    val w = factory.createWriter(partitionId = 0, taskId = 7L)
    w.write(row("a", "1"))
    // pre-commit: the attempt tmp is hidden — no reader-visible file
    visibleCsvs(dir) shouldBe Seq.empty
    val msg = w.commit().asInstanceOf[QuirkCsvCommit]
    visibleCsvs(dir) shouldBe Seq("part-jobA-00000.csv")
    new org.apache.hadoop.fs.Path(msg.file).getName shouldBe
      "part-jobA-00000.csv"
    // an aborted attempt leaves nothing behind at all
    val w2 = factory.createWriter(partitionId = 1, taskId = 9L)
    w2.write(row("b", "2"))
    w2.abort()
    visibleCsvs(dir) shouldBe Seq("part-jobA-00000.csv")
    Option(new java.io.File(dir).listFiles()).get
      .count(_.getName.contains("attempt")) shouldBe 0
  }

  test("a speculative retry replaces its partition's file, not duplicates") {
    val dir = freshDir("spec")
    val factory =
      new QuirkCsvWriterFactory(dir, Array("k"), header = true, "jobB")
    val first = factory.createWriter(0, taskId = 1L)
    first.write(row("old"))
    first.commit()
    // a replayed attempt of the SAME partition renames over the final
    // name — attempt-stable naming, one file per partition
    val retry = factory.createWriter(0, taskId = 2L)
    retry.write(row("new"))
    retry.commit()
    visibleCsvs(dir) shouldBe Seq("part-jobB-00000.csv")
    col1(spark.read.format("graftcsv").load(dir)) shouldBe Seq("new")
  }

  test("compaction: epochs committed after the pin survive the swap") {
    val dir = freshDir("race")
    Seq("a", "b", "c").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    Seq("d", "e").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    // pin the snapshot the compaction will read…
    val pinned = QuirkCsvMaintenance.dataFileNames(dir)
    pinned.size shouldBe 2
    // …then a LIVE sink commits another epoch between pin and compaction
    Seq("late1", "late2").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    QuirkCsvMaintenance.compactPinned(spark, dir, pinned, numFiles = 1)
    // the late epoch's rows survive; the pinned originals are folded
    col1(spark.read.format("graftcsv").load(dir)) shouldBe
      Seq("a", "b", "c", "d", "e", "late1", "late2")
    // 1 folded file + the untouched late file
    QuirkCsvMaintenance.dataFileNames(dir).size shouldBe 2
    // and the sidecar carries no entry for a deleted original
    val zm = QuirkCsv.loadZoneMap(dir)
    zm.keySet.foreach(n =>
      QuirkCsvMaintenance.dataFileNames(dir) should contain(n))
  }

  /** Reproduce compactPinned up to the moment the intent becomes
    * durable: fold committed into the hidden tmp dir + the two-set
    * intent in place, swap never ran (driver died). Returns the fold's
    * folded file names. */
  private def foldWithIntent(dir: String, pinned: Seq[String]): Seq[String] = {
    val tmp = s"$dir/${QuirkCsvMaintenance.TmpDirName}"
    spark.read.format("graftcsv")
      .option("pinnedFiles", QuirkCsv.encodePinned(pinned)).load(dir)
      .repartition(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(tmp)
    val folded = QuirkCsvMaintenance.dataFileNames(tmp)
    val out = new java.io.PrintWriter(
      new java.io.File(dir, "_graft_compact_intent.tsv"), "ISO-8859-1")
    out.println("graft-compact-intent-v2")
    folded.foreach(n => out.println("F " + QuirkCsv.encodePinned(Seq(n))))
    pinned.foreach(n => out.println("D " + QuirkCsv.encodePinned(Seq(n))))
    out.println("end")
    out.close()
    folded
  }

  test("a crash between intent and swap is recovered, not duplicated") {
    val dir = freshDir("crash")
    Seq("x", "y").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val pinned = QuirkCsvMaintenance.dataFileNames(dir)
    foldWithIntent(dir, pinned)
    val intent = new java.io.File(dir, "_graft_compact_intent.tsv")
    // mid-crash state: folded copies hidden in tmp, originals intact —
    // a reader sees exactly the original rows, never duplicates
    spark.read.format("graftcsv").load(dir).count() shouldBe 2
    // the next maintenance run completes the pending swap FIRST — its
    // own pin then sees just the one folded file
    val (before, after) =
      graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    before shouldBe 1L
    intent.exists() shouldBe false
    new java.io.File(dir, QuirkCsvMaintenance.TmpDirName)
      .exists() shouldBe false
    col1(spark.read.format("graftcsv").load(dir)) shouldBe Seq("x", "y")
    after shouldBe 1L
  }

  test("a table truncated AFTER a compaction crash is NOT resurrected " +
      "by the recovered intent") {
    val dir = freshDir("trunc")
    Seq("x", "y").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val pinned = QuirkCsvMaintenance.dataFileNames(dir)
    foldWithIntent(dir, pinned)
    // between the crash and the next maintenance run, the user empties
    // the table (TRUNCATE / unconditional DELETE removes the data files)
    pinned.foreach { n =>
      new java.io.File(dir, n).delete()
      new java.io.File(dir, s".$n.crc").delete()
    }
    // recovery must DISCARD the stale fold (none of the intent's pinned
    // originals nor folded files remain) — completing it would move the
    // folded copies in and resurrect every deleted row
    val (before, after) =
      graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    before shouldBe 0L
    after shouldBe 0L
    visibleCsvs(dir) shouldBe Seq.empty
    new java.io.File(dir, "_graft_compact_intent.tsv").exists() shouldBe false
    new java.io.File(dir, QuirkCsvMaintenance.TmpDirName)
      .exists() shouldBe false
  }

  test("a crash AFTER the fold commit but BEFORE the intent leaves no " +
      "permanent duplicates (the orphaned fold is discarded, not re-read)") {
    val dir = freshDir("orphan")
    Seq("x", "y").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val pinned = QuirkCsvMaintenance.dataFileNames(dir)
    // the crash point the historic append-into-place protocol could not
    // survive: folded copies committed, no intent recorded — under the
    // old protocol the next run pinned originals PLUS folded copies and
    // baked duplicates into the output forever
    val tmp = s"$dir/${QuirkCsvMaintenance.TmpDirName}"
    spark.read.format("graftcsv")
      .option("pinnedFiles", QuirkCsv.encodePinned(pinned)).load(dir)
      .repartition(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(tmp)
    // the fold is invisible to readers (hidden dir)
    spark.read.format("graftcsv").load(dir).count() shouldBe 2
    val (_, after) =
      graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    col1(spark.read.format("graftcsv").load(dir)) shouldBe Seq("x", "y")
    after shouldBe 1L
    new java.io.File(dir, QuirkCsvMaintenance.TmpDirName)
      .exists() shouldBe false
  }

  test("a v1 intent from a pre-upgrade crash is still completed, not refused") {
    // the OLD protocol appended folded copies INTO the directory before
    // its intent; a crash between its intent and its deletes left
    // originals + folded copies + a v1 intent listing the originals.
    // The upgrade must keep that directory self-healing.
    val dir = freshDir("v1intent")
    Seq("x", "y").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val pinned = QuirkCsvMaintenance.dataFileNames(dir)
    spark.read.format("graftcsv")
      .option("pinnedFiles", QuirkCsv.encodePinned(pinned)).load(dir)
      .repartition(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val intent = new java.io.File(dir, "_graft_compact_intent.tsv")
    val out = new java.io.PrintWriter(intent, "ISO-8859-1")
    out.println("graft-compact-intent-v1")
    pinned.foreach(n => out.println(QuirkCsv.encodePinned(Seq(n))))
    out.close()
    // mid-crash v1 state: originals + folded copy => transient duplicates
    spark.read.format("graftcsv").load(dir).count() shouldBe 4
    val (_, after) =
      graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    intent.exists() shouldBe false
    col1(spark.read.format("graftcsv").load(dir)) shouldBe Seq("x", "y")
    after shouldBe 1L
  }

  test("an unrecognized or truncated intent fails LOUDLY, file left in place") {
    val dir = freshDir("badintent")
    Seq("x").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val intent = new java.io.File(dir, "_graft_compact_intent.tsv")
    // future/unknown version: the only record of a half-done swap —
    // deleting it with an empty name list would leave permanent
    // duplicates, so compaction must refuse and keep the file
    val out = new java.io.PrintWriter(intent, "ISO-8859-1")
    out.println("graft-compact-intent-v99")
    out.println("F something")
    out.close()
    val e = intercept[IllegalArgumentException] {
      graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    }
    e.getMessage should include("unrecognized compaction intent header")
    intent.exists() shouldBe true
    // truncated v2 (no end marker — e.g. a torn non-atomic write):
    // equally refused
    val out2 = new java.io.PrintWriter(intent, "ISO-8859-1")
    out2.println("graft-compact-intent-v2")
    out2.println("D " + QuirkCsv.encodePinned(Seq("part-x-00000.csv")))
    out2.close()
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Scale.compactCsv(spark, dir, numFiles = 1)
    }
    e2.getMessage should include("truncated")
    intent.exists() shouldBe true
    // the data was never touched by either refusal
    col1(spark.read.format("graftcsv").load(dir)) shouldBe Seq("x")
  }

  test("non-latin-1 characters fail the write loudly, not as '?'") {
    intercept[IllegalArgumentException] {
      QuirkCsv.formatField("price: 10€")
    }.getMessage should include("latin-1")
    // the full latin-1 range still round-trips
    QuirkCsv.formatField("déjà ÿ") shouldBe "déjà ÿ"
    val dir = freshDir("nonlatin")
    val e = intercept[Exception] {
      Seq("ok", "bad €").toDF("v").coalesce(1)
        .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    }
    // the task failure carries the loud dialect error
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    messages(e).mkString("\n") should include("latin-1")
  }

  test("colliding normalized headers read from distinct positions") {
    val dir = freshDir("collide")
    val f = new java.io.File(dir, "data.csv")
    val out = new java.io.PrintWriter(f, "ISO-8859-1")
    out.println("Row ID,RowID,Qty")
    out.println("first,second,3")
    out.close()
    val back = spark.read.format("graftcsv").load(f.getPath)
    back.columns.toSeq shouldBe Seq("RowID", "RowID_1", "Qty")
    val r = back.collect().head
    r.getString(0) shouldBe "first"
    r.getString(1) shouldBe "second"
    r.getString(2) shouldBe "3"
  }

  test("global COUNT over an empty directory is 0, not NULL") {
    val schema = new StructType().add("k", StringType)
    val empty = freshDir("cnt_empty")
    spark.read.format("graftcsv").schema(schema).load(empty)
      .count() shouldBe 0L
    // a directory holding only zero-byte files plans no real split either
    val zeroes = freshDir("cnt_zero")
    new java.io.File(zeroes, "a.csv").createNewFile()
    spark.read.format("graftcsv").schema(schema).load(zeroes)
      .count() shouldBe 0L
    // grouped aggregates still return no rows (zero-partial is
    // global-only)
    spark.read.format("graftcsv").schema(schema).load(empty)
      .groupBy("k").count().count() shouldBe 0L
  }

  test("same-length out-of-band rewrite invalidates the zone entry") {
    val dir = freshDir("mtime")
    Seq(("k1", "aaaa")).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val victim = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".csv")).get
    // rewrite with the SAME byte length but a different value: under a
    // length-only staleness key the stale [aaaa, aaaa] bounds would
    // wrongly prune the probe for "zzzz"
    val content = java.nio.file.Files.readString(victim.toPath,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    java.nio.file.Files.writeString(victim.toPath,
      content.replace("aaaa", "zzzz"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // force an mtime the sidecar can't have recorded (coarse-clock FS)
    victim.setLastModified(victim.lastModified() + 5000)
    new java.io.File(dir, s".${victim.getName}.crc").delete()
    val hit = spark.read.format("graftcsv").load(dir)
      .filter(col("v") === "zzzz")
    hit.rdd.getNumPartitions shouldBe 1 // distrusted entry => file read
    hit.count() shouldBe 1
  }
}
