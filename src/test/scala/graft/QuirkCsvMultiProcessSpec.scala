package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.QuirkCsvVersions

/** CROSS-PROCESS writers on ONE versioned table — the first real-cluster
  * scenario beyond a single driver: separate JVMs (ProcessBuilder, real
  * processes, no shared locks) commit interleaved mutations against the
  * same root while this JVM commits and snapshot-reads concurrently.
  * The exclusive-create claim plus the direct-write sealed entries must
  * yield a linearizable history: every commit gets its own version
  * number, no number is lost or shared, every committed file survives,
  * and a reader never observes a torn entry (in-flight claims read as
  * "no events yet", never as corruption). */
class QuirkCsvMultiProcessSpec extends SparkSpec {

  private val Writers = 3
  private val CommitsEach = 12

  test("interleaved cross-process commits: distinct dense-enough " +
      "versions, no lost files, live snapshot reads never tear") {
    val root = java.nio.file.Files.createTempDirectory("graft_mp").toString
    val dir = new Path(root)
    val fs = dir.getFileSystem(new Configuration())
    fs.mkdirs(dir)
    QuirkCsvVersions.writeMarker(fs, dir)

    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    val children = (1 to Writers).map { w =>
      new ProcessBuilder(javaBin, "-cp", cp,
        "graft.sources.VersionCommitStorm", root, w.toString,
        CommitsEach.toString)
        .redirectErrorStream(true).start()
    }
    // the PARENT commits too (writer 0), interleaved with the children —
    // same-process lock + cross-process claim must compose
    val parentVersions = scala.collection.mutable.ArrayBuffer.empty[Long]
    val readErrors = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    (1 to CommitsEach).foreach { i =>
      val f = new Path(dir, s"part-w0-$i.csv")
      val out = fs.create(f, false)
      out.write(s"k\nw0-$i\n".getBytes("ISO-8859-1")); out.close()
      parentVersions += QuirkCsvVersions.commit(fs, dir, s"append-w0-$i",
        Seq(f), Nil)
      // live reads DURING the storm: readLog must skip in-flight claims,
      // and a snapshot at any committed version must resolve — a torn
      // entry surfacing as corruption here is the bug the sealed-entry
      // format exists to prevent
      try {
        val log = QuirkCsvVersions.readLog(fs, dir)
        log.map(_.version).distinct.size shouldBe log.size
        val live = QuirkCsvVersions.liveListing(root)
        QuirkCsvVersions.snapshotListing(fs, dir, parentVersions.last, live)
      } catch { case t: Throwable => readErrors += t }
    }
    val childVersions = children.flatMap { p =>
      val out = scala.io.Source.fromInputStream(p.getInputStream)
        .getLines().filter(_.startsWith("COMMITTED "))
        .map(_.stripPrefix("COMMITTED ").toLong).toVector
      p.waitFor() shouldBe 0
      out
    }
    readErrors.toSeq shouldBe Seq.empty
    val all = parentVersions.toVector ++ childVersions
    all.size shouldBe (Writers + 1) * CommitsEach
    // linearizable: every commit owns a DISTINCT version number
    all.distinct.size shouldBe all.size
    // the final log serves every commit (claims that lost a race and
    // retried consume nothing; sealed entries only)
    val log = QuirkCsvVersions.readLog(fs, dir)
    log.map(_.version).toSet shouldBe all.toSet
    // no lost files: every committed add is live and readable
    val liveNames = QuirkCsvVersions.liveListing(root)
      .map(f => new Path(f.path).getName).toSet
    (0 to Writers).foreach { w =>
      (1 to CommitsEach).foreach { i =>
        liveNames should contain(s"part-w$w-$i.csv")
      }
    }
    // full-history audit: every version reconstructs (no torn entries,
    // no out-of-band diagnosis), and the final snapshot is the union
    val cur = QuirkCsvVersions.currentVersion(fs, dir)
    val live = QuirkCsvVersions.liveListing(root)
    (0L to cur).foreach { v =>
      QuirkCsvVersions.snapshotListing(fs, dir, v, live)
    }
    QuirkCsvVersions.snapshotListing(fs, dir, cur, live).size shouldBe
      (Writers + 1) * CommitsEach
  }

  test("cross-process compaction vs appender: the folded table loses " +
      "no rows and history stays serveable") {
    val root = java.nio.file.Files.createTempDirectory("graft_mp2").toString
    val dir = new Path(root)
    val fs = dir.getFileSystem(new Configuration())
    fs.mkdirs(dir)
    QuirkCsvVersions.writeMarker(fs, dir)
    // seed some files so the compactor has work
    (1 to 6).foreach { i =>
      val f = new Path(dir, s"part-base0-$i.csv")
      val out = fs.create(f, false)
      out.write(s"k\nbase-$i\n".getBytes("ISO-8859-1")); out.close()
      QuirkCsvVersions.commit(fs, dir, s"base-$i", Seq(f), Nil)
    }
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    // a SECOND PROCESS appends while this process compacts
    val child = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.sources.VersionCommitStorm", root, "9", "8")
      .redirectErrorStream(true).start()
    graft.sources.QuirkCsvMaintenance.compactCsv(spark, root, 1)
    child.waitFor() shouldBe 0
    // every row from both writers survives — the compactor folded its
    // PINNED snapshot, the concurrent appends landed beside it
    val rows = spark.read.format("graftcsv").load(root)
      .collect().map(_.getString(0)).toSet
    (1 to 6).foreach(i => rows should contain(s"base-$i"))
    (1 to 8).foreach(i => rows should contain(s"w9-$i"))
    // history: every surviving version reconstructs without corruption
    val cur = QuirkCsvVersions.currentVersion(fs, dir)
    val live = QuirkCsvVersions.liveListing(root)
    (0L to cur).foreach { v =>
      QuirkCsvVersions.snapshotListing(fs, dir, v, live)
    }
  }

}
