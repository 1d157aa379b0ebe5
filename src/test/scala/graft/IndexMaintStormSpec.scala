package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexMaintStorm, IndexMaintenanceLock, NearDup, NearDupIndex}

/** CROSS-PROCESS index maintenance on ONE shared near-dup index: real
  * child JVMs (ProcessBuilder) storm `indexBatch` against the same
  * co-located index while the parent serves live reads. The
  * IndexMaintenanceLock must serialize the multi-step batch lands
  * (DELETE + append on the co-located layout): afterwards the index
  * holds exactly one copy of every batch, `params()` holds, and the
  * served candidates equal a from-scratch in-memory pairing over the
  * union corpus — no torn index, no interleaved steps. */
class IndexMaintStormSpec extends SparkSpec {
  import spark.implicits._

  private val Writers = 3
  private val BatchesEach = 3

  test("storming indexBatch from separate JVMs yields exactly one copy " +
      "of every batch; candidates equal the serial twin") {
    val root = java.nio.file.Files.createTempDirectory("graft_ims").toString
    spark.conf.set("spark.sql.catalog.graft_ims",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ims.root", root)
    val base = IndexMaintStorm.docsFor(0, 0).toDF("doc_id", "text")
    // co-located layout: the flavor whose batch land is MULTI-step
    // (delete + append) — the one a missing lock lets interleave.
    // maxBucket = 0 keeps the serial twin conf-independent.
    NearDupIndex.build(spark, "graft_ims", "ns", "idx", base,
      "doc_id", "text", maxBucket = 0L, joinBuckets = 4)

    // seed a CRASHED maintainer's stale marker (old mtime, no heartbeat)
    // in front of the storm: the children race its single-winner break —
    // exactly one may claim through it at a time, and the final index
    // must still equal the serial twin
    val staleMarker = new java.io.File(s"$root/ns/.graft-maint-idx.lock")
    java.nio.file.Files.writeString(staleMarker.toPath, "999 deadnonce 0")
    staleMarker.setLastModified(
      System.currentTimeMillis() - IndexMaintenanceLock.StaleLockMs - 60000)

    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    val children = (1 to Writers).map { w =>
      new ProcessBuilder(javaBin, "-Xmx1g", "-cp", cp,
        "graft.operators.IndexMaintStorm", root, w.toString,
        BatchesEach.toString)
        .redirectErrorStream(true).start()
    }
    // live serves DURING the storm: a read must never tear (a transient
    // between a batch's delete and its re-append is fine — convergence,
    // not corruption)
    val readErrors = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    (1 to 10).foreach { _ =>
      try {
        NearDupIndex.allCandidatePairs(spark, "graft_ims", "ns", "idx")
          .count()
      } catch { case t: Throwable => readErrors += t }
      Thread.sleep(500)
    }
    val landed = children.flatMap { p =>
      val out = scala.io.Source.fromInputStream(p.getInputStream)
        .getLines().filter(_.startsWith("INDEXED "))
        .map(_.stripPrefix("INDEXED ")).toVector
      p.waitFor() shouldBe 0
      out
    }
    readErrors.toSeq shouldBe Seq.empty
    landed.size shouldBe Writers * BatchesEach
    landed.distinct.size shouldBe landed.size

    // exactly one copy of every batch: 3 docs base + 3 per batch, each
    // doc contributing numBands(=4) band rows — duplicates from an
    // interleaved delete/append would break the exact count
    val bands = NearDupIndex.bands(spark, "graft_ims", "ns", "idx")
    val expectedDocs = 3 + Writers * BatchesEach * 3 // base docsFor(0,0)=3
    bands.count() shouldBe expectedDocs * 4L
    bands.groupBy(col("batch")).count().collect()
      .foreach(_.getLong(1) shouldBe 3L * 4L)
    NearDupIndex.params(spark, "graft_ims", "ns", "idx") shouldBe
      ((3, 12, 3))

    // the served pairing equals the in-memory twin over the union corpus
    val union = (IndexMaintStorm.docsFor(0, 0) ++
      (1 to Writers).flatMap(w => (1 to BatchesEach)
        .flatMap(i => IndexMaintStorm.docsFor(w, i))))
      .toDF("doc_id", "text")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
    val twin = NearDup.minHashLshCandidates(union, "doc_id", "text",
      maxBucket = 0L)
    val served = NearDupIndex.allCandidatePairs(spark, "graft_ims",
      "ns", "idx")
    served.exceptAll(twin).count() shouldBe 0
    twin.exceptAll(served).count() shouldBe 0
  }

  test("the lock is exclusive, contended acquisition is loud, and a " +
      "stale (crashed-holder) marker is broken") {
    val root = java.nio.file.Files.createTempDirectory("graft_iml").toString
    spark.conf.set("spark.sql.catalog.graft_iml",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_iml.root", root)
    IndexMaintenanceLock.withLock(spark, "graft_iml", "ns", "x") {
      val ex = intercept[IllegalStateException] {
        IndexMaintenanceLock.withLock(spark, "graft_iml", "ns", "x") { () }
      }
      ex.getMessage should include("already in progress")
    }
    // released: re-acquirable
    IndexMaintenanceLock.withLock(spark, "graft_iml", "ns", "x") { () }
    // a crashed holder's marker (old mtime) is broken, not fatal
    val marker = new java.io.File(s"$root/ns/.graft-maint-x.lock")
    java.nio.file.Files.writeString(marker.toPath, "dead 0")
    marker.setLastModified(
      System.currentTimeMillis() - IndexMaintenanceLock.StaleLockMs - 1000)
    IndexMaintenanceLock.withLock(spark, "graft_iml", "ns", "x") { () }
    marker.exists() shouldBe false
  }
}
