package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import org.apache.hadoop.fs.Path

import graft.operators.IndexMaintenanceLock

/** The maintenance lock's liveness/safety tier beyond plain exclusion
  * (that part lives in IndexMaintStormSpec): the single-winner stale
  * break, the heartbeat lease that keeps a LIVE long-running holder from
  * being broken under itself, and the ownership token that keeps a
  * holder who LOST its lock from deleting the takeover's marker — it
  * fails loudly instead. */
class IndexMaintLockSpec extends SparkSpec {

  private def newRoot(tag: String): String = {
    val root = java.nio.file.Files.createTempDirectory(tag).toString
    spark.conf.set(s"spark.sql.catalog.$tag",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    root
  }

  test("stale break is single-winner: N racers on one stale marker, " +
      "exactly one break succeeds") {
    val root = java.nio.file.Files.createTempDirectory("graft_brk").toString
    val marker = new Path(s"$root/.graft-maint-race.lock")
    val fs = marker.getFileSystem(
      spark.sessionState.newHadoopConf())
    val staleMtime = System.currentTimeMillis() - 60 * 60 * 1000L
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(marker.toUri.getPath), "999 deadnonce 0")
    new java.io.File(marker.toUri.getPath).setLastModified(staleMtime)
    val observed = fs.getFileStatus(marker).getModificationTime

    val n = 8
    val start = new CountDownLatch(1)
    val wins = new AtomicInteger(0)
    val threads = (1 to n).map { _ =>
      val t = new Thread(() => {
        start.await()
        if (IndexMaintenanceLock.breakStale(fs, marker, observed))
          wins.incrementAndGet()
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(30000))
    wins.get() shouldBe 1
    fs.exists(marker) shouldBe false
    // no tombstone residue: the winner deleted its tombstone
    fs.listStatus(new Path(root)).length shouldBe 0
  }

  test("a break attempt observing a refreshed mtime rolls back (the " +
      "holder heartbeated in the check-to-rename window)") {
    val root = java.nio.file.Files.createTempDirectory("graft_rb").toString
    val marker = new Path(s"$root/.graft-maint-live.lock")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(marker.toUri.getPath), "1 livenonce 0")
    // the breaker judged staleness off an OLD observation; the marker's
    // actual mtime is fresh (a heartbeat landed since)
    val staleObservation = System.currentTimeMillis() - 60 * 60 * 1000L
    IndexMaintenanceLock.breakStale(fs, marker, staleObservation) shouldBe
      false
    fs.exists(marker) shouldBe true // rolled back, holder keeps the lock
  }

  test("a heartbeating holder running far past staleLockMs is never " +
      "broken; contenders keep failing loudly until release") {
    newRoot("graft_hb")
    withSQLConf("spark.graft.maint.staleLockMs" -> "2000") {
      // default heartbeat = staleMs/6 ≈ 333ms — the holder's mtime can
      // never age past ~1s while it lives
      val holderDone = new CountDownLatch(1)
      val holderErr = new AtomicReference[Throwable](null)
      val holder = new Thread(() => {
        try IndexMaintenanceLock.withLock(spark, "graft_hb", "ns", "idx") {
          Thread.sleep(5000) // 2.5x the stale bound
        } catch { case t: Throwable => holderErr.set(t) }
        finally holderDone.countDown()
      })
      holder.start()
      Thread.sleep(500) // let the holder claim
      var contentionFailures = 0
      while (holderDone.getCount > 0) {
        try {
          IndexMaintenanceLock.withLock(spark, "graft_hb", "ns", "idx") { () }
          // a success while the holder lives would mean we broke a LIVE
          // lock — only legal after release
          holderDone.getCount shouldBe 0L
        } catch {
          case e: IllegalStateException =>
            e.getMessage should include("already in progress")
            contentionFailures += 1
        }
        Thread.sleep(250)
      }
      holder.join(10000)
      holderErr.get() shouldBe null // the holder was never broken under
      contentionFailures should be >= 8 // ~5s of polite refusals
      // and the lock is free now
      IndexMaintenanceLock.withLock(spark, "graft_hb", "ns", "idx") { () }
    }
  }

  test("a holder whose lock was legitimately taken over (stalled " +
      "heartbeat) cannot delete the takeover's marker and fails loudly") {
    val root = newRoot("graft_tk")
    withSQLConf("spark.graft.maint.staleLockMs" -> "1500",
        "spark.graft.maint.heartbeatMs" -> "0") { // stalled holder
      val holderErr = new AtomicReference[Throwable](null)
      val holderDone = new CountDownLatch(1)
      val holder = new Thread(() => {
        try IndexMaintenanceLock.withLock(spark, "graft_tk", "ns", "idx") {
          Thread.sleep(4000) // sleeps past the stale bound, no beats
        } catch { case t: Throwable => holderErr.set(t) }
        finally holderDone.countDown()
      })
      holder.start()
      Thread.sleep(2500) // holder's marker is now stale (no heartbeat)
      val takeoverReleased = new CountDownLatch(1)
      val takeoverErr = new AtomicReference[Throwable](null)
      val takeover = new Thread(() => {
        try IndexMaintenanceLock.withLock(spark, "graft_tk", "ns", "idx") {
          // hold ACROSS the original holder's exit so its release path
          // sees a live foreign marker
          holderDone.await(20, TimeUnit.SECONDS)
          val marker = new java.io.File(s"$root/ns/.graft-maint-idx.lock")
          marker.exists() shouldBe true // the ex-holder did not delete it
        } catch { case t: Throwable => takeoverErr.set(t) }
        finally takeoverReleased.countDown()
      })
      takeover.start()
      holder.join(15000)
      takeoverReleased.await(20, TimeUnit.SECONDS) shouldBe true
      takeoverErr.get() shouldBe null
      // the ex-holder's "success" was not trustworthy: loud failure
      holderErr.get() should not be null
      holderErr.get().getMessage should include("lost while held")
      // takeover released cleanly: lock free again
      IndexMaintenanceLock.withLock(spark, "graft_tk", "ns", "idx") { () }
    }
  }

  test("release joins the heartbeat: a beat in flight at interrupt time " +
      "can never race the owner's own delete into a spurious 'lost while " +
      "held' on a fully successful run") {
    newRoot("graft_jn")
    // an aggressive heartbeat (1 ms) maximizes the odds a beat is mid
    // readToken/setTimes exactly when release interrupts; pre-join, that
    // beat saw the owner's own delete and flipped `lost` on a run whose
    // exclusivity was never violated (~1 in 30 at this cadence)
    withSQLConf("spark.graft.maint.heartbeatMs" -> "1") {
      (1 to 150).foreach { _ =>
        IndexMaintenanceLock.withLock(spark, "graft_jn", "ns", "idx") {
          Thread.sleep(2)
        }
      }
    }
  }
}
