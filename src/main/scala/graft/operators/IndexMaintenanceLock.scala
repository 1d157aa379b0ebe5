package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-process exclusion for MULTI-STEP index maintenance — the
  * version-claim discipline applied one level up. Single commits are
  * already linearized by the version log's exclusive-create claims, but
  * `NearDupIndex.build` (drop → create → band → meta), the co-located
  * `indexBatch` (delete + append), and `IvfIndex.retrain` (overwrite →
  * re-assign → drops) are multi-STATEMENT sequences: two drivers
  * maintaining the same index could interleave steps and double-land a
  * batch or serve a half-rebuilt index as complete.
  *
  * The lock is a marker file claimed with the same primitive the
  * version log trusts: POSIX `O_CREAT|O_EXCL` on local paths (Hadoop's
  * local create(overwrite=false) is exists-check-then-open — NOT
  * atomic; the kernel arbitrates createFile), namenode-atomic
  * `create(overwrite=false)` elsewhere. Contention throws loudly — a
  * maintenance job queues by retrying, never by silently interleaving.
  * A crashed holder's marker is broken after [[StaleLockMs]] (the
  * holder writes its pid + claim time for the operator reading the
  * error). Release is best-effort delete in `finally`; a marker that
  * outlives a SIGKILLed holder is exactly what the stale break covers. */
object IndexMaintenanceLock {

  /** Age after which a marker is presumed crashed and broken. Marker
    * mtime is the claim time; no live maintenance should hold the lock
    * this long without completing. */
  val StaleLockMs: Long = 30L * 60 * 1000

  /** Run `body` holding the exclusive maintenance lock for index
    * `name` under `cat.ns`. Throws IllegalStateException("… already in
    * progress …") on contention. NOT reentrant — internal calls must go
    * through unlocked private bodies. */
  def withLock[T](spark: SparkSession, cat: String, ns: String,
                  name: String)(body: => T): T = {
    val root = spark.conf.getOption(s"spark.sql.catalog.$cat.root")
      .getOrElse(throw new IllegalStateException(
        s"catalog '$cat' has no root conf — index maintenance locking " +
          "needs spark.sql.catalog.<cat>.root"))
    val dir = new Path(root, ns)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val marker = new Path(dir, s".graft-maint-$name.lock")
    acquire(fs, marker)
    try body
    finally fs.delete(marker, false)
  }

  private def acquire(fs: FileSystem, marker: Path): Unit = {
    if (tryClaim(fs, marker)) return
    // claimed by someone: break it only if provably stale
    val stale = try {
      val st = fs.getFileStatus(marker)
      System.currentTimeMillis() - st.getModificationTime > StaleLockMs
    } catch { case _: java.io.FileNotFoundException => true } // released
    if (stale) fs.delete(marker, false)
    if (!tryClaim(fs, marker)) {
      val holder = try {
        val in = fs.open(marker)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.US_ASCII).trim
        finally in.close()
      } catch { case _: Exception => "unknown" }
      throw new IllegalStateException(
        s"index maintenance already in progress (lock $marker, " +
          s"holder: $holder) — retry when it completes, or remove the " +
          s"marker if the holder crashed less than ${StaleLockMs / 60000}" +
          " minutes ago and is known dead")
    }
  }

  /** One exclusive-create attempt; the claim carries pid + time for the
    * contention error. The pid lands AFTER the create wins — the claim
    * itself is the zero-byte exclusive creation. */
  private def tryClaim(fs: FileSystem, marker: Path): Boolean = {
    val scheme = Option(marker.toUri.getScheme).getOrElse(fs.getScheme)
    val won =
      if (scheme == "file") {
        try {
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(marker.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        try { fs.create(marker, false).close(); true }
        catch { case _: java.io.IOException => false }
      }
    if (won) {
      try {
        val out = fs.create(marker, true)
        out.write((ProcessHandle.current().pid().toString + " " +
          System.currentTimeMillis().toString)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        out.close()
      } catch { case _: Exception => () } // diagnostics only
    }
    won
  }
}
