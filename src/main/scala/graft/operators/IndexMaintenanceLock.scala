package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

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
  *
  * Liveness and safety around crashes, in three pieces:
  *
  *  - '''Ownership token.''' The winner writes `pid nonce claimMs` into
  *    its marker. Release and every heartbeat re-read the token and act
  *    ONLY if the nonce is ours — a holder that lost its lock (broken
  *    as stale under it) can never delete the takeover's live marker;
  *    it fails loudly instead.
  *  - '''Heartbeat lease.''' The holder touches the marker mtime every
  *    [[heartbeatMs]] from a daemon thread, so staleness means "no
  *    heartbeat for [[StaleLockMs]]", not "claimed more than 30 minutes
  *    ago" — a live 100-TB retrain legitimately runs for hours and must
  *    not be broken under itself. A crashed holder stops beating and
  *    its marker goes stale on schedule.
  *  - '''Single-winner stale break.''' A contender that judges a marker
  *    stale RENAMES it to a unique tombstone before deleting: rename of
  *    a missing source fails, so of N contenders racing the same stale
  *    marker exactly one owns the tombstone and proceeds to claim; the
  *    rest see normal contention. After the rename the winner re-checks
  *    the tombstone's mtime (rename preserves it) against the mtime its
  *    staleness decision was made on — if a heartbeat landed in the
  *    check-to-rename window the tombstone is renamed straight back and
  *    the break abandoned. Check-then-delete (two contenders both judge
  *    stale; the slower deletes the faster's fresh claim) is thereby
  *    impossible: the delete target is a tombstone only its renamer can
  *    name.
  *
  * Release is ownership-verified delete in `finally`; if the body
  * completed but the lock was lost mid-flight (marker gone or foreign
  * nonce), [[withLock]] THROWS rather than reporting a success whose
  * exclusivity was violated. */
object IndexMaintenanceLock {

  /** Age after which a marker with no heartbeat is presumed crashed and
    * broken. The holder refreshes mtime every [[heartbeatMs]], so only
    * a dead holder's marker ever reaches this age. Tests may shrink it
    * via `spark.graft.maint.staleLockMs`. */
  val StaleLockMs: Long = 30L * 60 * 1000

  /** Default heartbeat period — StaleLockMs/6, far more slack than a
    * live JVM's daemon thread needs. `spark.graft.maint.heartbeatMs`
    * overrides; 0 disables (tests simulating a stalled holder). */
  val DefaultHeartbeatMs: Long = 5L * 60 * 1000

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
    val staleMs = spark.conf.getOption("spark.graft.maint.staleLockMs")
      .map(_.toLong).getOrElse(StaleLockMs)
    val hbMs = spark.conf.getOption("spark.graft.maint.heartbeatMs")
      .map(_.toLong).getOrElse(math.max(1000L, staleMs / 6))
    val dir = new Path(root, ns)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(dir)
    val marker = new Path(dir, s".graft-maint-$name.lock")
    val nonce = java.util.UUID.randomUUID().toString
    acquire(fs, marker, nonce, staleMs)
    val lost = new AtomicBoolean(false)
    val beat = if (hbMs > 0) Some(startHeartbeat(fs, marker, nonce, hbMs,
      lost)) else None
    var bodyOk = false
    try {
      val r = body
      bodyOk = true
      r
    } finally {
      beat.foreach(_.interrupt())
      // JOIN before the ownership check and the marker delete: a beat
      // mid readToken/setTimes at interrupt time could otherwise race
      // our own delete below (setTimes on the just-deleted marker →
      // spurious `lost`) and make a fully successful run throw. The
      // thread only sleeps or does local fs ops, so the join is prompt;
      // the timeout is a belt against a wedged fs, after which the
      // conservative path below still applies.
      beat.foreach(_.join(10000))
      val owned = readToken(fs, marker).exists(_.nonce == nonce)
      if (owned) fs.delete(marker, false)
      // the delete is skipped when the marker is gone or foreign — and
      // if the body "succeeded" under a lost lock, that success is not
      // trustworthy: another maintainer may have interleaved. Loud.
      if (bodyOk && (lost.get() || !owned))
        throw new IllegalStateException(
          s"maintenance lock $marker was lost while held (marker " +
            "removed or re-claimed by another process) — the completed " +
            "work may have interleaved with another maintainer; verify " +
            "the index (re-run the operation after inspecting history)")
    }
  }

  /** Holder-side lease renewal: touch the marker mtime every `hbMs`,
    * verifying ownership first. setTimes on a missing path throws, so a
    * broken-under-us lock flips `lost` instead of resurrecting the
    * marker (an overwrite-create here could recreate a marker a breaker
    * just tombstoned — never write, only touch). */
  private def startHeartbeat(fs: FileSystem, marker: Path, nonce: String,
                             hbMs: Long, lost: AtomicBoolean): Thread = {
    val t = new Thread(() => {
      try {
        var owned = true
        while (owned && !Thread.currentThread().isInterrupted) {
          Thread.sleep(hbMs)
          if (readToken(fs, marker).exists(_.nonce == nonce))
            fs.setTimes(marker, System.currentTimeMillis(), -1)
          else if (Thread.currentThread().isInterrupted)
            // release interrupted us mid-read: readToken swallows the
            // interrupt-induced I/O abort into None — that is a normal
            // shutdown, NOT a lost lock (release's own readToken, on the
            // un-interrupted main thread, stays the authoritative
            // ownership check). Flagging `lost` here made a fully
            // successful run throw spuriously (~1 in 30 at a 1 ms
            // heartbeat — the release-join regression test).
            owned = false
          else { lost.set(true); owned = false }
        }
      } catch {
        case _: InterruptedException => () // normal release
        case _: Exception if Thread.currentThread().isInterrupted =>
          () // interrupt-induced I/O abort mid-beat: normal release
        case _: Exception => lost.set(true) // fs error or marker gone
      }
    }, s"graft-maint-heartbeat-${marker.getName}")
    t.setDaemon(true)
    t.start()
    t
  }

  private[operators] case class Token(pid: Long, nonce: String,
                                      claimMs: Long)

  /** Parse the marker's ownership token; None when the marker is
    * missing OR its content is empty/foreign-format (the instant
    * between exclusive create and token write — callers treat "no
    * token" as not-owned / possibly-live, the conservative reading on
    * both sides). */
  private[operators] def readToken(fs: FileSystem,
                                   marker: Path): Option[Token] =
    try {
      val in = fs.open(marker)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.US_ASCII).trim
      finally in.close()
      s.split(" ") match {
        case Array(p, n, c) if p.forall(_.isDigit) && c.forall(_.isDigit) =>
          Some(Token(p.toLong, n, c.toLong))
        case _ => None
      }
    } catch { case _: Exception => None }

  private def acquire(fs: FileSystem, marker: Path, nonce: String,
                      staleMs: Long): Unit = {
    if (tryClaim(fs, marker, nonce)) return
    // claimed by someone: break it only if provably stale — no
    // heartbeat for staleMs — and only through the single-winner
    // tombstone protocol
    val observedMtime = try {
      val st = fs.getFileStatus(marker)
      if (System.currentTimeMillis() - st.getModificationTime > staleMs)
        Some(st.getModificationTime)
      else None
    } catch { case _: java.io.FileNotFoundException => None } // released
    observedMtime.foreach(m => breakStale(fs, marker, m))
    if (!tryClaim(fs, marker, nonce)) {
      val holder = readToken(fs, marker)
        .map(t => s"pid ${t.pid}, claimed ${t.claimMs}")
        .getOrElse("unknown")
      throw new IllegalStateException(
        s"index maintenance already in progress (lock $marker, " +
          s"holder: $holder) — retry when it completes; a crashed " +
          s"holder's marker self-expires ${staleMs / 1000}s after its " +
          "last heartbeat")
    }
  }

  /** Single-winner break of a marker judged stale at `observedMtime`.
    * Returns true iff THIS caller won the break (renamed the marker to
    * its private tombstone and deleted it). Of N racers exactly one can
    * rename the marker away; a heartbeat landing between the caller's
    * staleness check and the rename is detected on the tombstone's
    * preserved mtime and rolled back. */
  private[graft] def breakStale(fs: FileSystem, marker: Path,
                                    observedMtime: Long): Boolean = {
    val tomb = new Path(marker.getParent,
      s"${marker.getName}.tomb-${java.util.UUID.randomUUID()}")
    val renamed = try fs.rename(marker, tomb)
    catch { case _: java.io.IOException => false }
    if (!renamed) return false
    val tombMtime = try fs.getFileStatus(tomb).getModificationTime
    catch { case _: java.io.FileNotFoundException => return false }
    if (tombMtime > observedMtime) {
      // the holder heartbeated in our check→rename window: it is LIVE.
      // Put the marker back; if the holder's next beat already failed
      // (marker briefly missing) it fails loudly — safe side.
      if (!fs.rename(tomb, marker)) fs.delete(tomb, false)
      return false
    }
    fs.delete(tomb, false)
    true
  }

  /** One exclusive-create attempt; the winner then writes its ownership
    * token (`pid nonce claimMs`). The claim itself is the zero-byte
    * exclusive creation — the token write may lag an instant, during
    * which readToken returns None and everyone stays conservative. */
  private def tryClaim(fs: FileSystem, marker: Path,
                       nonce: String): Boolean = {
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
      // the token is LOAD-BEARING (heartbeat and release verify the
      // nonce): an untokened marker makes the heartbeat flag `lost`,
      // release skips the delete (the marker leaks and blocks all
      // maintenance until staleMs), and withLock throws despite
      // exclusivity never being violated. So a token-write failure
      // UNDOES the claim and fails the acquire loudly instead of
      // returning a poisoned win.
      try {
        val out = fs.create(marker, true)
        out.write((ProcessHandle.current().pid().toString + " " + nonce +
          " " + System.currentTimeMillis().toString)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        out.close()
      } catch {
        case e: Exception =>
          try fs.delete(marker, false) catch { case _: Exception => () }
          throw new IllegalStateException(
            s"claimed maintenance lock $marker but could not write its " +
              "ownership token — releasing the claim and failing the " +
              "acquire (filesystem error)", e)
      }
    }
    won
  }
}
