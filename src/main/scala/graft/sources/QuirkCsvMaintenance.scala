package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** In-place maintenance for graftcsv directories — the compaction pass a
  * long-running graftcsv STREAMING sink needs (one part file per epoch ×
  * partition accumulates into thousands of small files, and both split
  * planning and the zone-map sidecar grow with file count).
  *
  * The operation is safe against a LIVE sink, by construction rather than
  * by convention:
  *
  *  1. '''Pin''': list the directory's visible data files once; that
  *     snapshot is the compaction's entire input AND its entire delete
  *     set. The read goes through the source with the `pinnedFiles`
  *     option, so partition planning at execution time reads exactly the
  *     snapshot even if the listing would differ by then.
  *  2. '''Append''': the folded part files are written with
  *     `mode("append")` — no truncate, so the sink's truncate-at-commit
  *     sweep (which deletes every file the committing job didn't write)
  *     never runs. Epoch files committed by a concurrent streaming sink
  *     between the pin and the swap are not read, not deleted, and
  *     simply survive into the compacted directory.
  *  3. '''Swap''': record the pinned names in a hidden intent sidecar,
  *     delete exactly those files, drop their zone-map entries, remove
  *     the intent. A crash mid-swap leaves the intent behind;
  *     [[compactCsv]] completes the pending swap first on its next run,
  *     so the directory converges to the compacted layout (rows are
  *     never lost — the worst crash window leaves the folded COPIES
  *     alongside not-yet-deleted originals, i.e. transient duplicates
  *     that the recovery pass removes).
  *
  * Honest concurrency contract: a batch reader that plans its scan
  * DURING the swap can see a pinned original and its folded copy at
  * once (duplicate rows) — the window is the delete loop, not the whole
  * rewrite. Rows are never lost. A live sink's own sidecar merge racing
  * the entry-drop step can lose zone entries for either side's files —
  * those files are then scanned instead of pruned (safe degradation).
  * A downstream graftcsv STREAM restarting across a compaction is NOT
  * supported: compaction replaces epoch files, which breaks the
  * path-sorted replay contract (that pairing needs a manifest, which is
  * why Spark's own FileStreamSink/Source pair through one). */
private[graft] object QuirkCsvMaintenance {

  private val IntentFile = "_graft_compact_intent.tsv"
  private val IntentHeader = "graft-compact-intent-v1"

  /** Compact `dir` into `numFiles` part files. Returns
    * (dataFilesBefore, dataFilesAfter). See the object doc for the
    * pin → append → swap protocol and its concurrency contract. */
  def compactCsv(spark: SparkSession, dir: String,
                 numFiles: Int): (Long, Long) = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // a PARTITIONED table root holds only the schema seed + value
    // subdirs: compacting it would fold the seed into a root "data"
    // file (bricking every later scan on the root-level-data-file
    // guard) and never touch the real data. Compact each value subdir
    // instead — a plain directory with no marker, where this protocol
    // applies unchanged.
    require(!new Path(dir, QuirkCsv.PartitioningFile)
      .getFileSystem(new Configuration())
      .exists(new Path(dir, QuirkCsv.PartitioningFile)),
      s"$dir is a PARTITIONED graftcsv table root — compact its " +
        "<col>=<value> subdirectories individually, never the root " +
        "(the root holds only the schema seed)")
    recoverPendingSwap(dir)
    val pinned = dataFileNames(dir)
    val before = pinned.size.toLong
    if (pinned.isEmpty) return (0L, 0L)
    compactPinned(spark, dir, pinned, numFiles)
    (before, dataFileNames(dir).size.toLong)
  }

  /** Visible (non-hidden) data file names in `dir`, sorted. */
  private[graft] def dataFileNames(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted
  }

  /** The compaction body, with the input snapshot as an explicit
    * argument — exposed so a spec can interleave a concurrent epoch
    * commit between the pin and the compaction and prove it survives. */
  private[graft] def compactPinned(spark: SparkSession, dir: String,
                                   pinned: Seq[String],
                                   numFiles: Int): Unit = {
    spark.read.format("graftcsv")
      .option("pinnedFiles", QuirkCsv.encodePinned(pinned))
      .load(dir)
      .repartition(numFiles)
      .write.format("graftcsv").mode("append").save(dir)
    // swap: intent first, so a crash anywhere below is completed by the
    // next compactCsv run instead of leaving permanent duplicates
    writeIntent(dir, pinned)
    deleteNamed(dir, pinned)
    dropZoneEntries(dir, pinned.toSet)
    val p = new Path(dir, IntentFile)
    p.getFileSystem(new Configuration()).delete(p, false)
  }

  /** Complete a swap a crashed compaction left half-done: delete any
    * still-present files named by the intent sidecar, drop their zone
    * entries, remove the intent. No-op when no intent exists. */
  private[graft] def recoverPendingSwap(dir: String): Unit = {
    val p = new Path(dir, IntentFile)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) return
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(p), java.nio.charset.StandardCharsets.ISO_8859_1))
    val names = try {
      if (in.readLine() != IntentHeader) Nil
      else Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty).map(QuirkCsv.decodePinnedName).toList
    } finally in.close()
    deleteNamed(dir, names)
    dropZoneEntries(dir, names.toSet)
    fs.delete(p, false)
  }

  private def writeIntent(dir: String, names: Seq[String]): Unit = {
    val p = new Path(dir, IntentFile)
    val fs = p.getFileSystem(new Configuration())
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.ISO_8859_1))
    try {
      out.write(IntentHeader); out.write("\n")
      names.foreach { n =>
        out.write(QuirkCsv.encodePinned(Seq(n))); out.write("\n")
      }
    } finally out.close()
  }

  private def deleteNamed(dir: String, names: Seq[String]): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(new Configuration())
    names.foreach { n =>
      val p = new Path(base, n)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  private def dropZoneEntries(dir: String, names: Set[String]): Unit = {
    val zm = QuirkCsv.loadZoneMap(dir)
    if (zm.nonEmpty && zm.keys.exists(names.contains))
      QuirkCsv.writeZoneMap(dir, zm.filter { case (n, _) => !names.contains(n) })
  }
}
