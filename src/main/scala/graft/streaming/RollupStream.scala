package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.Scale

/** Streaming incremental rollup maintenance: the file-drop twin of
  * `Scale.incrementalRollup`. Late fact files land in a directory; each
  * micro-batch marks the days it touches dirty, rebuilds ONLY those days
  * from the (also persisted) fact store plus the batch, and rewrites the
  * rollup — clean days pass through from the previous rollup untouched.
  * `Trigger.AvailableNow` + the checkpoint make re-runs process only new
  * files: the nightly partition-refresh job, as a stream.
  *
  * Two directories are maintained:
  *  - `factDir` — the append-only fact store (every batch appends);
  *  - `rollupDir` — the (day, group) rollup, overwritten per batch.
  *
  * Durability mirrors Scd2Stream: the refreshed rollup is frozen with
  * `localCheckpoint` before the single per-batch overwrite (the refresh
  * plan reads the files being replaced). The fact append is made
  * IDEMPOTENT by landing each batch in its own `batch=<id>` directory
  * with overwrite mode — a replayed batch overwrites its own earlier
  * (possibly partial) append instead of duplicating it, and the
  * dirty-day recompute rebuilds from the store rather than adding
  * deltas, so replay converges to the same rollup.
  */
object RollupStream {

  /** Process all currently-available late-fact files once and stop.
    * `dayCol` must be a date column in the files; `groupCols` + day form
    * the rollup grain; `measureCol` sums in DECIMAL(18,2). */
  def runIncremental(spark: SparkSession, inputDir: String,
                     schema: StructType, factDir: String, rollupDir: String,
                     checkpointDir: String, dayCol: String,
                     groupCols: Seq[String], measureCol: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = StreamOps.incrementalLoad(stream, checkpointDir) {
      (batch, batchId) =>
      if (!batch.isEmpty) {
        // 1. land the late facts in a per-batch directory, overwrite
        // mode: a replayed batch replaces its own earlier append
        // (idempotent — see Durability note); partition discovery makes
        // the store readable as one table, `batch` surfacing as a
        // partition column the rollup ignores
        batch.write.mode("overwrite").parquet(s"$factDir/batch=$batchId")
        val facts = spark.read.parquet(factDir)
        val refreshed = existing(spark, rollupDir) match {
          case Some(rollup) =>
            // the store already INCLUDES the batch, so the batch only
            // marks days dirty (refreshDays) — the recompute reads the
            // store, never adds the batch as a delta, and therefore
            // cannot double-count a replayed day
            Scale.refreshDays(rollup, facts,
              batch.select(col(dayCol)).distinct(),
              dayCol, groupCols, measureCol)
          case None =>
            Scale.rollup(facts, dayCol, groupCols, measureCol)
        }
        refreshed.localCheckpoint()
          .write.mode("overwrite").parquet(rollupDir)
      }
    }
    q.awaitTermination()
  }

  private def existing(spark: SparkSession,
                       dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getLen > 0))
      Some(spark.read.parquet(dir))
    else None
  }
}
