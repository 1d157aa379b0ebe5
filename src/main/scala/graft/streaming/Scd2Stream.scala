package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.Scd2

/** Streaming SCD2 dimension maintenance: the incremental twin of
  * `graft.operators.Scd2` for the snapshot-drop shape — full dimension
  * snapshots land as files (one or more per run date), each micro-batch
  * merges them into the persisted dim in RUN-DATE ORDER, and
  * `Trigger.AvailableNow` + the checkpoint make re-runs process only new
  * snapshot files (the reference's re-runnable nightly dim load, as a
  * stream).
  *
  * Semantics are exactly the batch operator's: a catching-up batch that
  * carries several snapshot days applies one [[Scd2.merge]] per day in
  * ascending date order, so the resulting history is identical to having
  * run the nightly batch on time every night (Scd2StreamSpec pins
  * stream == batch).
  *
  * Durability: ALL of a batch's per-day merges happen on in-memory frames
  * and the dim directory is overwritten exactly ONCE per batch, after the
  * final day's merge is frozen with `localCheckpoint` (the merge plan
  * reads the very files being replaced). That makes a replayed batch
  * idempotent: a crash before the single write leaves the pre-batch dim
  * intact, so the restart re-runs every day of the batch from the same
  * starting state. (Writing after EACH day would break this — a replay
  * of day 1 against a dim already containing day 2 would register the
  * d2→d1 hash drift as a new backward version.)
  */
object Scd2Stream {

  /** Process all currently-available snapshot files once and stop. The
    * `runDateCol` column (castable to string `yyyy-MM-dd`) names each
    * row's snapshot date and is dropped before merging. */
  def runIncremental(spark: SparkSession, inputDir: String,
                     schema: StructType, dimDir: String,
                     checkpointDir: String, naturalKey: Seq[String],
                     tracked: Seq[String], runDateCol: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = StreamOps.incrementalLoad(stream, checkpointDir) { (batch, _) =>
      if (!batch.isEmpty) {
        val dates = batch
          .select(col(runDateCol).cast("string").as("d"))
          .distinct().orderBy(col("d"))
          .collect().map(_.getString(0))
        // fold every day's merge in memory; ONE write per batch (see
        // Durability in the object scaladoc — per-day writes would make
        // a replayed catch-up batch corrupt history)
        val finalDim = dates.foldLeft(existingDim(spark, dimDir)) {
          (dim, d) =>
            val snap = batch
              .filter(col(runDateCol).cast("string") === d)
              .drop(runDateCol)
            val merged = dim match {
              case Some(cur) => Scd2.merge(cur, snap, naturalKey, tracked, d)
              case None => Scd2.initialLoad(snap, tracked)
            }
            // truncate lineage per day so a long catch-up doesn't stack
            // merge plans; the last day's checkpoint also frees the
            // write from reading the files it replaces
            Some(merged.localCheckpoint())
        }
        finalDim.foreach(_.write.mode("overwrite").parquet(dimDir))
      }
    }
    q.awaitTermination()
  }

  private def existingDim(spark: SparkSession,
                          dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getLen > 0))
      Some(spark.read.parquet(dir))
    else None
  }
}
