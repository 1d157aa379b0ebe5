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
  * Durability: the merged dim is frozen with `localCheckpoint` BEFORE the
  * overwrite (the merge plan reads the very files being replaced), then
  * written with a plain idempotent overwrite. A crash between freeze and
  * write re-processes the batch on restart — merges are idempotent per
  * (snapshot, runDate), so the dim converges.
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
        dates.foreach { d =>
          val snap = batch
            .filter(col(runDateCol).cast("string") === d)
            .drop(runDateCol)
          val merged = existingDim(spark, dimDir) match {
            case Some(dim) => Scd2.merge(dim, snap, naturalKey, tracked, d)
            case None => Scd2.initialLoad(snap, tracked)
          }
          // freeze before overwriting the files the plan reads
          merged.localCheckpoint()
            .write.mode("overwrite").parquet(dimDir)
        }
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
