package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.operators.{IvfIndex, NearDupIndex}

/** Streaming maintenance of the persisted similarity indexes — the
  * arrival-driven twin of the batch `indexBatch`/`assignBatch` calls:
  * documents (or vectors) land as files, and each micro-batch lands in
  * the catalog index as ONE batch partition labeled by its epoch.
  *
  * Exactly-once shape without a transaction log: the batch label is the
  * epoch id, and both index writers are dynamic-partition overwrites of
  * exactly that label — a replayed epoch (driver died before the
  * checkpoint commit) rewrites its own partition and can never touch
  * other epochs', so the index converges to the same content as a
  * batch build over the union of arrivals (IndexMaintenanceSpec pins
  * both directions plus the replay).
  *
  * At 100 TB: each micro-batch scans only its own arrivals (banding /
  * centroid assignment are per-row projections against broadcast
  * state); the historical index is never read, let alone rewritten.
  * The daily near-dup question then runs off
  * [[graft.operators.NearDupIndex.candidatePairsFor]] at any moment,
  * and IVF drift ([[graft.operators.IvfIndex.driftReport]] /
  * `retrainIfNeeded`) covers streamed batches the same as batch ones. */
object IndexMaintenance {

  /** Band every arriving document batch into the persisted MinHash-LSH
    * index (`NearDupIndex`, which must already exist — [[build]] pins
    * the banding parameters). Processes all currently-available files
    * and stops (`Trigger.AvailableNow` through
    * [[StreamOps.incrementalLoad]]); re-runs process only new files. */
  def nearDupIndexStream(spark: SparkSession, inputDir: String,
                         schema: StructType, checkpointDir: String,
                         cat: String, ns: String, name: String,
                         idCol: String, textCol: String,
                         batchPrefix: String = "epoch"): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = StreamOps.incrementalLoad(stream, checkpointDir) {
      (batch, epochId) =>
        if (!batch.isEmpty)
          NearDupIndex.indexBatch(spark, cat, ns, name, batch, idCol,
            textCol, s"$batchPrefix-$epochId")
    }
    q.awaitTermination()
  }

  /** Assign every arriving vector batch against the persisted IVF
    * centroids (`IvfIndex`, which must already exist) as one epoch
    * partition of the assignment table. The centroids are never
    * touched; when [[graft.operators.IvfIndex.driftReport]] starts
    * alerting on the streamed epochs, `retrainIfNeeded` is the
    * full-corpus response. */
  def ivfAssignStream(spark: SparkSession, inputDir: String,
                      schema: StructType, checkpointDir: String,
                      cat: String, ns: String, name: String,
                      idCol: String, embCol: String,
                      batchPrefix: String = "epoch"): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = StreamOps.incrementalLoad(stream, checkpointDir) {
      (batch, epochId) =>
        if (!batch.isEmpty)
          IvfIndex.assignBatch(spark, cat, ns, name, batch, idCol,
            embCol, s"$batchPrefix-$epochId")
    }
    q.awaitTermination()
  }
}
