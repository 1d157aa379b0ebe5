package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.Corpus

/** Streaming corpus intake: the incremental twin of
  * `graft.operators.CorpusPipeline` for the crawl-arrival shape — documents
  * land as files, each micro-batch is deduplicated WITHIN itself and then
  * gated against everything the corpus has already accepted, and survivors
  * are appended. `Trigger.AvailableNow` + a checkpoint make re-runs process
  * only new files (the reference's re-runnable file-drop loads, but for the
  * LLM corpus side).
  *
  * Semantics: greedy-by-arrival — an arrival that near-dups (SimHash
  * Hamming ≤ maxHamming, banded) any ACCEPTED document is dropped; within a
  * batch, pairs resolve through connected components keeping the minimum
  * id. This matches the one-shot batch pipeline whenever near-dup relations
  * don't chain across batch boundaries (A~B, B~C, A≁C with B arriving
  * after both would keep {A, C} here but {A} in one shot — inherent to ANY
  * incremental gate, not to this implementation; CorpusIntakeSpec pins the
  * agreeing case).
  *
  * Scale posture: the batch side is small by definition; the corpus side is
  * banded the same way as `dedupeAgainstCorpus` (equi-join on band values,
  * never batch × corpus). At production scale, persist corpus fingerprints
  * next to the corpus instead of re-reading text (see dedupeAgainstCorpus's
  * scaladoc); the join shape is unchanged.
  */
object CorpusIntake {

  /** Process all currently-available input files once and stop. Returns
    * after the corpus at `corpusDir` includes every accepted arrival. */
  def runIncremental(spark: SparkSession, inputDir: String, schema: StructType,
                     corpusDir: String, checkpointDir: String,
                     idCol: String, textCol: String,
                     maxHamming: Int = 3, bits: Int = 32,
                     numBands: Int = 4): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = StreamOps.incrementalLoad(stream, checkpointDir) { (batch, _) =>
      if (!batch.isEmpty) {
        val cols = batch.columns.toIndexedSeq.map(col)
        // within-batch resolution first: arrivals in the same batch have
        // no order between them, so components + min-id keeper (hamming 0
        // exact dups are just the radius-0 case)
        val withinDeduped = Corpus.resolveDuplicates(batch, idCol,
            Corpus.simHashHammingPairs(batch, idCol, textCol, maxHamming,
              bits, numBands),
            "a_id", "b_id")
          .select(cols: _*)
        val survivors = acceptedCorpus(spark, corpusDir) match {
          case Some(corpus) => Corpus.dedupeAgainstCorpus(withinDeduped,
            corpus, idCol, textCol, maxHamming, bits, numBands)
          case None => withinDeduped
        }
        survivors.select(cols: _*)
          .write.mode("append").parquet(corpusDir)
      }
    }
    q.awaitTermination()
  }

  private def acceptedCorpus(spark: SparkSession,
                             corpusDir: String): Option[DataFrame] = {
    val p = new Path(corpusDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getLen > 0))
      Some(spark.read.parquet(corpusDir))
    else None
  }
}
