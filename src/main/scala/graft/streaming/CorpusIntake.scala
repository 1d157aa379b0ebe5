package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, sum}
import org.apache.spark.sql.types.StructType

import graft.operators.{Corpus, NearDup}

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
  * never batch × corpus). Pass `signatureDir` to gate against a persisted
  * (doc_id, simhash) store maintained by the intake itself — then accepted
  * text is write-only and each run re-reads only 8 bytes per accepted doc.
  */
object CorpusIntake {

  /** Gopher-style per-document quality gate settings (the
    * `Corpus.gopherQualityFlags` thresholds, applied per batch BEFORE
    * dedup — the CorpusPipeline stage order). */
  final case class GopherGate(minWords: Int = 50, maxWords: Int = 100000,
                              minMeanWordLen: Double = 3.0,
                              maxMeanWordLen: Double = 10.0,
                              maxSymbolRatio: Double = 0.1,
                              minAlphaRatio: Double = 0.8,
                              minStopwordHits: Int = 2)

  /** Unigram cross-entropy gate: score each arrival against a FIXED
    * `(token, lp_scaled)` reference model (`Corpus.unigramLogProbs` of a
    * trusted corpus) and drop docs scoring above `maxNats`. The model
    * must be fixed — batch-relative probabilities would make a doc's
    * fate depend on what it happened to arrive with. Token-less docs
    * are unscorable and are dropped. */
  final case class CeGate(model: DataFrame, maxNats: Double,
                          oovPenaltyNats: Double = 20.0)

  /** Process all currently-available input files once and stop. Returns
    * after the corpus at `corpusDir` includes every accepted arrival.
    *
    * With `signatureDir` set (the production shape), the gate joins the
    * batch against the persisted (doc_id, simhash) store instead of
    * re-hashing the accepted corpus's text, and each accepted batch
    * appends its own signatures — the store is 8 bytes/doc and the
    * corpus text is write-only after acceptance. Caveat: corpus and
    * store are two separate parquet appends; a crash between them leaves
    * the last batch's signatures missing (re-gate that batch or rebuild
    * signatures from the corpus — a transactional table format is the
    * production answer).
    *
    * With `quota = Some((sourceCol, maxDocs))` the intake also enforces a
    * per-source ceiling ACROSS batches: a batch's survivors are
    * deterministically md5-ranked per source (Corpus.capPerSource) and
    * only as many are accepted as the source's remaining allowance.
    * Already-used counts come from a pruned single-column scan of the
    * accepted corpus — tiny per-source aggregate, broadcast into the
    * batch; a production deployment keeps a counts table beside the
    * signature store instead of re-aggregating. */
  def runIncremental(spark: SparkSession, inputDir: String, schema: StructType,
                     corpusDir: String, checkpointDir: String,
                     idCol: String, textCol: String,
                     maxHamming: Int = 3, bits: Int = 32,
                     numBands: Int = 4,
                     signatureDir: Option[String] = None,
                     quota: Option[(String, Int)] = None,
                     gopher: Option[GopherGate] = None,
                     ce: Option[CeGate] = None,
                     quotaCountsDir: Option[String] = None): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = StreamOps.incrementalLoad(stream, checkpointDir) { (batch, _) =>
      if (!batch.isEmpty) {
        val cols = batch.columns.toIndexedSeq.map(col)
        // quality gates FIRST (the CorpusPipeline stage order: a doc's
        // gate fate is per-doc and model-fixed, so gating before dedup
        // is batch-boundary-independent — stream == batch by
        // construction)
        val gophered = gopher.fold(batch) { g =>
          Corpus.gopherQualityFlags(batch, idCol, textCol, g.minWords,
              g.maxWords, g.minMeanWordLen, g.maxMeanWordLen,
              g.maxSymbolRatio, g.minAlphaRatio, g.minStopwordHits)
            .filter(col("keep")).select(cols: _*)
        }
        val gated0 = ce.fold(gophered) { c =>
          val keep = Corpus.unigramCrossEntropyAgainst(gophered, idCol,
              textCol, c.model, c.oovPenaltyNats)
            .filter(col("cross_entropy_nats") <= c.maxNats)
            .select(col(idCol))
          gophered.join(keep, Seq(idCol), "left_semi")
        }
        // within-batch resolution next: arrivals in the same batch have
        // no order between them, so components + min-id keeper (hamming 0
        // exact dups are just the radius-0 case)
        val withinDeduped = Corpus.resolveDuplicates(gated0, idCol,
            Corpus.simHashHammingPairs(gated0, idCol, textCol, maxHamming,
              bits, numBands),
            "a_id", "b_id")
          .select(cols: _*)
        val gated = signatureDir match {
          case Some(sd) => nonEmptyParquet(spark, sd) match {
            case Some(sigs) => Corpus.dedupeAgainstSignatures(withinDeduped,
              sigs, idCol, textCol, maxHamming, bits, numBands)
            case None => withinDeduped
          }
          case None => nonEmptyParquet(spark, corpusDir) match {
            case Some(corpus) => Corpus.dedupeAgainstCorpus(withinDeduped,
              corpus, idCol, textCol, maxHamming, bits, numBands)
            case None => withinDeduped
          }
        }
        val quotaed = quota match {
          case Some((srcCol, maxDocs)) =>
            // rank this batch's candidates 1..maxDocs per source, then
            // admit only up to the source's remaining allowance. Used
            // counts come from the persisted (source, used) table when
            // `quotaCountsDir` is set — the production shape, the same
            // decisions as re-aggregating the corpus (CorpusIntakeSpec
            // parity) without scanning accepted text ever again —
            // else from a pruned single-column corpus aggregation.
            val ranked = Corpus.capPerSource(gated, idCol, srcCol, maxDocs)
            val usedFromCorpus = () => nonEmptyParquet(spark, corpusDir)
              .map(_.groupBy(col(srcCol)).agg(count(lit(1)).as("__used")))
            val used = quotaCountsDir match {
              // counts table missing (first batch after enabling it on an
              // existing corpus, or the dir was lost): fall back to
              // re-aggregating the corpus — skipping the allowance check
              // would re-admit up to maxDocs per source on top of
              // everything already accepted. The post-batch maintenance
              // below then seeds the table from the corpus.
              case Some(qd) =>
                nonEmptyParquet(spark, qd).orElse(usedFromCorpus())
              case None => usedFromCorpus()
            }
            used match {
              case Some(u) =>
                ranked.join(broadcast(u), Seq(srcCol), "left")
                  .filter(col("source_rank") +
                    coalesce(col("__used"), lit(0L)) <= maxDocs)
              case None => ranked
            }
          case None => gated
        }
        // freeze the small survivor set once: the corpus write and the
        // signature write must see the SAME rows, not re-evaluations
        val survivors = quotaed.select(cols: _*).localCheckpoint()
        survivors.write.mode("append").parquet(corpusDir)
        signatureDir.foreach { sd =>
          NearDup.simHash(survivors, idCol, textCol, bits)
            .write.mode("append").parquet(sd)
        }
        // maintain the counts table AFTER the corpus append so a crash
        // between the writes under-counts (quota re-admits at most one
        // batch of excess — the same at-least-once caveat as the
        // signature store, resolved by rebuilding counts from the corpus)
        for ((srcCol, _) <- quota; qd <- quotaCountsDir) {
          val batchCounts = survivors.groupBy(col(srcCol))
            .agg(count(lit(1)).as("__used"))
          val merged = nonEmptyParquet(spark, qd) match {
            case Some(prev) => prev.unionByName(batchCounts)
              .groupBy(col(srcCol)).agg(sum(col("__used")).as("__used"))
            // seed a missing table from the corpus (which already
            // includes this batch's append), not from the batch alone —
            // batch-only seeding would erase every earlier source's usage
            case None => nonEmptyParquet(spark, corpusDir)
              .map(_.groupBy(col(srcCol)).agg(count(lit(1)).as("__used")))
              .getOrElse(batchCounts)
          }
          merged.localCheckpoint().write.mode("overwrite").parquet(qd)
        }
      }
    }
    q.awaitTermination()
  }

  private def nonEmptyParquet(spark: SparkSession,
                              dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getLen > 0))
      Some(spark.read.parquet(dir))
    else None
  }
}
