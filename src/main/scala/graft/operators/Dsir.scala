package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023, arXiv:2302.03169): select the k raw-pool documents whose hashed
  * n-gram profile most resembles a TARGET corpus, by Gumbel-top-k
  * resampling with importance weights
  * `w(doc) = p_target(features(doc)) / p_raw(features(doc))`
  * under bag-of-hashed-ngrams models fit on the target corpus and the raw
  * pool respectively.
  *
  * This is the standard pretraining-data curation move when you have a
  * small high-quality target (a wiki/books sample, an eval-adjacent
  * distribution) and a huge crawl to filter: no trained classifier, just
  * two counting passes and a closed-form per-document log-weight.
  *
  * Determinism / oracle contract: feature buckets come from md5 (first 24
  * bits, mod `buckets`), log-probabilities live on the exact-integer
  * `2^-30` nat grid used by the cross-entropy family
  * ([[Corpus.unigramCrossEntropyAgainst]]), and the Gumbel draw is the
  * md5-48-bit uniform from [[Corpus.weightedSampleK]] with both `ln`s
  * floor-quantized onto the same grid — every intermediate a DuckDB query
  * can replay bit-for-bit.
  *
  * Scale shape (the 100 TB posture):
  *  - features are unigrams + bigrams hashed into a FIXED `buckets`-sized
  *    space, so both models are bounded tables (≤ buckets rows) no matter
  *    the corpus size — they broadcast;
  *  - the raw pool is touched twice (model fit + scoring), both passes are
  *    explode → hash → partial-agg map-side combines;
  *  - selection is `orderBy(key).limit(k)` → TakeOrderedAndProject
  *    (per-partition bounded heaps + driver merge of k rows), NOT a global
  *    sort or single-partition window.
  */
object Dsir {

  private val Scale = 1073741824L // 2^30 — exact power-of-two log grid
  private val ScaleD = Scale.toDouble

  /** Unigrams + bigrams of the whitespace token stream — the paper's
    * feature set. Empty array for docs with no tokens. */
  private def grams(text: Column): Column = {
    val t = TextFunctions.tokens(text)
    // wordShingles is empty (not NULL) below 2 tokens, so concat is total
    concat(t, TextFunctions.wordShingles(t, 2))
  }

  /** 24-bit md5 bucket of a gram, mod `buckets` — md5 (not xxhash64) so
    * the oracle can replay the hash nibble-by-nibble. */
  private def bucketOf(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, 6), 16, 10).cast("long") % buckets

  /** Per-document hashed-feature counts: (idCol, bucket, cnt). Documents
    * with zero tokens emit no rows (and are therefore never selected). */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    NearDup.spread(docs)
      .select(col(idCol), explode(grams(col(textCol))).as("__gram"))
      .select(col(idCol), bucketOf(col("__gram"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bag-of-hashed-ngrams model of a corpus: (bucket, cnt) — at most
    * `buckets` rows whatever the corpus size. Fit once, persist, reuse:
    * this is the artifact a streaming intake gate scores every batch
    * against ([[scoreAgainst]]). */
  def fitModel(corpus: DataFrame, idCol: String, textCol: String,
               buckets: Int): DataFrame =
    hashedFeatures(corpus, idCol, textCol, buckets)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Scaled log-weights of `docs` against PRE-FIT target/raw models
    * (both (bucket, cnt) frames from [[fitModel]]):
    * (idCol, lw_scaled) where
    * `lw_scaled = Σ_b cnt_doc[b] · (lp_target[b] − lp_raw[b])` and
    * `lp_m[b] = floor(ln((cnt_m[b]+1) / (total_m + buckets)) · 2^30)`
    * (add-one smoothing over the hashed vocabulary). A doc's score does
    * not depend on which batch it arrives in — the fixed-model property
    * a streaming gate needs. */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
                   targetModel: DataFrame, rawModel: DataFrame,
                   buckets: Int): DataFrame = {
    val docFeat = hashedFeatures(docs, idCol, textCol, buckets)
    val tgtCnt = targetModel.select(col("bucket"), col("cnt").as("__tc"))
    val rawCnt = rawModel.select(col("bucket"), col("cnt").as("__qc"))
    val totals = tgtCnt.agg(sum(col("__tc")).as("__tt"))
      .crossJoin(rawCnt.agg(sum(col("__qc")).as("__tq")))

    def lp(cnt: Column, tot: Column): Column =
      floor(log((coalesce(cnt, lit(0L)).cast("double") + lit(1.0)) /
        (tot.cast("double") + lit(buckets.toDouble))) * lit(ScaleD))
        .cast("long")

    docFeat
      .join(broadcast(tgtCnt), Seq("bucket"), "left")
      .join(broadcast(rawCnt), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__d",
        col("cnt") * (lp(col("__tc"), col("__tt")) -
          lp(col("__qc"), col("__tq"))))
      .groupBy(col(idCol))
      .agg(sum(col("__d")).as("lw_scaled"))
  }

  /** Log-weights of the raw pool against models fit in place — the
    * one-shot batch form ([[dsirSelect]]'s first stage): target model
    * from `target`, raw model from `raw` itself. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int): DataFrame =
    scoreAgainst(raw, idCol, textCol,
      fitModel(target, idCol, textCol, buckets),
      fitModel(raw, idCol, textCol, buckets), buckets)

  /** Gumbel-top-k importance resampling: the k raw documents maximizing
    * `lw + G_i`, `G_i = −ln(−ln u_i)` with the md5-48-bit uniform, both
    * `ln`s floor-quantized to the 2^-30 grid (the inner exponential draw
    * is clamped to ≥ 1 grid unit so the outer log is finite).
    *
    * Returns (idCol, carried `carryCols`, log_weight_nats, sample_key_nats)
    * — the selected set, deterministic under (seed, corpus).
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, k: Int, buckets: Int = 1024,
                 seed: String = "", carryCols: Seq[String] = Nil)
  : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lw = importanceWeights(raw, target, idCol, textCol, buckets)
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    // (0,1] uniform, exact binary fraction in both engines
    val u = (conv(substring(h, 1, 12), 16, 10).cast("double") + lit(1.0)) /
      lit(281474976710656.0) // 2^48
    val eScaled = greatest(-floor(log(u) * lit(ScaleD)).cast("long"), lit(1L))
    val g = -floor(log(eScaled.cast("double") / lit(ScaleD)) * lit(ScaleD))
      .cast("long")
    val keyed = lw
      .withColumn("__key_scaled", col("lw_scaled") + g)
    val meta = raw.select(col(idCol) +: carryCols.map(col): _*)
    keyed.join(meta, Seq(idCol))
      .orderBy(col("__key_scaled").desc, col(idCol).asc)
      .limit(k)
      .select((col(idCol) +: carryCols.map(col)) ++ Seq(
        (col("lw_scaled").cast("double") / lit(ScaleD))
          .as("log_weight_nats"),
        (col("__key_scaled").cast("double") / lit(ScaleD))
          .as("sample_key_nats")): _*)
  }
}
