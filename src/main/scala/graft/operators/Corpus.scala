package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-preparation operators for a training-data pipeline (SURVEY §7.7
  * extension): benchmark decontamination, sequence packing, PII scrubbing,
  * and SimHash Hamming-band near-dup candidates.
  *
  * Scale posture for each is stated on the method; the common theme is that
  * the per-document side never shuffles more than once, and every join
  * against reference data (eval sets, hot lists) is a broadcast.
  */
object Corpus {

  // one corpus-spreading policy for all operators (see NearDup.spread)
  private def spread(docs: DataFrame): DataFrame = NearDup.spread(docs)

  // Scala's << shifts mod 64, so (1L << 64) - 1 is 0, not all-ones — a
  // bits=64/numBands=1 call would put every doc in band value 0 and turn
  // the banded join into a full cross join
  private[graft] def bandMask(bandBits: Int): Long =
    if (bandBits >= 64) -1L else (1L << bandBits) - 1

  /** Benchmark decontamination: per-document n-gram overlap against an
    * evaluation set (the standard guard against test-set leakage into
    * training data). Emits one row per corpus doc with >= n words:
    * (doc_id, n_shingles, n_overlap, overlap_ratio, contaminated).
    *
    * Scale: eval sets are small (KBs-MBs of benchmark text) while the
    * corpus is the 100 TB side, so the distinct eval shingle set is
    * BROADCAST and the corpus is scanned exactly once — no shuffle of
    * corpus data at all; the only exchange is the per-doc aggregation. */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int,
                    maxOverlapRatio: Double): DataFrame = {
    def shingles(df: DataFrame) = spread(df)
      .select(col(idCol).as("doc_id"),
        array_distinct(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), n)).as("__sh"))
      .filter(size(col("__sh")) > 0)
    val evalShingles = shingles(evalDocs)
      .select(explode(col("__sh")).as("s")).distinct()
    val posting = shingles(corpus)
      .select(col("doc_id"), size(col("__sh")).as("n_shingles"),
        explode(col("__sh")).as("s"))
    posting
      .join(broadcast(evalShingles).withColumn("__hit", lit(1)), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(first(col("n_shingles")).as("n_shingles"),
        count(col("__hit")).as("n_overlap"))
      .withColumn("overlap_ratio",
        col("n_overlap").cast("double") / col("n_shingles").cast("double"))
      .withColumn("contaminated", col("overlap_ratio") > maxOverlapRatio)
  }

  /** Sequence packing: lay documents head-to-tail per shard and chunk the
    * stream at a fixed token budget (concat-then-chunk, the GPT-style
    * packing where a document may straddle two chunks). Emits
    * (doc_id, shard, n_tok, start_offset, bin, bin_offset) with `bin`
    * numbering budget-sized chunks within the shard and `bin_offset` the
    * document's start position inside its first bin.
    *
    * Deterministic: order within a shard is by `idCol`. Scale: one shuffle
    * on `shard` (pick shard count ~ O(executors × few) so each task's sort
    * is corpus/shards); the running sum is a single window pass. */
  def packSequences(docs: DataFrame, idCol: String, shard: Column,
                    tokenCount: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"), shard.cast("long").as("shard"),
        tokenCount.cast("long").as("n_tok"))
      .withColumn("start_offset", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", expr(s"start_offset div $budget"))
      .withColumn("bin_offset", col("start_offset") % budget)
  }

  /** PII scrubbing: apply (name, pattern, replacement) rules in order and
    * count matches per rule BEFORE redaction. Emits the input's id column,
    * the scrubbed text, and one `n_<name>` count per rule.
    *
    * Patterns are applied with global replacement. Counts are computed on
    * the ORIGINAL text, so overlapping rules each report what they saw
    * (redaction order still matters for the scrubbed output, earlier rules
    * win). Scale: pure scalar work — stays inside whole-stage codegen, no
    * shuffle, no UDF. */
  def scrubPii(df: DataFrame, idCol: String, textCol: String,
               rules: Seq[(String, String, String)]): DataFrame = {
    require(rules.nonEmpty, "scrubPii needs at least one rule")
    val scrubbed = rules.foldLeft(col(textCol)) { case (acc, (_, pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }
    val counts = rules.map { case (name, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast("int").as(s"n_$name")
    }
    df.select(col(idCol) +: scrubbed.as("scrubbed") +: counts: _*)
  }

  /** PII pseudonymization: the linkage-preserving alternative to
    * [[scrubPii]] — every match of each rule's pattern is replaced by
    * `prefix + md5(match)[0..8)` (graft.expressions.RegexHashReplace), so
    * the same email/phone maps to the same token across the whole corpus
    * and joins/group-bys on entities still work, while the raw value is
    * gone. Rules are (name, pattern, tokenPrefix), applied in order
    * (earlier rules win on overlaps, like scrubPii); emits the id column,
    * `pseudonymized` text, and an `n_<name>` pre-replacement count per
    * rule.
    *
    * Scale: pure scalar projection — one matcher pass per rule per row,
    * inside whole-stage codegen, no shuffle. */
  def pseudonymizePii(df: DataFrame, idCol: String, textCol: String,
                      rules: Seq[(String, String, String)]): DataFrame = {
    require(rules.nonEmpty, "pseudonymizePii needs at least one rule")
    graft.GraftExtensions.register(df.sparkSession)
    val replaced = rules.foldLeft(col(textCol)) { case (acc, (_, pat, pre)) =>
      call_function("regex_hash_replace", acc, lit(pat), lit(pre))
    }
    val counts = rules.map { case (name, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast("int").as(s"n_$name")
    }
    df.select(col(idCol) +: replaced.as("pseudonymized") +: counts: _*)
  }

  /** Incremental (day-2 crawl) near-dup gate: drop new-batch documents
    * that are within `maxHamming` SimHash distance of ANY existing corpus
    * document. The batch side is the small side; both sides are banded
    * (same pigeonhole guarantee as [[simHashHammingPairs]]) so the check
    * is an equi-join on band values, never batch × corpus. Emits the
    * SURVIVING batch rows (original columns).
    *
    * Scale: corpus fingerprints should be PRECOMPUTED and stored (they
    * never change); passing raw corpus text here recomputes them — fine
    * for verification, wasteful daily. Use [[dedupeAgainstSignatures]]
    * with the persisted signature table for the production shape. */
  def dedupeAgainstCorpus(batch: DataFrame, corpus: DataFrame, idCol: String,
                          textCol: String, maxHamming: Int, bits: Int = 32,
                          numBands: Int = 4): DataFrame =
    dedupeAgainstSignatures(batch,
      NearDup.simHash(corpus, idCol, textCol, bits),
      idCol, textCol, maxHamming, bits, numBands)

  /** [[dedupeAgainstCorpus]] against PRECOMPUTED corpus fingerprints — the
    * production shape its scaladoc calls for: the accepted corpus's text is
    * never re-read or re-hashed. `signatures` is (doc_id, simhash) as
    * produced by `NearDup.simHash` with the SAME bits; the store is tiny
    * (8 bytes/doc) and append-only — accept a batch, append its
    * signatures. Join shape is identical to the text variant: banded
    * equi-join, never batch × corpus. */
  def dedupeAgainstSignatures(batch: DataFrame, signatures: DataFrame,
                              idCol: String, textCol: String,
                              maxHamming: Int, bits: Int = 32,
                              numBands: Int = 4): DataFrame = {
    require(bits % numBands == 0, "bits must divide into equal bands")
    require(maxHamming <= numBands - 1,
      s"pigeonhole completeness needs maxHamming <= numBands - 1")
    val bandBits = bits / numBands
    val dupIds = explodeBands(
        NearDup.simHash(batch, idCol, textCol, bits), numBands, bandBits)
      .as("x")
      .join(explodeBands(signatures, numBands, bandBits).as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val"))
      .filter(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
        <= maxHamming)
      .select(col("x.doc_id").as("__dup_id")).distinct()
    batch.join(dupIds, col(idCol) === col("__dup_id"), "left_anti")
  }

  /** Explode a (doc_id, simhash) signature frame into one row per band. */
  private def explodeBands(sigs: DataFrame, numBands: Int,
                           bandBits: Int): DataFrame = {
    val mask = bandMask(bandBits)
    sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band_id"),
            shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))
              .as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_id"),
        col("b.band_val"))
  }

  /** Per-source quota (corpus curation's "cap every domain"): keep at most
    * `maxDocs` documents per source, selected by a deterministic md5
    * ranking of ids — a run-stable unbiased sample even when ids encode
    * crawl order. Emits survivors plus `source_rank` (1..maxDocs).
    *
    * Scale: the rank-limit window is recognized by Spark's
    * WindowGroupLimit, so each map task keeps at most `maxDocs` rows per
    * source BEFORE the exchange — a mega-domain never funnels through one
    * task unbounded (asserted in CorpusSpec). */
  def capPerSource(docs: DataFrame, idCol: String, sourceCol: String,
                   maxDocs: Int): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("source_rank", row_number().over(w).cast("int"))
      .filter(col("source_rank") <= maxDocs)
  }

  /** Training-mixture sampling: each source is kept at its mixture WEIGHT —
    * 0.3 drops ~70% of the source, 2.5 repeats every doc twice and a
    * ~50% subset a third time (upsampling = repetition, how mixtures are
    * actually fed to training). Deterministic: the fractional part keeps a
    * doc iff its md5 16-bit bucket clears a per-source threshold, so the
    * same doc survives (or not) on every run, engine, and partitioning —
    * no sampleBy RNG state. Weights are quantized driver-side to integer
    * (copies, threshold/65536) pairs, so NEITHER engine does float
    * arithmetic on the data path. Emits (idCol, sourceCol, copy_id).
    *
    * Scale: one broadcast join against the (tiny) weights table + one
    * scalar filter/explode — no shuffle of the corpus at all. */
  def mixSources(docs: DataFrame, idCol: String, sourceCol: String,
                 weights: Map[String, Double],
                 defaultWeight: Double = 1.0): DataFrame = {
    def quantize(w: Double): (Int, Int) = {
      require(w >= 0, s"mixture weight must be >= 0, got $w")
      val whole = math.floor(w).toInt
      (whole, math.floor((w - whole) * 65536.0).toInt)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val (defWhole, defThr) = quantize(defaultWeight)
    val wdf = weights.toSeq.map { case (s, w) =>
      val (n, t) = quantize(w); (s, n, t)
    }.toDF(sourceCol, "__nw", "__thr")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int")
    val copies = coalesce(col("__nw"), lit(defWhole)) +
      when(bucket < coalesce(col("__thr"), lit(defThr)), 1).otherwise(0)
    docs.select(col(idCol), col(sourceCol))
      .join(broadcast(wdf), Seq(sourceCol), "left")
      .withColumn("__n", copies)
      .select(col(idCol), col(sourceCol),
        explode(when(col("__n") >= 1, sequence(lit(1), col("__n")))
          .otherwise(array().cast("array<int>"))).as("copy_id"))
  }

  /** Overlapping-window document chunking (the RAG/embedding-prep shape):
    * each doc's token stream is cut into chunks of `chunkSize` tokens whose
    * starts step by `chunkSize - overlap`. A trailing start whose window
    * adds no new tokens beyond the previous chunk (start + overlap >= n) is
    * dropped, except start 0. Emits (doc_id, chunk_id, start_tok, n_tok,
    * chunk_text); docs with no tokens emit nothing.
    *
    * Scale: pure per-row explode — no shuffle, no UDF; row growth is
    * n/stride per doc, the expected output shape for an embedding stage
    * downstream. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val base = spread(docs)
      .select(col(idCol).as("doc_id"), toks.as("__t"), size(toks).as("__n"))
      .filter(col("__n") > 0)
    val starts = filter(
      sequence(lit(0), col("__n") - 1, lit(stride)),
      s => s === 0 || s + overlap < col("__n"))
    base
      .select(col("doc_id"), col("__t"), col("__n"),
        explode(starts).as("start_tok"))
      .select(col("doc_id"),
        expr(s"start_tok div $stride").cast("int").as("chunk_id"),
        col("start_tok"),
        least(lit(chunkSize), col("__n") - col("start_tok")).as("n_tok"),
        array_join(slice(col("__t"), col("start_tok") + 1, lit(chunkSize)),
          " ").as("chunk_text"))
  }

  /** SimHash near-dup pairs within a Hamming radius, found WITHOUT an
    * all-pairs comparison: the `bits`-bit fingerprint is cut into
    * `numBands` equal bands, and by pigeonhole any pair within Hamming
    * distance `maxHamming` <= numBands - 1 agrees exactly on at least one
    * band — so candidates are an equi-join on (band_id, band_value) and the
    * exact distance check (codegen'd bit_count(xor)) runs only on
    * candidates. Emits (a_id, b_id, hamming), exact and complete for
    * maxHamming <= numBands - 1 (enforced).
    *
    * Scale: same posture as MinHash-LSH banding — shuffle is O(docs ×
    * numBands) on band keys, never O(docs²). Two rules keep candidate
    * buckets small at corpus scale (measured: violating both turned the
    * 10× probe ~16× superlinear, PLANS.md):
    *  - run EXACT dedup first ([[Dedup]] content-hash groups): identical
    *    docs share every band by definition, so a set of k copies
    *    contributes k²/2 candidate pairs under ANY banding scheme;
    *  - size the band space to the corpus: `bits = 64` with 4 bands gives
    *    16-bit bands (65,536 values each), 256× finer buckets than the
    *    default 32-bit/8-bit-band configuration.
    * Residual hot-band skew beyond that is AQE skew-join territory. */
  def simHashHammingPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int, bits: Int = 32,
                          numBands: Int = 4,
                          maxBucket: Int = 0): DataFrame = {
    require(bits % numBands == 0, "bits must divide into equal bands")
    require(maxHamming <= numBands - 1,
      s"pigeonhole completeness needs maxHamming <= numBands - 1 " +
        s"(got $maxHamming vs $numBands bands)")
    bandedHammingPairs(NearDup.simHash(docs, idCol, textCol, bits),
      "doc_id", "simhash", maxHamming, bits, numBands, maxBucket)
  }

  /** Pigeonhole-banded Hamming pairs over an EXISTING fingerprint column
    * (any 64-bit-or-narrower signature: SimHash, a perceptual media hash,
    * a rolling document fingerprint). The banding contract and scale
    * posture are [[simHashHammingPairs]]'s; this is the reusable core it
    * delegates to. Emits `(a_id, b_id, hamming)`.
    *
    * `maxBucket` (0 = off) drops (band_id, band_val) buckets holding more
    * than `maxBucket` docs BEFORE the self-join — the band-space analogue
    * of the hot-shingle `maxDf` cap: a saturated bucket is a replica/
    * boilerplate clique contributing bucket²/2 candidate pairs, and its
    * members' duplicate status is better established by exact dedup
    * upstream. With the cap, Σ bucket² ≤ maxBucket × docs × numBands —
    * linear in the corpus for fixed maxBucket. Pairs whose EVERY shared
    * band is saturated are missed (the documented, deliberate trade);
    * pairs sharing any surviving band are still found and still
    * exact-distance-checked. */
  def bandedHammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
                         maxHamming: Int, bits: Int,
                         numBands: Int,
                         maxBucket: Int = 0): DataFrame = {
    require(bits % numBands == 0, "bits must divide into equal bands")
    require(maxHamming <= numBands - 1,
      s"pigeonhole completeness needs maxHamming <= numBands - 1 " +
        s"(got $maxHamming vs $numBands bands)")
    val bandBits = bits / numBands
    val mask = bandMask(bandBits)
    val sig = sigs.select(col(idCol).as("doc_id"), col(sigCol).as("simhash"))
    val all = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))
            .as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_id"), col("b.band_val"))
    val banded =
      if (maxBucket <= 0) all
      else {
        // saturated-bucket list is tiny by construction (≤ postings /
        // maxBucket entries) — broadcast anti-join, no posting re-shuffle
        val hot = all.groupBy(col("band_id"), col("band_val"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
          .select(col("band_id"), col("band_val"))
        all.join(broadcast(hot), Seq("band_id", "band_val"), "left_anti")
      }
    banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** End-to-end near-dup resolution: candidate PAIRS (from
    * [[simHashHammingPairs]], `NearDup.minHashLshPairs`, or an embedding
    * bucket join) → connected components → one surviving document per
    * duplicate group. This is the call a corpus owner actually makes;
    * the pieces ([[Clusters.connectedComponents]], keeper choice,
    * anti-join) are easy to wire WRONG — e.g. keeping per-PAIR winners
    * leaves A–B–C chains with two survivors.
    *
    * Keeper per cluster: the row maximizing `prefer` (ties → minimum
    * id), or the minimum id when `prefer` is None. Emits the surviving
    * rows with `cluster_id` and `cluster_size` attached (singletons
    * included, size 1).
    *
    * Scale: component resolution is O(log diameter) rounds over the
    * PAIRS (a tiny fraction of the corpus); the keeper decision runs on
    * a NARROW (id, rank, cluster_id) projection — the per-cluster window
    * sort funnels only those three columns through a hot task even for a
    * pathologically large duplicate cluster, never the document text —
    * and the surviving ids join back to the full rows on the id key (one
    * extra id-keyed shuffle, the price of keeping text out of the
    * sort). */
  def resolveDuplicates(docs: DataFrame, idCol: String,
                        pairs: DataFrame, aCol: String, bCol: String,
                        prefer: Option[Column] = None,
                        maxIter: Int = 20): DataFrame = {
    val components = Clusters.connectedComponents(
      docs.select(col(idCol)), idCol, pairs, aCol, bCol, maxIter)
    // keeper = first row under (prefer desc NULLS LAST, id asc) — a plain
    // sort order, so the id may be ANY orderable type (string URLs, content
    // hashes, numeric keys) rather than something negatable
    val rank = prefer.getOrElse(lit(0))
    val narrow = docs.select(col(idCol), rank.as("__rank"))
      .join(components, idCol)
    val wCluster = Window.partitionBy(col("cluster_id"))
    val keepers = narrow
      .withColumn("cluster_size", count(lit(1)).over(wCluster))
      .withColumn("__rn", row_number().over(
        wCluster.orderBy(col("__rank").desc, col(idCol).asc)))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
    docs.join(keepers, idCol)
  }

  /** Paragraph-level exact dedup (the CCNet formulation): across the
    * WHOLE corpus, each distinct paragraph survives only at its first
    * occurrence — by (doc id, paragraph index) order — and every later
    * copy is dropped; documents are reassembled from their surviving
    * paragraphs. Boilerplate (headers, cookie banners, license blocks)
    * disappears from every document but the first one carrying it.
    *
    * Emits (idCol, text, n_para_kept, n_para_dropped); documents whose
    * every paragraph was dropped remain with empty text (filter on
    * `n_para_kept` to drop them).
    *
    * Scale: two shuffles — one hash-partitioned window keyed by the
    * paragraph hash (first-occurrence choice), one groupBy on the doc id
    * (reassembly). Paragraph hashes are near-unique, so the window key
    * is high-cardinality and skew-free; the hot-key danger of a
    * frequency-capped variant doesn't arise because the window computes
    * per-hash rank, not per-hash pairs. */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String,
                      sep: String = "\n"): DataFrame = {
    val paras = explodeParagraphs(docs, idCol, textCol, sep)
    val firstOnly = paras
      .withColumn("__occ", row_number().over(
        Window.partitionBy(col("para"))
          .orderBy(col(idCol), col("para_idx"))))
    val perDoc = firstOnly
      .groupBy(col(idCol))
      .agg(
        concat_ws(sep, array_sort(collect_list(
          when(col("__occ") === 1,
            struct(col("para_idx"), col("para"))))).getField("para"))
          .as(textCol),
        count(when(col("__occ") === 1, lit(1))).as("n_para_kept"),
        count(when(col("__occ") =!= 1, lit(1))).as("n_para_dropped"))
    // docs with no non-empty paragraphs at all still come back (empty text)
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_para_kept"), lit(0L)).as("n_para_kept"),
        coalesce(col("n_para_dropped"), lit(0L)).as("n_para_dropped"))
  }

  /** Boilerplate removal by document frequency: a paragraph that appears
    * in MORE than `maxDocFrequency` distinct documents is removed from
    * EVERY document (cookie banners, nav menus, license headers — text
    * whose very ubiquity marks it as template, not content). Complements
    * [[dedupParagraphs]], which keeps exactly one global copy: for
    * boilerplate, the right copy count is zero.
    *
    * Emits (idCol, text, n_para_kept, n_para_dropped), empty-text rows
    * retained like [[dedupParagraphs]].
    *
    * Scale: the paragraph df-aggregate is a two-phase count-distinct on
    * the paragraph key (partial aggregation applies since a doc's
    * paragraphs are distinct within the explode); the filter join is on
    * the same key, then one reassembly groupBy. The df table is
    * paragraph-keyed, high-cardinality, skew-free. */
  def dropBoilerplateParagraphs(docs: DataFrame, idCol: String,
                                textCol: String, maxDocFrequency: Long,
                                sep: String = "\n"): DataFrame = {
    require(maxDocFrequency >= 1,
      s"maxDocFrequency must be >= 1, got $maxDocFrequency")
    val paras = explodeParagraphs(docs, idCol, textCol, sep)
    val df = paras.groupBy(col("para"))
      .agg(count_distinct(col(idCol)).as("__df"))
    val kept = paras.join(df, "para")
      .withColumn("__keep", col("__df") <= maxDocFrequency)
    val perDoc = kept
      .groupBy(col(idCol))
      .agg(
        concat_ws(sep, array_sort(collect_list(
          when(col("__keep"), struct(col("para_idx"), col("para")))))
          .getField("para")).as(textCol),
        count(when(col("__keep"), lit(1))).as("n_para_kept"),
        count(when(!col("__keep"), lit(1))).as("n_para_dropped"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_para_kept"), lit(0L)).as("n_para_kept"),
        coalesce(col("n_para_dropped"), lit(0L)).as("n_para_dropped"))
  }
  // sep is a LITERAL separator in both the split and the reassembly
  // (split() alone would treat it as a regex — a "|" separator would
  // split between every character)
  private def explodeParagraphs(docs: DataFrame, idCol: String,
                                textCol: String, sep: String): DataFrame =
    docs
      .select(col(idCol), posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("para_idx", "para")))
      .filter(length(col("para")) > 0)

  /** Deterministic training-shard assignment: every document gets a
    * `shard_id` in [0, nShards) and a dense 1-based `shard_pos` within its
    * shard, both pure functions of (seed, id) — the reproducible global
    * shuffle a training data-loader needs (same seed ⇒ same order on every
    * run and every cluster size; new seed ⇒ a fresh permutation). The hash
    * is md5, not a JVM hash, so any engine can recompute the layout.
    *
    * Scale: shard assignment is a scalar projection; the position window
    * is partitioned by shard, so shards number/sort in parallel but each
    * shard's sort runs in one task — size nShards so a shard (~N/nShards
    * rows) fits a task, which is the same constraint the training side
    * puts on shard files anyway. Writing: `partitionBy("shard_id")` with
    * `sortWithinPartitions(shard_pos)` lays files out in read order. */
  def shardForTraining(docs: DataFrame, idCol: String, nShards: Int,
                       seed: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // 48 bits of the digest drive shard choice — enough that even a
    // task-sized-shard layout over a 100 TB corpus (nShards in the
    // hundreds of thousands) stays uniform; the full digest breaks ties
    // in the in-shard order so position never depends on id ordering
    // beyond the final deterministic tiebreak
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val shard = (conv(substring(h, 1, 12), 16, 10).cast("long") % nShards)
      .cast("int")
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(col("__h"), col(idCol))
    docs.withColumn("__h", h)
      .withColumn("shard_id", shard)
      .withColumn("shard_pos", row_number().over(w).cast("int"))
      .drop("__h")
  }

  /** Per-source token budget (the second half of corpus curation's quota
    * story: [[capPerSource]] caps DOCUMENTS, this caps TOKENS): documents
    * are md5-ranked within their source and kept while the running token
    * total stays within `maxTokens` — a deterministic, unbiased prefix.
    * Because token counts are positive the running total is monotonic, so
    * `cum_tokens <= maxTokens` IS the prefix property (no dropped doc is
    * followed by a kept one).
    *
    * Emits the input columns plus `n_tokens` and `cum_tokens`.
    *
    * Scale: one window per source — sources fill in parallel, but a single
    * mega-source funnels through one task. Cap docs-per-source first
    * ([[capPerSource]] with maxDocs ~ maxTokens / typical doc) when a
    * source can exceed task-sized row counts; the budget filter here then
    * sees a bounded stream. */
  def capTokensPerSource(docs: DataFrame, idCol: String, sourceCol: String,
                         tokenCount: Column, maxTokens: Long): DataFrame = {
    require(maxTokens >= 0, s"maxTokens must be >= 0, got $maxTokens")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens", tokenCount.cast("bigint"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= maxTokens)
  }

  /** Gopher-style per-rule quality flags (Rae et al. 2021's document
    * filters, the public-rule formulation): one boolean per rule plus the
    * conjunction, so a curation run can report WHY documents fail, not
    * just how many (contrast with the single blended score in
    * `TextFunctions`-based gates). Rules over whitespace tokens:
    * word count in [minWords, maxWords]; mean word length in
    * [minMeanWordLen, maxMeanWordLen]; '#'/'...' symbol-to-word ratio <=
    * maxSymbolRatio; fraction of words containing an alphabetic char >=
    * minAlphaRatio; >= minStopwordHits distinct stopword hits.
    *
    * Scale: a pure scalar projection — fuses into the scan, no shuffle. */
  def gopherQualityFlags(docs: DataFrame, idCol: String, textCol: String,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minMeanWordLen: Double = 3.0,
                         maxMeanWordLen: Double = 10.0,
                         maxSymbolRatio: Double = 0.1,
                         minAlphaRatio: Double = 0.8,
                         minStopwordHits: Int = 2): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.withColumn("__t", toks)
      .withColumn("n_words", size(col("__t")))
    val nW = col("n_words").cast("double")
    val meanLen = aggregate(transform(col("__t"), t => length(t)), lit(0),
      (a, v) => a + v).cast("double") / nullif(nW, lit(0.0))
    val symbolRatio =
      regexp_count(col(textCol), lit("#|\\.\\.\\.")).cast("double") /
        nullif(nW, lit(0.0))
    val alphaRatio =
      size(filter(col("__t"), t => t.rlike("[a-zA-Z]"))).cast("double") /
        nullif(nW, lit(0.0))
    val stopHits = size(array_intersect(col("__t"),
      array(TextFunctions.stopwords.map(lit): _*)))
    base
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", coalesce(symbolRatio, lit(0.0)))
      .withColumn("alpha_ratio", coalesce(alphaRatio, lit(0.0)))
      .withColumn("stop_hits", stopHits)
      .withColumn("flag_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("flag_mean_word_len",
        coalesce(col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen, lit(false)))
      .withColumn("flag_symbol_ratio", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("flag_alpha_ratio", col("alpha_ratio") >= minAlphaRatio)
      .withColumn("flag_stopwords", col("stop_hits") >= minStopwordHits)
      .withColumn("keep",
        col("flag_word_count") && col("flag_mean_word_len") &&
          col("flag_symbol_ratio") && col("flag_alpha_ratio") &&
          col("flag_stopwords"))
      .drop("__t")
  }

  /** Corpus vocabulary induction (tokenizer-training prep): the `topK`
    * most frequent whitespace tokens with occurrence and document
    * frequencies, densely ranked by (occurrences desc, token asc) — a
    * deterministic order any engine reproduces.
    *
    * Scale: explode + two-phase count aggregate (a doc's repeated tokens
    * collapse map-side), then a global top-k rank. The rank window has no
    * partition key, but Spark plans the rank<=topK filter as a bounded
    * partial top-k per partition + merge (TakeOrderedAndProject — or
    * WindowGroupLimit where the limit isn't pushed), so no task ever
    * sorts the whole vocabulary (asserted in R4OpsSpec). */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
                 topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = spread(docs).select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col(idCol)).as("n_docs"))
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("token"))).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** Deterministic score-proportional sampling (soft filtering): each
    * document is kept iff its md5-derived uniform draw `sample_u` ∈ [0,1)
    * falls below `keepProb` (any per-row probability expression — a
    * quality score, a source weight, a length curve). Unlike
    * `df.sample`, the draw is a pure function of (seed, id): re-runs,
    * retries, and other engines keep EXACTLY the same rows, and changing
    * the probability column re-uses the same draws (monotone: raising a
    * doc's keepProb can only add it, never drop it).
    *
    * The draw is the first 48 digest bits over 2^48 — an exact binary
    * fraction, so the `<` comparison is reproducible across engines.
    *
    * Scale: pure scalar projection; fuses into the scan. */
  def sampleByScore(docs: DataFrame, idCol: String, keepProb: Column,
                    seed: String = ""): DataFrame = {
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val u = conv(substring(h, 1, 12), 16, 10).cast("double") /
      lit(281474976710656.0) // 2^48
    docs.withColumn("sample_u", u).filter(col("sample_u") < keepProb)
  }

  /** Unigram-commonness quality buckets — the CCNet head/middle/tail
    * split, log-free. Each document is scored by the mean RELATIVE corpus
    * document frequency of its token instances: a doc of everyday words
    * scores near the corpus ceiling, one full of typos / boilerplate
    * markup / rare garbage tokens scores low. `rel_mean_df` is
    * scale-invariant (divided by corpus doc count), so the same
    * thresholds hold from sf0.001 to 100 TB.
    *
    * Deliberately integer-exact (the repo-wide no-ln discipline, same
    * route as q57's idf): the score is one BIGINT sum over token
    * instances followed by two exactly-rounded divisions, so any engine
    * reproduces the buckets bit-for-bit. A production CCNet pipeline
    * would wrap a log around exactly this ratio; the bucket boundaries
    * are monotone either way.
    *
    * Scale: one explode to (doc, token); the token→df table is an
    * aggregate bounded by vocabulary size; the lookup join shuffles on
    * token (AQE broadcasts it while the vocab fits) and the per-doc
    * aggregate shuffles on doc id — the TF-IDF posture (q57). */
  def commonnessBuckets(docs: DataFrame, idCol: String, textCol: String,
                        headMinRelDf: Double,
                        tailMaxRelDf: Double): DataFrame = {
    require(headMinRelDf >= tailMaxRelDf,
      s"head threshold $headMinRelDf must be >= tail threshold $tailMaxRelDf")
    val toks = spread(docs).select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
    val df = toks.groupBy(col("token"))
      .agg(count_distinct(col(idCol)).as("__df"))
    val perDoc = toks.join(df, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(col("__df")).as("sum_df"))
    // the per-doc aggregate has one row per doc-with-tokens, so the
    // corpus doc count is a count over IT — the previous formulation
    // re-tokenized and re-exploded the whole corpus a third time just to
    // count distinct ids (and its exchange, unlike this one, could not
    // be reused against the main branch)
    val nDocs = perDoc.agg(count(lit(1)).as("__n_docs"))
    val scored = perDoc
      .crossJoin(broadcast(nDocs))
      .withColumn("rel_mean_df",
        col("sum_df").cast("double") / col("n_tokens") / col("__n_docs"))
    scored
      .withColumn("bucket",
        when(col("rel_mean_df") >= headMinRelDf, lit("head"))
          .when(col("rel_mean_df") < tailMaxRelDf, lit("tail"))
          .otherwise(lit("middle")))
      .select(col(idCol), col("n_tokens"), col("sum_df"),
        col("rel_mean_df"), col("bucket"))
  }

  /** Scheme-authority domain of a URL column (lowercased, port/path/query
    * stripped). Pure scalar regex — fuses into the scan. */
  def domainOf(url: Column): Column =
    regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Web-curation domain gate: derive each document's domain from
    * `urlCol`, drop documents whose domain is in `blocklist` (exact,
    * case-insensitive), and annotate survivors with their domain's
    * corpus-wide document count (the crawl-frequency signal downstream
    * per-domain caps consume).
    *
    * Scale: blocklists are small curated lists (KBs), so the gate is a
    * BROADCAST LeftAnti join — the corpus never shuffles for it. The
    * domain count is a two-phase aggregate on domain (bounded by distinct
    * domains) joined back by domain; a pathological single-domain crawl
    * concentrates the count join on one key, but the count table is tiny
    * so AQE broadcasts it back. */
  def domainGate(docs: DataFrame, idCol: String, urlCol: String,
                 blocklist: DataFrame, blockCol: String): DataFrame = {
    // NULL/unparseable urls fold to domain '' rather than NULL: they are
    // not blocklisted (the contract is "drop only blocklisted domains"),
    // and a NULL domain would silently vanish in the non-null-safe count
    // join below
    val withDomain = docs.withColumn("domain",
      coalesce(domainOf(col(urlCol)), lit("")))
    val blocked = blocklist
      .select(lower(col(blockCol)).as("domain")).distinct()
    val kept = withDomain.join(broadcast(blocked), Seq("domain"), "left_anti")
    val counts = kept.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_domain_docs"))
    kept.join(counts, Seq("domain"))
  }

  /** Cross-source contamination matrix: for every pair of sources, how
    * many DISTINCT word n-gram shingle types they share, plus each side's
    * shingle-type total and the resulting Jaccard overlap. The standard
    * "is subcorpus A secretly a re-crawl of subcorpus B" audit before
    * mixing sources into a training run.
    *
    * Scale: the corpus collapses to distinct (source, shingle) rows
    * FIRST, so posting lists are per-source — a shingle's row count is
    * bounded by the number of sources (dozens), not by document count;
    * the self-join on shingle therefore emits at most C(sources, 2) rows
    * per shingle, never a quadratic-in-docs blowup. Everything after the
    * first distinct is proportional to vocabulary, not corpus, size. */
  def crossSourceOverlap(docs: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, shingleN: Int): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    val sh = spread(docs)
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), shingleN)).as("shingle"))
      .distinct()
    val totals = sh.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"))
    val shared = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(totals.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n_shingles", "n_shingles_a"), "source_a")
      .join(totals.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n_shingles", "n_shingles_b"), "source_b")
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("n_shingles_a") + col("n_shingles_b") - col("n_shared")))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_shingles_a"), col("n_shingles_b"), col("jaccard"))
  }

  /** BPE merge-candidate statistics: the `topK` most frequent ADJACENT
    * CHARACTER PAIRS inside words across the corpus — the counts the
    * first merge round of byte-pair-encoding tokenizer training consumes
    * (and re-running on merged text gives subsequent rounds).
    *
    * Scale: same posture as [[vocabulary]] — explode to (word) then to
    * (pair), two-phase count, WindowGroupLimit-capped global top-k. The
    * pair space is tiny (alphabet²), so the aggregate output is bounded
    * regardless of corpus size. */
  def bpePairStats(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val words = spread(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) >= 2)
    // adjacent pairs: substring windows over the bound word column
    val pairs = words.select(explode(transform(
      sequence(lit(1), length(col("__w")) - 1),
      i => col("__w").substr(i, lit(2)))).as("pair"))
    pairs.groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occurrences").desc, col("pair"))).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** Per-document exact-span duplication profile: the fraction of a
    * document's distinct `spanLen`-token spans that also occur verbatim in
    * at least one OTHER document. This is the span-granular form of exact
    * substring deduplication for training corpora — docs with a high
    * `dup_fraction` are mostly stitched from text that exists elsewhere
    * (mirrors, quotes, boilerplate) even when no single whole-doc
    * near-dup test fires.
    *
    * Emits (doc_id, n_spans, n_shared_spans, dup_fraction) for every doc
    * with >= spanLen tokens.
    *
    * Scale: a span is SHARED iff its distinct-doc support df > 1, so
    * `n_shared = n_spans − (spans this doc alone owns)` — and a df = 1
    * span has exactly one owner. That turns the profile into ONE
    * `groupBy(span-hash)` (postings are span-distinct per doc, so
    * count(*) IS the distinct-doc count; map-side partial agg collapses
    * hot spans before the exchange — the hotter the corpus, the LESS
    * data shuffles), a per-owner count over df = 1 spans only, and a
    * join back to the 1-row-per-doc span counts (broadcast-sized under
    * AQE). Postings carry (doc_id, 8-byte hash), never span text. No
    * full-posting window sort, no second full-posting shuffle — those
    * were the cost of the previous `count over (partition by hash)`
    * formulation (2.4 s → 1.4 s on the sf0.1 bench). No pair explosion:
    * cost is linear in total postings regardless of how hot a span is. */
  def spanDuplication(docs: DataFrame, idCol: String, textCol: String,
                      spanLen: Int): DataFrame = {
    val spans = spread(docs)
      .select(col(idCol).as("doc_id"),
        array_distinct(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), spanLen)).as("__sp"))
      .filter(size(col("__sp")) > 0)
    val perDoc = spans.select(col("doc_id"), size(col("__sp")).as("n_spans"))
    val posting = spans
      .select(col("doc_id"), explode(col("__sp")).as("__s"))
      .select(col("doc_id"), xxhash64(col("__s")).as("__h"))
    val uniqueOwned = posting
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__df"), min(col("doc_id")).as("doc_id"))
      .filter(col("__df") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n_unique"))
    perDoc.join(uniqueOwned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        (col("n_spans").cast("long") -
          coalesce(col("__n_unique"), lit(0L))).as("n_shared_spans"))
      .withColumn("dup_fraction",
        col("n_shared_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** Snapshot-over-snapshot novelty: for every corpus snapshot (a crawl
    * dump, a source partition), the fraction of its distinct `n`-token
    * shingles that appear in NO earlier snapshot (earlier = smaller
    * `snapshotCol` value — pass a sortable snapshot id). The curve a
    * crawl-curation plan reads to decide whether ingesting the next dump
    * is worth it: novelty falling toward zero means the marginal dump
    * re-crawls what the corpus already has.
    *
    * Emits (snapshot, n_shingles, n_novel, novelty) — snapshots whose
    * docs are all shorter than `n` tokens emit nothing.
    *
    * Scale: one distinct over (snapshot, shingle) postings, one
    * map-combined `min(snapshot)` per shingle, one bounded
    * per-snapshot aggregate — all linear in postings, no pair joins. */
  def snapshotNovelty(docs: DataFrame, snapshotCol: String,
                      textCol: String, n: Int): DataFrame = {
    val sp = spread(docs)
      .select(col(snapshotCol).as("snapshot"),
        explode(array_distinct(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), n))).as("__s"))
      .distinct()
    val first = sp.groupBy(col("__s"))
      .agg(min(col("snapshot")).as("__first"))
    sp.join(first, Seq("__s"))
      .groupBy(col("snapshot"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("snapshot") === col("__first"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
  }

  /** Blocklist gate: per-document count of ALL occurrences (overlapping
    * included) of any phrase in `phrases`, via ONE Aho-Corasick pass per
    * document ([[graft.expressions.PhraseMatchCount]]) — the scan cost is
    * independent of blocklist size, where a `contains` disjunction scans
    * the text once per phrase. Emits (idCol, n_hits, blocked).
    *
    * Scale: a scalar projection fused into the scan; the automaton ships
    * once as a codegen reference object, never per row. */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
                    phrases: Seq[String]): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    docs.select(col(idCol),
      call_function("phrase_count", col(textCol),
        array(phrases.map(lit): _*)).as("n_hits"))
      .withColumn("blocked", col("n_hits") > 0)
  }

  /** Exact-substring deduplication with REMOVAL (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" move,
    * at token-span granularity): every occurrence of a `spanLen`-token
    * span that is not the span's CANONICAL occurrence — the globally
    * first one by (doc_id, span position) — has its covered token
    * positions deleted from the document. Unlike [[spanDuplication]]
    * (which only profiles), this rewrites the corpus: one copy of every
    * repeated span survives, including within-document repeats.
    *
    * Emits (doc_id, n_tokens, n_removed, cleaned_text) for EVERY input
    * document (docs shorter than `spanLen` tokens pass through whole).
    *
    * Scale shape: the global canonical pick is one `groupBy(span)` with
    * a `min(struct(doc_id, spos))` (map-side combined — hot spans
    * collapse before the exchange); duplicate occurrences explode to at
    * most `spanLen` positions each; the rebuild is a per-document
    * `collect_list` bounded by document length (a document already fits
    * in memory by the corpus contract). Spans shuffle as strings here so
    * a SQL oracle can replay the grouping — a production variant would
    * key on `xxhash64(span)` (8-byte postings, identical semantics
    * modulo hash collisions) exactly as [[spanDuplication]] does. */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            spanLen: Int): DataFrame = {
    require(spanLen >= 2, s"spanLen must be >= 2, got $spanLen")
    val t = spread(docs).select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__w"))
    val sp = t.filter(size(col("__w")) >= spanLen)
      .select(col("doc_id"),
        posexplode(TextFunctions.wordShingles(col("__w"), spanLen))
          .as(Seq("spos", "__s")))
    val canon = sp.groupBy(col("__s"))
      .agg(min(struct(col("doc_id"), col("spos"))).as("__c"))
    val dups = sp.join(canon, Seq("__s"))
      .filter(!(col("doc_id") === col("__c").getField("doc_id") &&
        col("spos") === col("__c").getField("spos")))
    val removedPos = dups
      .select(col("doc_id"),
        explode(sequence(col("spos"), col("spos") + lit(spanLen - 1)))
          .as("pos"))
      .distinct()
    val toks = t.select(col("doc_id"),
      posexplode(col("__w")).as(Seq("pos", "__tok")))
    val kept = toks.join(removedPos, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__tok")))),
          x => x.getField("__tok")), " ").as("cleaned_text"))
    t.select(col("doc_id"), size(col("__w")).as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens").cast("long") -
          coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Crawl-URL canonicalization: the normal form under which two fetches
    * of the same page compare equal. Lower-cases scheme and host, strips
    * a leading `www.`, drops default ports (:80 for http, :443 for
    * https), removes the fragment and the query string, and trims a
    * trailing slash from a non-root path. Pure string expressions —
    * codegen'd, fuses into the scan. */
  def canonicalUrl(url: Column): Column = {
    // scheme://host[:port]  — lower-cased; path/query/fragment untouched
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    val port = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)", 1)
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val bareHost = regexp_replace(host, "^www\\.", "")
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path = when(rest === "" || rest === "/", lit(""))
      .otherwise(regexp_replace(rest, "/$", ""))
    concat(scheme, lit("://"), bareHost, portPart, path)
  }

  /** URL-level duplicate resolution: group crawl records by canonical URL
    * and keep the smallest id per group (mirror/variant collapse — the
    * step before any content-based dedup runs). Emits one row per
    * canonical URL: (canonical_url, n_variants, keeper_id).
    *
    * Scale: one groupBy on the canonical-url string; no joins, no windows
    * over raw rows. */
  def urlResolve(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("id"), canonicalUrl(col(urlCol)).as("canonical_url"))
      .filter(col("canonical_url").isNotNull && col("canonical_url") =!= "")
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("id")).as("keeper_id"))

  /** Temperature-scaled source mixing with LARGEST-REMAINDER
    * apportionment: allocate an integer `budget` of training slots across
    * sources proportionally to count^alpha (alpha > 1 up-weights big
    * sources, alpha = 1 is proportional; the classic sampling-temperature
    * knob), then hand the floor remainders out one by one to the largest
    * fractional parts so the quotas sum EXACTLY to the budget.
    *
    * All-integer arithmetic (weight = count^alpha by repeated
    * multiplication; remainder = (budget*w) mod W) — no float
    * apportionment drift, bit-identical everywhere. Bounds: needs
    * budget * max(weight) < 2^63; for alpha=2 that holds through
    * billions of docs per source with million-slot budgets. Ties on the
    * remainder break by source name.
    *
    * Scale: per-source counts are one map-side-combined aggregation; the
    * apportionment runs over the SOURCE list (tiny) in two windows.
    * Emits (source, n_docs, weight, quota), Σ quota = budget. */
  def temperatureMix(docs: DataFrame, sourceCol: String, alpha: Int,
                     budget: Long): DataFrame = {
    require(alpha >= 1, s"alpha must be >= 1, got $alpha")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val counts = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val weight = (1 until alpha)
      .foldLeft(col("n_docs"))((acc, _) => acc * col("n_docs"))
    val wTot = Window.partitionBy()
    val byRemainder = Window.partitionBy()
      .orderBy(col("__rem").desc, col("source").asc)
    counts
      .withColumn("weight", weight)
      .withColumn("__w_sum", sum(col("weight")).over(wTot))
      .withColumn("__num", lit(budget) * col("weight"))
      // SQL `div`: exact integral division (a double round-trip loses
      // exactness past 2^53)
      .withColumn("__floor", expr("__num div __w_sum"))
      .withColumn("__rem", pmod(col("__num"), col("__w_sum")))
      .withColumn("__left", lit(budget) - sum(col("__floor")).over(wTot))
      .withColumn("__rk", row_number().over(byRemainder))
      .withColumn("quota",
        col("__floor") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("weight"), col("quota"))
  }

  /** Per-group top-k terms by occurrence count — [[vocabulary]]'s grouped
    * form (per-source vocabulary drift is a standard corpus-quality
    * signal). Emits (group, token, n_occurrences, rank), rank 1..k by
    * (count desc, token).
    *
    * Scale: the token count aggregates map-side on (group, token); the
    * rank window partitions BY GROUP, and Spark's WindowGroupLimit pushes
    * the k-cap below the exchange, so no task ever sorts a full per-group
    * vocabulary. */
  def topTermsPerGroup(docs: DataFrame, textCol: String, groupCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = spread(docs)
      .select(col(groupCol).as("group"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("group"), col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("group"))
          .orderBy(col("n_occurrences").desc, col("token"))).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Train/val/test SPLIT LEAKAGE audit: counts near-duplicate document
    * pairs that STRADDLE split boundaries — the pairs that silently turn
    * held-out evaluation into memorization measurement. Random (or
    * hash-) splitting guarantees leakage wherever the corpus has
    * near-dups: every cross-split dup is an eval answer present in
    * train. Run this after any split; a nonzero row says "dedup BEFORE
    * splitting" (or re-split by dup-cluster, not by document).
    *
    * Emits (split_a, split_b, n_leaky_pairs) with the split pair
    * canonicalized (least/greatest) so train→test and test→train merge.
    *
    * Scale: pair generation is [[NearDup.ngramJaccardPairs]] with its
    * maxDf/candidates posture (banded, never all-pairs on the scale
    * path); the split lookups are two joins on the doc id — co-keyed
    * with the pair output, and the split side carries two columns. */
  def splitLeakageAudit(docs: DataFrame, idCol: String, textCol: String,
                        splitCol: String, n: Int, threshold: Double,
                        maxDf: Int = 10000,
                        candidates: Option[DataFrame] = None,
                        uncapped: Boolean = false): DataFrame = {
    val pairs = NearDup.ngramJaccardPairs(docs, idCol, textCol, n,
      threshold, maxDf, candidates, uncapped)
    val splits = docs.select(col(idCol), col(splitCol))
    pairs
      .join(splits.select(col(idCol).as("a_id"),
        col(splitCol).as("__sa")), Seq("a_id"))
      .join(splits.select(col(idCol).as("b_id"),
        col(splitCol).as("__sb")), Seq("b_id"))
      .filter(col("__sa") =!= col("__sb"))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_leaky_pairs"))
  }

  /** Per-document unigram cross-entropy against the corpus's own unigram
    * distribution — the classic LM-based quality score (CCNet ranks web
    * text by LM perplexity; a self-trained unigram model is its cheapest
    * honest cousin). Documents full of globally-rare tokens score HIGH
    * (gibberish, boilerplate hashes, OCR noise); documents of common
    * words score low. Emits (id, n_tokens, cross_entropy_nats) — rank or
    * gate on the score downstream; perplexity is exp(score) if wanted.
    *
    * Determinism contract (the reason for the scaled-integer sum): each
    * token's ln p is a full-precision irrational double, and a SUM of
    * such doubles is rounding-order-dependent — two engines (or two
    * partitionings of the same engine!) may differ in the last ulp.
    * Instead each ln p is floored to a 2^-30-nat integer grid
    * (`floor(ln_p * 2^30)` — the ×2^30 is an exact power-of-two scaling
    * and floor is exact), and the per-doc sum runs over BIGINTs: exact,
    * associative, partition-order-free. The final unscale divides by
    * 2^30 (exact) and by n_tokens (one correctly-rounded division). The
    * 2^-30 quantization error (≤ 1e-9 nat/token) is far below any
    * gating threshold anyone would use.
    *
    * Scale: token counting is two map-side-combined aggregations
    * ((doc, token) then token); the vocabulary total is a 1-row
    * broadcast; log-probs join back to per-doc token counts on the
    * token key — the (doc, token) side is already aggregated, so the
    * join input is bounded by Σ per-doc vocabulary, not raw corpus
    * length. No windows. */
  def unigramCrossEntropy(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val docTok = docTokenCounts(docs, idCol, textCol)
    val logp = unigramLogProbs(docs, idCol, textCol)
      .select(col("token").as("__tok"), col("lp_scaled").as("__lp_scaled"))
    // self-scoring: every token is in its own vocabulary — no OOV branch
    scoreCrossEntropy(docTok.join(logp, "__tok"), idCol)
  }

  /** The unigram reference MODEL behind [[unigramCrossEntropy]], exposed
    * so other collections can be scored against a FIXED vocabulary:
    * `(token, lp_scaled)` with lp_scaled = floor(ln(count/total)·2^30)
    * (the same exact-integer log grid — see the determinism contract
    * above). Persist it (vocab-sized, tiny) and feed
    * [[unigramCrossEntropyAgainst]] — the streaming-intake shape, where
    * batch-relative probabilities would make scores depend on batch
    * boundaries. */
  def unigramLogProbs(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val vocab = docTokenCounts(docs, idCol, textCol)
      .groupBy(col("__tok")).agg(sum(col("__cnt")).as("__gcnt"))
    val total = vocab.agg(sum(col("__gcnt")).as("__total"))
    vocab.crossJoin(broadcast(total))
      .withColumn("lp_scaled",
        floor(log(col("__gcnt").cast("double") /
          col("__total").cast("double")) * lit(CeScale.toDouble))
          .cast("long"))
      .select(col("__tok").as("token"), col("lp_scaled"))
  }

  /** [[unigramCrossEntropy]] against a FIXED model from
    * [[unigramLogProbs]] (or any `(token, lp_scaled)` table): the scored
    * docs do NOT update the vocabulary, so a document's score is
    * independent of what it arrives with — the property a streaming
    * quality gate needs for stream == batch parity. Out-of-vocabulary
    * tokens contribute a flat `oovPenaltyNats` (gibberish and OCR noise
    * are mostly OOV mass — a fixed penalty keeps the score exact-integer
    * and engine-independent). Emits (idCol, n_tokens,
    * cross_entropy_nats); token-less docs emit nothing.
    *
    * Scale: per-doc token counts join the vocab-sized model on the token
    * key; no windows, no corpus-wide state. */
  def unigramCrossEntropyAgainst(docs: DataFrame, idCol: String,
                                 textCol: String, model: DataFrame,
                                 oovPenaltyNats: Double = 20.0): DataFrame = {
    require(oovPenaltyNats >= 0, s"oovPenaltyNats must be >= 0: $oovPenaltyNats")
    val oovScaled = -math.floor(oovPenaltyNats * CeScale.toDouble).toLong
    val logp = model.select(col("token").as("__tok"),
      col("lp_scaled").as("__lp_scaled"))
    val joined = docTokenCounts(docs, idCol, textCol)
      .join(logp, Seq("__tok"), "left")
      .withColumn("__lp_scaled",
        coalesce(col("__lp_scaled"), lit(oovScaled)))
    scoreCrossEntropy(joined, idCol)
  }

  /** Leave-one-out source influence on eval cross-entropy: for every
    * source, the eval set's unigram CE under the model trained WITHOUT
    * that source, minus the CE under the full-corpus model — positive
    * influence = the source's tokens make the eval set more predictable
    * (keep/upweight it), negative = the source pushes probability mass
    * away from eval-like text. The one-number-per-source answer to
    * "which sources actually help", computed WITHOUT training anything:
    * the leave-one-out unigram model is a closed form over
    * (token, source) counts — lp = ln((gcnt − cnt_s) / (total − tot_s))
    * — so every source is scored from ONE counting pass.
    *
    * Same exact-integer 2^-30 log grid and flat OOV penalty as
    * [[unigramCrossEntropyAgainst]] (a token whose every occurrence came
    * from the removed source is OOV under that model). Emits one row per
    * source: (source, n_source_tokens, ce_full, ce_without,
    * influence_nats = ce_without − ce_full).
    *
    * Scale: corpus-sized work is the (token, source) count aggregation;
    * scoring joins the EVAL token counts (a sample by contract) against
    * sources × eval-vocab — sources are bounded (a mixture has tens,
    * not millions). */
  def sourceInfluenceOnEval(docs: DataFrame, sourceCol: String,
                            textCol: String, evalDocs: DataFrame,
                            evalIdCol: String, evalTextCol: String,
                            oovPenaltyNats: Double = 20.0): DataFrame = {
    val oovScaled = -math.floor(oovPenaltyNats * CeScale.toDouble).toLong
    // (token, source) counts + per-token global counts + totals
    val st = spread(docs)
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("source"), col("__tok"))
      .agg(count(lit(1)).as("__cnt"))
    val gcnt = st.groupBy(col("__tok")).agg(sum(col("__cnt")).as("__g"))
    val perSource = st.groupBy(col("source"))
      .agg(sum(col("__cnt")).as("__tot_s"))
    val total = gcnt.agg(sum(col("__g")).as("__total"))
    // eval token counts (collapsed across eval docs — corpus-level CE)
    val evalTok = spread(evalDocs)
      .select(explode(TextFunctions.tokens(col(evalTextCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__ecnt"))
    val nEval = evalTok.agg(sum(col("__ecnt")).as("__n_eval"))
    // full-model scaled log-probs on the eval vocabulary
    val lpFull = evalTok.join(gcnt, Seq("__tok"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__lp_full",
        when(col("__g").isNull, lit(oovScaled))
          .otherwise(floor(log(col("__g").cast("double") /
            col("__total").cast("double")) * lit(CeScale.toDouble))
            .cast("long")))
      .select(col("__tok"), col("__ecnt"), col("__g"), col("__lp_full"),
        col("__total"))
    // per (source, eval-token): the removed source's count of that token
    val crossed = perSource.crossJoin(lpFull)
      .join(st.select(col("source"), col("__tok"),
        col("__cnt").as("__cnt_s")), Seq("source", "__tok"), "left")
      .withColumn("__rem_g",
        coalesce(col("__g"), lit(0L)) - coalesce(col("__cnt_s"), lit(0L)))
      .withColumn("__lp_wo",
        when(col("__rem_g") <= 0L, lit(oovScaled))
          .otherwise(floor(log(col("__rem_g").cast("double") /
            (col("__total") - col("__tot_s")).cast("double"))
            * lit(CeScale.toDouble)).cast("long")))
    val perSourceCe = crossed.groupBy(col("source"))
      .agg(first(col("__tot_s")).as("n_source_tokens"),
        sum(col("__ecnt") * col("__lp_full")).as("__sum_full"),
        sum(col("__ecnt") * col("__lp_wo")).as("__sum_wo"))
    perSourceCe.crossJoin(broadcast(nEval))
      .withColumn("ce_full",
        -(col("__sum_full").cast("double") / lit(CeScale.toDouble)) /
          col("__n_eval").cast("double"))
      .withColumn("ce_without",
        -(col("__sum_wo").cast("double") / lit(CeScale.toDouble)) /
          col("__n_eval").cast("double"))
      .withColumn("influence_nats", col("ce_without") - col("ce_full"))
      .select(col("source"), col("n_source_tokens"), col("ce_full"),
        col("ce_without"), col("influence_nats"))
  }

  private val CeScale = 1073741824L // 2^30 — exact power-of-two log grid

  private def docTokenCounts(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    spread(docs)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__cnt"))

  private def scoreCrossEntropy(scored: DataFrame,
                                idCol: String): DataFrame =
    scored.groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        sum(col("__cnt") * col("__lp_scaled")).as("__sum_scaled"))
      .withColumn("cross_entropy_nats",
        -(col("__sum_scaled").cast("double") / lit(CeScale.toDouble)) /
          col("n_tokens").cast("double"))
      .drop("__sum_scaled")

  /** Per-document lexical-diversity signals: type-token ratio (distinct
    * tokens / tokens) and hapax ratio (once-only tokens / distinct
    * tokens). Low TTR catches keyword-stuffed and template pages that
    * pass length/stopword gates; a near-zero hapax ratio marks the
    * pathological "same 50 words shuffled" spam family. Complements the
    * window-based repetition signals (q63): those find LOCAL loops, this
    * measures GLOBAL vocabulary concentration.
    *
    * Documents with no tokens emit nothing (no diversity to measure).
    * Scale: explode to (doc, token), count map-side, then per-doc
    * aggregation — two combiner-friendly aggs keyed on the doc id, no
    * windows, no joins. */
  def lexicalDiversity(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val counts = spread(docs)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__cnt"))
    counts
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("__cnt") === 1, 1)).as("n_hapax"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("hapax_ratio",
        col("n_hapax").cast("double") / col("n_types").cast("double"))
  }

  /** Best-documents-first token-budget selection: order the corpus by
    * (score DESC, id ASC) and keep documents while the running token
    * total stays within `budget` — the curriculum/budget cut ("take the
    * top-quality N-billion tokens") expressed WITHOUT the single-task
    * global window a naive `sum over (order by score)` plans.
    *
    * The global running sum telescopes over score buckets (the
    * q134 sweep-line trick): scores map monotonically onto `buckets`
    * equal-width bins between the corpus min/max, per-bucket token
    * totals (≤ `buckets` rows) accumulate on the driver-free tiny
    * frame, and each bucket's rows then only need a WITHIN-bucket
    * running sum — a window partitioned by bucket, parallel across
    * buckets — added to its exclusive cross-bucket offset. Equal scores
    * always land in the same bucket, so bucket-major, within-bucket
    * (score DESC, id) order IS the global order and the result is
    * bit-identical to the naive form.
    *
    * Emits the input row plus (n_tokens, cum_tokens) for every kept
    * document. NULL scores are rejected (no position in the order).
    *
    * Scale: one scan for min/max (2-value broadcast), one scan for
    * bucket totals (map-side combined), one bucket-partitioned window.
    * A pathological score distribution (all mass in one bucket) degrades
    * to one window partition — the same contract as any keyed window.
    *
    * SIZE-DISPATCHED like [[Scale.globalRowNumber]]: at or under
    * `smallInputMaxRows` rows the plain one-shuffle global running sum
    * wins over the telescoped plan's job overhead; both paths are
    * output-identical (R5hOpsSpec pins the telescoped form against the
    * naive one). */
  def takeGlobalTokenBudget(docs: DataFrame, idCol: String, score: Column,
                            tokenCount: Column, budget: Long,
                            buckets: Int = 4096,
                            smallInputMaxRows: Long = 2000000L): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = docs
      .withColumn("__score", score.cast("double"))
      .withColumn("n_tokens", tokenCount.cast("bigint"))
      .filter(col("__score").isNotNull && col("n_tokens").isNotNull)
    // dispatch on the UN-projected input count — an upper bound on the
    // base rows that skips evaluating tokenCount (often the expensive
    // part) and stays a metadata-only count on a bare parquet scan
    if (smallInputMaxRows > 0 && docs.count() <= smallInputMaxRows)
      return base
        .withColumn("cum_tokens", sum(col("n_tokens")).over(
          Window.orderBy(col("__score").desc, col(idCol).asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum_tokens") <= budget)
        .drop("__score")
    val bounds = base.agg(min(col("__score")).as("__lo"),
      max(col("__score")).as("__hi"))
    val bucketed = base.crossJoin(broadcast(bounds))
      .withColumn("__bucket",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("__score") - col("__lo")) /
              ((col("__hi") - col("__lo")) / lit(buckets.toDouble)))
              .cast("int"))))
      .drop("__lo", "__hi")
    // exclusive running total of the buckets ABOVE each bucket
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btok"))
      .withColumn("__offset",
        coalesce(sum(col("__btok")).over(
          Window.orderBy(col("__bucket").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col("__score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("cum_tokens", col("__offset") + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__bucket", "__offset", "__score")
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`topK` token vocabulary (see [[vocabulary]]): the fraction of
    * token OCCURRENCES not covered by the vocabulary. The direct signal
    * for "will a fixed-vocab tokenizer shred this document into bytes"
    * — high OOV marks boilerplate code, foreign-script spillover, and
    * encoding damage that per-rule quality gates miss.
    *
    * Emits (id, n_tokens, n_oov, oov_rate); documents with no tokens
    * emit nothing (no coverage to measure).
    *
    * Scale: doc-token counts are one map-side-combined groupBy; the
    * vocabulary derives from the SAME doc-token frame (identical
    * subplan → Spark reuses the exchange instead of re-scanning the
    * corpus), ranks like [[vocabulary]] (count DESC, token ASC), and is
    * topK rows broadcast — coverage is a scan-side hash probe, no
    * second shuffle beyond the per-doc rollup. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val docTok = spread(docs)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__cnt"))
    val vocab = docTok.groupBy(col("__tok"))
      .agg(sum(col("__cnt")).as("__gcnt"))
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__gcnt").desc, col("__tok"))))
      .filter(col("__rank") <= topK)
      .select(col("__tok"), lit(1).as("__in_vocab"))
    docTok
      .join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, col("__cnt")).otherwise(0L))
          .as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Quantile normalization of per-source scores: each document's score
    * is replaced by the POOLED corpus score at the same within-source
    * rank position — after it, every source has the same score
    * distribution, so a single global threshold (or the q162 budget cut)
    * stops favoring sources whose raw scorer runs hot (the classic
    * cross-source calibration step before a corpus-wide quality gate).
    *
    * The mapping is pure integer math — rank r of n_s maps to pooled
    * index 1 + ((r−1)·(N−1)) div (n_s−1) — so results hash-match across
    * engines; a single-document source maps to the pooled median index
    * 1 + (N−1) div 2. The pooled numbering uses the telescoped
    * [[Scale.globalRowNumber]], never a single-task global window.
    *
    * Emits (id, source, score, normalized_score).
    *
    * Scale: one per-source window (keys × docs rows), the bucketed
    * global numbering, and one integer-keyed join back to pooled
    * values. */
  def quantileNormalizeScores(docs: DataFrame, idCol: String,
                              sourceCol: String, score: Column): DataFrame = {
    val base = docs
      .withColumn("score", score)
      .filter(col(sourceCol).isNotNull && col("score").isNotNull)
      .select(col(idCol), col(sourceCol), col("score"))
    val wS = Window.partitionBy(col(sourceCol))
    val ranked = base
      .withColumn("__rs", row_number().over(
        wS.orderBy(col("score").asc, col(idCol).asc)))
      .withColumn("__ns", count(lit(1)).over(wS))
    val pooled = Scale.globalRowNumber(base, "score", idCol)
      .select(col("score").as("normalized_score"),
        col("global_rn").as("__idx"))
    val n = base.agg(count(lit(1)).as("__N"))
    ranked.crossJoin(broadcast(n))
      .withColumn("__idx",
        when(col("__ns") > 1,
          expr("1 + ((__rs - 1) * (__N - 1)) div (__ns - 1)"))
          .otherwise(expr("1 + (__N - 1) div 2")))
      .join(pooled, Seq("__idx"))
      .select(col(idCol), col(sourceCol), col("score"),
        col("normalized_score"))
  }

  /** Deterministic weighted sample of exactly `k` documents per group —
    * the Efraimidis–Spirakis A-ES scheme (key = u^(1/w), keep the top k)
    * with the randomness replaced by the md5 draw [[sampleByScore]]
    * uses, so every engine and every re-run keeps the SAME rows.
    * Maximizing u^(1/w) is maximizing ln(u)/w: ln(u) becomes a
    * floor(ln·2³⁰) scaled integer (exact in both engines), and the key
    * is the one correctly-rounded double division lp/w — reproducible,
    * with ties broken by id. Weights must be positive; heavier rows are
    * proportionally more likely to be kept, and changing `k` only
    * extends/truncates the kept prefix (the draw never changes).
    *
    * Emits the input rows plus `wkey`, filtered to the per-group top-k.
    *
    * Scale: a pure scalar projection plus one per-group top-k window —
    * WindowGroupLimit prunes to k rows per group before the exchange. */
  def weightedSampleK(docs: DataFrame, idCol: String, groupCol: String,
                      weight: Column, k: Int,
                      seed: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    // (0,1] so ln is finite; exact binary fraction in both engines
    val u = (conv(substring(h, 1, 12), 16, 10).cast("double") + lit(1.0)) /
      lit(281474976710656.0) // 2^48
    val lp = floor(log(u) * lit(1073741824.0)).cast("long") // <= 0
    val keyed = docs
      .filter(weight.isNotNull && weight > 0)
      .withColumn("wkey", lp.cast("double") / weight.cast("double"))
    keyed
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("wkey").desc, col(idCol).asc)))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-document cross-entropy under the corpus's own BIGRAM model —
    * the conditional upgrade of [[unigramCrossEntropy]]: each transition
    * w_{i-1} → w_i scores −ln P(w_i | w_{i-1}) with P = c(w_{i-1} w_i) /
    * c_prefix(w_{i-1}), where c_prefix sums the bigram counts starting
    * with w_{i-1} (so probabilities condition on exactly the observed
    * transition mass and sum to 1 per prefix). Bigram perplexity
    * separates fluent text from shuffled-word spam that a unigram model
    * scores identically — the cheap proxy for the model-based perplexity
    * filters production pipelines run.
    *
    * Same hash-reproducibility discipline as the unigram form: log
    * probabilities become floor(ln·2³⁰) scaled integers, sums are exact,
    * and one double division lands the final nats value. Documents with
    * < 2 tokens emit nothing (no transitions to score).
    *
    * Scale: bigram extraction is the codegen'd shifted-slice zip (one
    * pass over the text); doc-bigram counts and the two model aggs are
    * map-side combined; the model join keys on the bigram string. */
  def bigramCrossEntropy(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val Scale = 1073741824L // 2^30
    val docBg = spread(docs)
      .select(col(idCol),
        explode(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), 2)).as("__bg"))
      .groupBy(col(idCol), col("__bg"))
      .agg(count(lit(1)).as("__cnt"))
    val model = docBg.groupBy(col("__bg"))
      .agg(sum(col("__cnt")).as("__gcnt"))
    val prefix = model
      .groupBy(substring_index(col("__bg"), " ", 1).as("__w"))
      .agg(sum(col("__gcnt")).as("__pcnt"))
    val logp = model
      .withColumn("__w", substring_index(col("__bg"), " ", 1))
      .join(prefix, "__w")
      .withColumn("__lp_scaled",
        floor(log(col("__gcnt").cast("double") /
          col("__pcnt").cast("double")) * lit(Scale.toDouble))
          .cast("long"))
      .select(col("__bg"), col("__lp_scaled"))
    docBg.join(logp, "__bg")
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_transitions"),
        sum(col("__cnt") * col("__lp_scaled")).as("__sum_scaled"))
      .withColumn("cross_entropy_nats",
        -(col("__sum_scaled").cast("double") / lit(Scale.toDouble)) /
          col("n_transitions").cast("double"))
      .drop("__sum_scaled")
  }

  /** Stupid Backoff trigram scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation", §4 — the distributed-counting LM
    * that made web-scale n-gram models practical): score each `eval`
    * document under a trigram model COUNTED on `model`, with the
    * inexpensive non-normalized backoff Brants proposes instead of
    * Kneser-Ney's held-out discounting:
    *
    *   S(c | a b) = c3(a b c) / c2(a b)   seen trigram (c2(a b) > 0 is
    *                                      implied: every model trigram
    *                                      contains its prefix bigram)
    *              = α  · c2(b c) / c1(b)  else, seen bigram
    *              = α² · c1(c) / N        else, seen unigram
    *              = α³ / N                else (OOV floor — our
    *                                      convention; Brants leaves OOV
    *                                      to the decoder), α = 0.4
    *
    * Train/score separation is the caller's (a self-scored corpus never
    * backs off — every observed trigram is in its own model). Emits one
    * row per eval doc with ≥ 3 tokens: (id, n_transitions, n_seen,
    * n_bo1, n_bo2, n_oov, sb_nats) where sb_nats = −Σ ln S / n — lower
    * = more model-like, the rank key for fluency/quality gating.
    *
    * Hash-reproducible like the other CE scores: each transition's ln S
    * lands on the floor(ln·2³⁰) integer grid, per-doc sums are exact,
    * one double division finishes. The α/α²/α³ constants are computed
    * once here and interpolated into the oracle as literals.
    *
    * Scale: counting IS the training (map-combined aggs — the paper's
    * MapReduce shape); scoring is five linear key-joins from the eval
    * trigram frame to the three count tables (trigram, two bigram
    * roles, two unigram roles) — none broadcast, nothing quadratic. */
  def stupidBackoffScore(eval: DataFrame, model: DataFrame, idCol: String,
                         textCol: String,
                         alpha: Double = 0.4): DataFrame =
    stupidBackoffScoreWith(eval, fitNgramModel(model, textCol), idCol,
      textCol, alpha)

  /** The pre-fit n-gram count model [[stupidBackoffScoreWith]] consumes:
    * three count frames (unigram `__u/__c1`, bigram `__g2/__c2`, trigram
    * `__g3/__c3`). Persist by writing the frames to parquet and rebuild
    * with the same column names — fitting is ONE counting pass over the
    * training corpus, scoring never re-reads it. */
  final case class NgramModel(uni: DataFrame, bi: DataFrame, tri: DataFrame)

  /** One counting pass (map-combined aggs) over `model` — the
    * MapReduce-shaped training step of Brants et al. 2007. */
  def fitNgramModel(model: DataFrame, textCol: String): NgramModel = {
    val mToks = spread(model)
      .select(TextFunctions.tokens(col(textCol)).as("__w"))
    NgramModel(
      uni = mToks.select(explode(col("__w")).as("__u"))
        .groupBy(col("__u")).agg(count(lit(1)).as("__c1")),
      bi = mToks
        .select(explode(TextFunctions.wordShingles(col("__w"), 2))
          .as("__g2"))
        .groupBy(col("__g2")).agg(count(lit(1)).as("__c2")),
      tri = mToks
        .select(explode(TextFunctions.wordShingles(col("__w"), 3))
          .as("__g3"))
        .groupBy(col("__g3")).agg(count(lit(1)).as("__c3")))
  }

  /** Incremental model maintenance: n-gram counts are ADDITIVE, so a new
    * ingest batch folds in with one count pass over the batch plus a
    * key-join merge against the stored counts — the training corpus is
    * never rescanned. `update(fit(A), B) == fit(A ∪ B)` exactly (q332
    * proves it against the refit oracle). */
  def updateNgramModel(m: NgramModel, newDocs: DataFrame,
                       textCol: String): NgramModel = {
    val d = fitNgramModel(newDocs, textCol)
    def merge(a: DataFrame, b: DataFrame, key: String,
              cnt: String): DataFrame =
      a.select(col(key), col(cnt)).unionAll(b.select(col(key), col(cnt)))
        .groupBy(col(key)).agg(sum(col(cnt)).as(cnt))
    NgramModel(
      uni = merge(m.uni, d.uni, "__u", "__c1"),
      bi = merge(m.bi, d.bi, "__g2", "__c2"),
      tri = merge(m.tri, d.tri, "__g3", "__c3"))
  }

  /** [[stupidBackoffScore]] against a pre-fit (possibly incrementally
    * [[updateNgramModel]]-maintained, possibly parquet-persisted)
    * [[NgramModel]]. */
  def stupidBackoffScoreWith(eval: DataFrame, m: NgramModel, idCol: String,
                             textCol: String,
                             alpha: Double = 0.4): DataFrame = {
    val Scale = 1073741824L // 2^30
    val a1 = alpha
    val a2 = alpha * alpha
    val a3 = alpha * alpha * alpha
    val m1 = m.uni
    val m2 = m.bi
    val m3 = m.tri
    val nRow = m1.agg(sum(col("__c1")).cast("double").as("__N"))
    val docTg = spread(eval)
      .select(col(idCol),
        explode(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), 3)).as("__g3"))
      .groupBy(col(idCol), col("__g3"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__p2", substring_index(col("__g3"), " ", 2))
      .withColumn("__s2", substring_index(col("__g3"), " ", -2))
      .withColumn("__wb",
        substring_index(substring_index(col("__g3"), " ", 2), " ", -1))
      .withColumn("__wc", substring_index(col("__g3"), " ", -1))
    val scored = docTg
      .join(m3, Seq("__g3"), "left")
      .join(m2.select(col("__g2").as("__p2"), col("__c2").as("__c2ab")),
        Seq("__p2"), "left")
      .join(m2.select(col("__g2").as("__s2"), col("__c2").as("__c2bc")),
        Seq("__s2"), "left")
      .join(m1.select(col("__u").as("__wb"), col("__c1").as("__c1b")),
        Seq("__wb"), "left")
      .join(m1.select(col("__u").as("__wc"), col("__c1").as("__c1c")),
        Seq("__wc"), "left")
      .crossJoin(broadcast(nRow))
      .withColumn("__level",
        when(col("__c3").isNotNull, 0)
          .when(col("__c2bc").isNotNull, 1)
          .when(col("__c1c").isNotNull, 2)
          .otherwise(3))
      .withColumn("__lp_scaled", floor(
        when(col("__level") === 0,
          log(col("__c3").cast("double") / col("__c2ab").cast("double")))
          .when(col("__level") === 1,
            log((lit(a1) * col("__c2bc").cast("double")) /
              col("__c1b").cast("double")))
          .when(col("__level") === 2,
            log((lit(a2) * col("__c1c").cast("double")) / col("__N")))
          .otherwise(log(lit(a3) / col("__N")))
          * lit(Scale.toDouble)).cast("long"))
    scored.groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_transitions"),
        sum(when(col("__level") === 0, col("__cnt")).otherwise(0L))
          .as("n_seen"),
        sum(when(col("__level") === 1, col("__cnt")).otherwise(0L))
          .as("n_bo1"),
        sum(when(col("__level") === 2, col("__cnt")).otherwise(0L))
          .as("n_bo2"),
        sum(when(col("__level") === 3, col("__cnt")).otherwise(0L))
          .as("n_oov"),
        sum(col("__cnt") * col("__lp_scaled")).as("__sum_scaled"))
      .withColumn("sb_nats",
        -(col("__sum_scaled").cast("double") / lit(Scale.toDouble)) /
          col("n_transitions").cast("double"))
      .drop("__sum_scaled")
  }

  /** Interleaved curriculum ordering: band documents into `nBands`
    * difficulty tiers by a score's GLOBAL rank, then emit a training
    * order that cycles the bands — position r·nBands+b is the r-th
    * (hash-shuffled) document of band b — so every contiguous slice of
    * the training stream sees the full difficulty mix. The data-ordering
    * step between curation and sharding: plain score-sorted order makes
    * early training see only easy documents, fully shuffled order loses
    * the band balance; round-robin banding gives both.
    *
    * Deterministic end to end: global score rank via the telescoped
    * [[Scale.globalRowNumber]] (no single-task sort), band =
    * (rank−1)·nBands div total, within-band round over the md5 hash
    * order, final position = another telescoped numbering over the
    * (round·nBands + band) composite — every step exact integer math. */
  def curriculumOrder(df: DataFrame, idCol: String, score: Column,
                      nBands: Int = 10): DataFrame = {
    require(nBands >= 2, s"nBands must be >= 2, got $nBands")
    val base = df.select(col(idCol).as("__id"), score.as("__score"))
      .filter(col("__score").isNotNull)
    val total = base.agg(count(lit(1)).as("__tot"))
    val ranked = Scale.globalRowNumber(base, "__score", "__id")
      .crossJoin(broadcast(total))
      .withColumn("band",
        expr(s"((global_rn - 1) * $nBands) div __tot").cast("int"))
    val rounds = ranked
      .withColumn("__h", md5(col("__id").cast("string")))
      .withColumn("round", row_number().over(
        Window.partitionBy(col("band")).orderBy(col("__h"), col("__id")))
        .cast("long"))
      .withColumn("__pos_key", col("round") * nBands + col("band"))
    Scale.globalRowNumber(rounds, "__pos_key", "__id")
      .select(col("__id").as(idCol), col("__score").as("score"),
        col("band"), col("round"),
        col("global_rn").as("curriculum_pos"))
  }

  /** BPE-encode the corpus VOCABULARY: learn the top-`topK` adjacent
    * character-pair merges ([[bpePairStats]], rank = priority), then
    * apply them per distinct token with the codegen `bpe_encode`
    * expression (iterative lowest-rank merging — see
    * [[graft.expressions.BpeEncode]]). Emits
    * (token, encoded, n_symbols).
    *
    * Scale: this is the trick real tokenizer pipelines use — encoding
    * is Zipf-amortized over the DISTINCT vocabulary (thousands of
    * rows), never per token occurrence (billions); the merge table is
    * topK strings collected once and compiled into the projection as a
    * literal. */
  def bpeEncodeVocab(docs: DataFrame, textCol: String,
                     topK: Int): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val merges = bpePairStats(docs, textCol, topK)
      .orderBy(col("rank"))
      .select(col("pair")).collect().map(_.getString(0)).toSeq
    spread(docs)
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("token"))
      .distinct()
      .withColumn("encoded",
        call_function("bpe_encode", col("token"), typedLit(merges)))
      .withColumn("n_symbols",
        (size(split(col("encoded"), " ", -1))).cast("long"))
  }

  /** Tokenizer fertility per source: BPE tokens per word and characters
    * per BPE token, the "how well does this tokenizer fit this slice"
    * numbers a multilingual corpus report leads with (a fertility of 3+
    * on one source means its text fragments into symbol soup — wasted
    * context window and skewed per-source token budgets).
    *
    * Merges are learned from the WHOLE corpus ([[bpePairStats]], rank =
    * priority), encoding is Zipf-amortized over the distinct vocabulary
    * ([[bpeEncodeVocab]]), and per-source occurrence counts join that
    * vocabulary on the token key — the join input is Σ per-source
    * vocabulary, never raw corpus length. All aggregates are exact
    * integer sums; the two ratios are one final division each, so a
    * differential oracle matches bitwise.
    *
    * Emits (source, n_words, n_bpe_tokens, n_chars, fertility,
    * chars_per_bpe_token). */
  def tokenizerFertility(docs: DataFrame, sourceCol: String,
                         textCol: String, topK: Int): DataFrame = {
    val encoded = bpeEncodeVocab(docs, textCol, topK)
      .select(col("token"), col("n_symbols"))
    val occ = spread(docs)
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("__cnt"))
    occ.join(encoded, Seq("token"))
      .groupBy(col("source"))
      .agg(sum(col("__cnt")).as("n_words"),
        sum(col("__cnt") * col("n_symbols")).as("n_bpe_tokens"),
        sum(col("__cnt") * length(col("token")).cast("long")).as("n_chars"))
      .withColumn("fertility",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
      .withColumn("chars_per_bpe_token",
        col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
  }

  /** Per-document character-entropy quality signal: the Shannon entropy
    * (nats) of each doc's own character distribution — the
    * compression-ratio proxy that catches what token-level gates miss:
    * repeated-character junk, base64/hex blobs (HIGH entropy, near
    * ln(alphabet)), and single-char spam (near 0). Gate on both tails.
    *
    * Exactness (the CE discipline): per-char log-probabilities are
    * floored to the 2^-30-nat grid and summed as c·lp integers, so the
    * entropy is engine-exact. Characters are enumerated by position
    * (`substring(text, i, 1)`) — the one char-splitting formulation
    * every engine agrees on. Emits (idCol, n_chars, n_distinct_chars,
    * char_entropy_nats); empty/NULL texts emit nothing.
    *
    * Scale: one explode to (doc, char) + two map-combined aggregations
    * keyed on the doc id — linear in corpus characters, no joins. */
  def charEntropy(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val chars = spread(docs)
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"),
        explode(sequence(lit(1), length(col(textCol)))).as("__i"))
      .select(col(idCol), substring(col("__t"), col("__i"), lit(1)).as("__c"))
      .groupBy(col(idCol), col("__c")).agg(count(lit(1)).as("__cnt"))
    val perDoc = chars.groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"))
    chars.join(perDoc, Seq(idCol))
      .withColumn("__lp",
        floor(log(col("__cnt").cast("double") /
          col("n_chars").cast("double")) * lit(CeScale.toDouble))
          .cast("long"))
      .groupBy(col(idCol))
      .agg(first(col("n_chars")).as("n_chars"),
        first(col("n_distinct_chars")).as("n_distinct_chars"),
        sum(col("__cnt") * col("__lp")).as("__sum"))
      .withColumn("char_entropy_nats",
        -(col("__sum").cast("double") / lit(CeScale.toDouble)) /
          col("n_chars").cast("double"))
      .drop("__sum")
  }

  /** Deterministic word-dropout augmentation: each token is dropped with
    * probability ~`dropPermille`/1000, decided by an md5 coin over
    * (doc id, token position) — fully reproducible across runs, engines
    * and partitionings (the q58 hash-split discipline; no RNG state
    * anywhere). The standard cheap text augmentation for embedding /
    * classifier training; pair the output with the original for
    * contrastive views.
    *
    * Emits (idCol, text_aug, n_kept, n_dropped); token order is
    * preserved (kept tokens re-assemble by position). Scale: one
    * posexplode + a position-keyed re-aggregation per doc — the
    * paragraph-dedup shape, one doc-keyed exchange. */
  def wordDropout(docs: DataFrame, idCol: String, textCol: String,
                  dropPermille: Int, salt: String = "aug0"): DataFrame = {
    require(dropPermille >= 0 && dropPermille < 1000,
      s"dropPermille must be in [0, 1000), got $dropPermille")
    val toks = spread(docs)
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("__pos", "__tok")))
    // 4 hex nibbles -> integer in [0, 65536); drop iff < threshold
    val coin = conv(substring(md5(concat_ws(":", lit(salt),
      col(idCol).cast("string"), col("__pos").cast("string"))), 1, 4),
      16, 10).cast("int")
    val threshold = (dropPermille * 65536) / 1000
    val marked = toks.withColumn("__drop", coin < lit(threshold))
    marked.groupBy(col(idCol))
      .agg(
        array_join(transform(array_sort(
          collect_list(when(!col("__drop"),
            struct(col("__pos"), col("__tok"))))),
          s => s.getField("__tok")), " ").as("text_aug"),
        sum(when(col("__drop"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("__drop"), 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Sketch-driven auto length gate: pick the token-count bounds from
    * the corpus's OWN length distribution — [lo, hi) = the
    * [[Stats.logBucketSketch]] bucket bounds at `pLo`/`pHi` — and report
    * what a gate at those bounds would do. Replaces hand-picked
    * min/max-token constants with measured structure (the lshPlanner /
    * autoThreshold spirit applied to the length gate). Emits ONE row:
    * (lo_tokens, hi_tokens, n_docs, n_below, n_above, n_kept,
    * keep_ratio); gate semantics are lo ≤ tokens < hi.
    *
    * Scale: one token-count scan feeds both the sketch (bounded rows)
    * and the conditional counts; thresholds come from the sketch-sized
    * quantile pick and are joined back as a broadcast 1-row frame. */
  def autoLengthGate(docs: DataFrame, idCol: String, textCol: String,
                     pLo: Double = 0.01, pHi: Double = 0.99,
                     subBuckets: Int = 16): DataFrame = {
    require(pLo > 0 && pHi <= 1 && pLo < pHi,
      s"need 0 < pLo < pHi <= 1, got $pLo, $pHi")
    val counted = spread(docs).select(col(idCol),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("__ntok"))
    val qs = Stats.logBucketQuantiles(
        counted.withColumn("__g", lit(1)), Seq("__g"), "__ntok",
        subBuckets, Seq(pLo, pHi))
      .groupBy(col("__g"))
      .agg(min(when(col("q") === pLo, col("est_lo"))).as("lo_tokens"),
        min(when(col("q") === pHi, col("est_hi"))).as("hi_tokens"))
      .drop("__g")
    counted.crossJoin(broadcast(qs))
      .agg(first(col("lo_tokens")).as("lo_tokens"),
        first(col("hi_tokens")).as("hi_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("__ntok") < col("lo_tokens"), 1L).otherwise(0L))
          .as("n_below"),
        sum(when(col("__ntok") >= col("hi_tokens"), 1L).otherwise(0L))
          .as("n_above"))
      .withColumn("n_kept",
        col("n_docs") - col("n_below") - col("n_above"))
      .withColumn("keep_ratio",
        col("n_kept").cast("double") / col("n_docs").cast("double"))
  }

  /** Dedup-radius survival sweep: for every Hamming radius r up to
    * `maxHamming`, how many candidate pairs exist at distance ≤ r and
    * how many DISTINCT documents have at least one such pair — the
    * "how aggressive should the near-dup radius be" calibration read
    * before committing a corpus-wide [[resolveDuplicates]] run
    * (touched-doc count is the sharp upper bound on documents a
    * radius-r dedup could drop). Emits one row per radius:
    * (radius, n_pairs, n_docs_touched), cumulative in r.
    *
    * Scale: ONE banded pair pass at the widest radius
    * ([[simHashHammingPairs]] — never all-pairs), then a per-pair
    * hamming histogram and a per-doc min-distance histogram, each
    * cumulated over the ≤ maxHamming+1-row radius spine. */
  def dedupRadiusSweep(docs: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int, bits: Int = 32,
                       numBands: Int = 4,
                       maxBucket: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val pairs = simHashHammingPairs(docs, idCol, textCol, maxHamming,
      bits, numBands, maxBucket)
    val pairHist = pairs.groupBy(col("hamming").as("__h"))
      .agg(count(lit(1)).as("__np"))
    val docMin = pairs.select(col("a_id").as("__id"), col("hamming"))
      .unionAll(pairs.select(col("b_id").as("__id"), col("hamming")))
      .groupBy(col("__id")).agg(min(col("hamming")).as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("__nd"))
    val spine = spark.range(0, maxHamming + 1)
      .select(col("id").cast("int").as("radius"))
    val wCum = Window.orderBy(col("radius"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(pairHist.withColumnRenamed("__h", "radius"), Seq("radius"),
        "left")
      .join(docMin.withColumnRenamed("__h", "radius"), Seq("radius"),
        "left")
      .na.fill(0L, Seq("__np", "__nd"))
      .withColumn("n_pairs", sum(col("__np")).over(wCum))
      .withColumn("n_docs_touched", sum(col("__nd")).over(wCum))
      .select(col("radius"), col("n_pairs"), col("n_docs_touched"))
  }

  /** Mixture-vs-target report: achieved token share per source against
    * a declared target mixture — the "are we actually training on the
    * mix we designed" audit run after sampling/quota stages. Emits one
    * row per source present in the corpus or the target:
    * (source, n_tokens, achieved_share, target_share, delta,
    * excess_ratio) with excess_ratio = achieved/target (NULL for
    * sources outside the target — unplanned contamination shows up as
    * a non-NULL share with NULL ratio).
    *
    * Determinism: token counts are exact integer aggregates; shares and
    * deltas are a fixed scalar chain on those integers and the target
    * literals. Scale: one map-combined count per source + a 1-row total
    * broadcast; the report is sources-sized. */
  def mixtureReport(docs: DataFrame, sourceCol: String, textCol: String,
                    targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val perSource = spread(docs)
      .select(col(sourceCol).as("source"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("__t"))
      .groupBy(col("source")).agg(sum(col("__t")).as("n_tokens"))
    val targets = targetShares.toSeq.sortBy(_._1)
      .toDF("source", "target_share")
    val total = perSource.agg(sum(col("n_tokens")).as("__total"))
    perSource.join(targets, Seq("source"), "full_outer")
      .na.fill(0L, Seq("n_tokens"))
      .crossJoin(broadcast(total))
      .withColumn("achieved_share",
        col("n_tokens").cast("double") / col("__total").cast("double"))
      .withColumn("delta",
        col("achieved_share") - coalesce(col("target_share"), lit(0.0)))
      .withColumn("excess_ratio",
        col("achieved_share") / col("target_share"))
      .select(col("source"), col("n_tokens"), col("achieved_share"),
        col("target_share"), col("delta"), col("excess_ratio"))
  }

  /** Greedy set-cover source selection: `rounds` rounds of "pick the
    * source adding the most still-uncovered distinct shingles" — the
    * classic (1 − 1/e)-approximate coverage maximizer, used to choose a
    * data-mixture subset that spans the corpus vocabulary instead of
    * duplicating it. Ties break to the lexicographically smallest
    * source; rounds with zero marginal gain stop the selection.
    * Emits (round, source, new_elements, covered_total).
    *
    * Scale: per round one anti-join (corpus shingles vs the PICKED
    * sources' shingles — the covered set is definitionally that union,
    * and an anti-join right side needs no dedup, so no growing
    * materialized frame exists at all) and one map-combined groupBy over
    * |sources| rows; only the 1-row argmax is collected. Per-round cost
    * is one flat scan of the checkpointed (source, shingle) table —
    * independent of how much is already covered (the previous
    * union+distinct+checkpoint per round grew with the covered set). */
  def greedySourceCover(docs: DataFrame, sourceCol: String,
                        textCol: String, shingleN: Int,
                        rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val st = spread(docs)
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), shingleN)).as("sh"))
      .distinct().localCheckpoint(true)
    var coveredTotal = 0L
    var picked = List.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
    var done = false
    (1 to rounds).foreach { r =>
      if (!done) {
        val uncov =
          if (picked.isEmpty) st
          else st.filter(!col("source").isInCollection(picked))
            .join(st.filter(col("source").isInCollection(picked))
              .select(col("sh")), Seq("sh"), "left_anti")
        val gains = uncov
          .groupBy(col("source")).agg(count(lit(1)).as("gain"))
          .filter(col("gain") > 0)
          .orderBy(col("gain").desc, col("source"))
          .limit(1).collect()
        if (gains.isEmpty) done = true
        else {
          val best = gains.head.getString(0)
          val gain = gains.head.getLong(1)
          coveredTotal += gain
          picked ::= best
          out += ((r, best, gain, coveredTotal))
        }
      }
    }
    out.toSeq.toDF("round", "source", "new_elements", "covered_total")
  }

  /** Survivorship merge ("golden record"): per duplicate cluster, one
    * merged record whose fields come from the BEST member under
    * per-field rules — the MDM step after [[resolveDuplicates]], which
    * keeps one whole row; real survivorship mixes fields (longest text
    * from one member, majority language from another). Rules here:
    * representative id = longest text (ties → lowest id), language =
    * cluster mode (ties → lexicographically lowest), plus exact counts
    * and totals. Every rule is a deterministic argmax/argmin.
    *
    * Scale: the labels join shuffles docs once on the id; field rules
    * are two windows and one aggregate on the cluster key. */
  def goldenRecords(docs: DataFrame, idCol: String, textCol: String,
                    langCol: String, sourceCol: String,
                    nCharsCol: String, labels: DataFrame): DataFrame = {
    val joined = docs
      .select(col(idCol), col(textCol), col(langCol), col(sourceCol),
        col(nCharsCol))
      .join(labels.select(col(idCol), col("cluster_id")), Seq(idCol))
    val repW = Window.partitionBy(col("cluster_id"))
      .orderBy(length(col(textCol)).desc, col(idCol))
    val withRep = joined
      .withColumn("__rep_rank", row_number().over(repW))
    val langMode = joined.groupBy(col("cluster_id"), col(langCol))
      .agg(count(lit(1)).as("__ln"))
      .withColumn("__lrk", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("__ln").desc, col(langCol))))
      .filter(col("__lrk") === 1)
      .select(col("cluster_id"), col(langCol).as("golden_lang"))
    withRep
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col(sourceCol)).as("n_sources"),
        sum(col(nCharsCol)).as("total_chars"),
        max(when(col("__rep_rank") === 1, col(idCol)))
          .as("representative_id"),
        max(when(col("__rep_rank") === 1, length(col(textCol))))
          .as("representative_len"))
      .join(langMode, Seq("cluster_id"))
  }

  /** Stratified k-fold assignment: within every stratum, rank rows by
    * md5(id) and take `rank mod k` — each class lands in every fold
    * with counts balanced to ±1, unconditionally (hash-bucket splits
    * only balance in expectation; rank-mod balances by construction).
    * Emits (idCol, stratum, fold).
    *
    * Scale: one rank window per stratum — a single shuffle on the
    * stratum key; the md5 order makes the assignment deterministic AND
    * uncorrelated with any data column. */
  def stratifiedFolds(df: DataFrame, idCol: String, stratumCol: String,
                      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(idCol), col(stratumCol).as("stratum"))
      .withColumn("fold",
        pmod(row_number().over(w) - 1, lit(k)).cast("int"))
  }

  /** Cluster-respecting train/val/test split: documents are assigned by
    * the md5 bucket of their NEAR-DUP CLUSTER id, so near-duplicates
    * can never straddle splits — the constructive fix for the leakage
    * q151 audits (a per-doc hash split puts ~(1−1/k) of every dup pair
    * across a boundary). Emits (idCol, cluster_id, split).
    *
    * Scale: inherits the [[Clusters.connectedComponents]] posture for
    * the labels; the split itself is one scalar expression. */
  def clusterSplit(labels: DataFrame, idCol: String,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"bad split ($trainPct, $valPct)")
    val bucket = conv(substring(md5(col("cluster_id").cast("string")), 1, 4),
      16, 10).cast("int") % 100
    labels.select(col(idCol), col("cluster_id"))
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Per-document BPE symbol counts: token occurrences joined against
    * the vocabulary-level encoding (broadcast — the vocabulary is the
    * Zipf-small side), symbol counts summed per document. The
    * "how many tokenizer tokens is this corpus" budgeting number,
    * computed without encoding any token twice. */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     topK: Int): DataFrame = {
    val vocab = bpeEncodeVocab(docs, textCol, topK)
      .select(col("token"), col("n_symbols"))
    spread(docs)
      .select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("token"))
      .join(broadcast(vocab), Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_symbols")).as("n_bpe_symbols"))
  }
}
