package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Near-duplicate detection over document text (SURVEY §7.7).
  *
  * Three families, in increasing scale-friendliness:
  *  - n-gram Jaccard: exact pairwise similarity via a shingle self-join.
  *    Cost is Σ per-shingle bucket². Fine to ~10⁵ docs; the candidate
  *    generator for anything larger is MinHash LSH below.
  *  - MinHash + LSH banding: per-doc signatures are computed SCALAR-side
  *    (array_min over md5'd shingles — no explode), then docs are bucketed
  *    by band keys; only same-bucket pairs are compared. Shuffle cost is
  *    O(docs × bands), independent of pairwise volume.
  *  - SimHash: one 32-bit fingerprint per doc; near-dups collide exactly.
  *
  * Hash choice: md5 (not xxhash64) because signatures must be reproducible
  * across engines for the differential oracle; the lexicographic min of
  * md5(seed || shingle) is a valid MinHash permutation substitute.
  */
object NearDup {

  /** Corpus tables often arrive as few large files (here: one parquet per
    * table), which Spark scans with near-zero parallelism. Shingling /
    * hashing is CPU-bound per row, so spread rows across all cores first —
    * one cheap shuffle of raw text buys full-width compute on every
    * downstream stage. */
  private[operators] def spread(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)

  /** Exact word n-gram Jaccard over all candidate pairs sharing ≥1 shingle.
    * Emits (a_id, b_id, intersection, jaccard) for pairs ≥ threshold.
    *
    * The shingle self-join's work is Σ per-shingle bucket², so a single
    * stop-phrase shingle shared by 1% of a large corpus is a catastrophic
    * pair explosion. `maxDf` bounds that IN CODE: shingles appearing in
    * more than `maxDf` documents are dropped from both intersection and
    * set sizes before the join (one cheap aggregation pass — the surviving
    * hot-shingle list is tiny by construction, ≤ postings/maxDf entries, so
    * the exclusion join broadcasts). Σ bucket² is then ≤ maxDf × postings —
    * linear in the corpus for fixed maxDf. Near-dup semantics are
    * unchanged: a shingle in >maxDf docs carries no similarity signal
    * (it's a stop phrase), exactly like min-df pruning in IR practice.
    * `maxDf = 0` disables the cap (verification-scale corpora only) and
    * must be paired with an explicit `uncapped = true` — the exact
    * all-pairs form should never be the path of least resistance;
    * `candidates` (a_id, b_id) restricts scoring to precomputed pairs
    * (e.g. [[minHashLshCandidates]]) — the preferred 100 TB shape.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double, maxDf: Int = 10000,
                        candidates: Option[DataFrame] = None,
                        uncapped: Boolean = false): DataFrame =
    ngramPairStats(docs, idCol, textCol, n,
        requireCapOptIn(maxDf, candidates, uncapped), candidates)
      .withColumn("jaccard", col("intersection").cast("double") /
        (col("n_a") + col("n_b") - col("intersection")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("intersection"), col("jaccard"))

  /** Guard shared by every shingle-pair-join entry point: the uncapped
    * all-pairs form (maxDf = 0 with no candidate set) is a quadratic
    * scale-killer on any corpus with hot shingles, so it is opt-in —
    * callers must say `uncapped = true` to state they are running a
    * verification-scale exact pass. Candidate-fed calls are already
    * pair-bounded and pass through untouched. */
  private def requireCapOptIn(maxDf: Int, candidates: Option[DataFrame],
                              uncapped: Boolean): Int = {
    require(maxDf > 0 || candidates.nonEmpty || uncapped,
      "maxDf = 0 without a candidate set runs the exact all-pairs shingle " +
        "join (verification-scale only); pass uncapped = true to opt in, " +
        "or keep a hot-shingle cap / supply candidates")
    maxDf
  }

  /** Max-containment near-dup pairs: containment = |A∩B| / min(|A|,|B|) —
    * 1.0 whenever the smaller shingle set is a SUBSET of the larger.
    * Jaccard misses exactly these: a paragraph quoted inside a 100×
    * longer page scores jaccard ≈ 0.01 but containment 1.0, and that
    * asymmetric duplication (quotes, syndication, boilerplate wrappers)
    * is the dominant dup mode in web corpora. Same shingle-join engine
    * and maxDf/candidates scale posture as [[ngramJaccardPairs]]. */
  def ngramContainmentPairs(docs: DataFrame, idCol: String, textCol: String,
                            n: Int, threshold: Double, maxDf: Int = 10000,
                            candidates: Option[DataFrame] = None,
                            uncapped: Boolean = false): DataFrame =
    ngramPairStats(docs, idCol, textCol, n,
        requireCapOptIn(maxDf, candidates, uncapped), candidates)
      .withColumn("containment", col("intersection").cast("double") /
        least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("a_id"), col("b_id"), col("intersection"),
        col("containment"))

  /** Shared shingle-self-join engine: candidate pairs sharing ≥1 shingle
    * with (intersection, n_a, n_b) set statistics attached. */
  private def ngramPairStats(docs: DataFrame, idCol: String, textCol: String,
                             n: Int, maxDf: Int,
                             candidates: Option[DataFrame]): DataFrame = {
    val words = TextFunctions.tokens(col(textCol))
    val withSh = spread(docs)
      .select(col(idCol).as("doc_id"),
        array_distinct(TextFunctions.wordShingles(words, n)).as("__sh"))
      .filter(size(col("__sh")) > 0)
    // uncapped: carry each doc's shingle count on every posting row — the
    // pair aggregation then has both set sizes in hand with no separate
    // `sizes` branch (which would recompute the shingle subtree) and no
    // post-join lookups
    // deliberately NOT materialized: the plan below re-derives the
    // posting set per branch (hot list, both self-join legs, sizes — up
    // to 4 recomputes, 8 scans, no ReusedExchange), but an eager
    // localCheckpoint here measured strictly WORSE at sf0.1 (q218
    // 0.17→1.27 s, q136 1.49→1.84 s; suite-wide flat-to-negative): the
    // snapshot pays a full materialize + block read per consumer and
    // severs column pruning and whole-stage codegen across the branch,
    // while the recompute is a pipelined scan+project that AQE overlaps.
    // Callers that DO want one tokenization pass amortized across many
    // pair queries should snapshot their docs' postings themselves.
    val posting = withSh.select(col("doc_id"), size(col("__sh")).as("n_sh"),
      explode(col("__sh")).as("s"))
    // capped: survivors keep only a broadcast anti-join on the hot-shingle
    // list (tiny by construction, ≤ postings/maxDf entries) — the heavy
    // self-join input is never re-shuffled for the cap. Set sizes must
    // count SURVIVING shingles (sizes and intersections must agree on one
    // universe), so they are re-aggregated from the survivors and joined
    // onto the AGGREGATED pairs afterwards — pairs are orders of magnitude
    // fewer rows than postings, so correcting there beats any formulation
    // that joins a per-doc correction back onto the posting set (measured:
    // that shape cost more than it saved at 10× scale, PLANS.md).
    val capped = maxDf > 0
    val sh =
      if (!capped) posting
      else {
        val hot = posting.groupBy(col("s")).count()
          .filter(col("count") > maxDf).select(col("s"))
        posting.drop("n_sh").join(broadcast(hot), Seq("s"), "left_anti")
      }
    val joined = candidates match {
      case Some(c) =>
        c.select(col("a_id").as("__ca"), col("b_id").as("__cb"))
          .join(sh.as("a"), col("__ca") === col("a.doc_id"))
          .join(sh.as("b"),
            col("__cb") === col("b.doc_id") && col("a.s") === col("b.s"))
      case None =>
        sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
    }
    val pairs =
      if (!capped)
        joined
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("intersection"),
            first(col("a.n_sh")).as("n_a"), first(col("b.n_sh")).as("n_b"))
      else {
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        joined
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("intersection"))
          .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")),
            "a_id")
          .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b")),
            "b_id")
      }
    pairs
  }

  /** Per-doc MinHash signature columns sig_0..sig_{numHashes-1}. */
  def withMinHashSignature(docs: DataFrame, idCol: String, textCol: String,
                           shingleN: Int, numHashes: Int): DataFrame = {
    val words = TextFunctions.tokens(col(textCol))
    val sh = array_distinct(TextFunctions.wordShingles(words, shingleN))
    val base = spread(docs).select(col(idCol).as("doc_id"), sh.as("__sh"))
      .filter(size(col("__sh")) > 0)
    val sigs = (0 until numHashes).map { s =>
      array_min(transform(col("__sh"), x => md5(concat(lit(s"$s|"), x)))).as(s"sig_$s")
    }
    base.select(col("doc_id") +: sigs: _*)
  }

  /** LSH band keys per doc: `(doc_id, band_id, band_key)` — the banding
    * HALF of [[minHashLshCandidates]], exposed so an index can persist
    * it (see [[NearDupIndex]]) and stay definitionally identical to the
    * in-memory pairing. */
  def bandKeys(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int, numHashes: Int, bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must divide into bands")
    val sig = withMinHashSignature(docs, idCol, textCol, shingleN, numHashes)
    val numBands = numHashes / bandSize
    val bands = (0 until numBands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws(",",
          (0 until bandSize).map(k => col(s"sig_${b * bandSize + k}")): _*))
          .as("band_key"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_key"))
  }

  /** Conf key: per-(band_id, band_key) posting cap for the LSH candidate
    * self-joins ([[minHashLshCandidates]], [[NearDupIndex]]'s serves).
    * The band self-join's work is Σ per-bucket² — the band-space twin of
    * the hot-shingle problem `maxDf` solves — and a degenerate band key
    * (boilerplate-heavy crawl pages, near-empty docs, replica cliques)
    * puts millions of docs in ONE bucket, detonating quadratic pairs
    * before any `distinct()` can help. Buckets above the cap are dropped
    * BEFORE the join (the [[graft.operators.Corpus.bandedHammingPairs]]
    * mechanism): with the cap, Σ bucket² ≤ maxBucket × postings — linear
    * in the corpus for fixed maxBucket. The trade is explicit and the
    * same as maxDf's: members of a saturated bucket are a replica /
    * boilerplate clique whose duplicate status belongs to EXACT dedup
    * upstream, and a pair is lost only if EVERY band it shares is
    * saturated. Default-on (10k ⇒ worst surviving bucket ≈ 5·10⁷ pairs);
    * 0 disables for verification-scale exact passes. */
  val MaxBandBucketKey = "spark.graft.neardup.maxBandBucket"
  val DefaultMaxBandBucket: Long = 10000L

  /** Resolve a caller's maxBucket argument: negative = read the session
    * conf (default [[DefaultMaxBandBucket]]), 0 = cap off, >0 = explicit. */
  private[operators] def resolveMaxBucket(df: DataFrame,
                                          maxBucket: Long): Long =
    if (maxBucket >= 0) maxBucket
    else df.sparkSession.conf
      .get(MaxBandBucketKey, DefaultMaxBandBucket.toString).toLong

  /** The (band_id, band_key) buckets the hot-band cap would discard,
    * with their posting counts — the raw audit surface behind
    * [[hotBandAudit]]. Tiny by construction (≤ postings / maxBucket
    * rows); empty when `maxBucket <= 0` (cap off). */
  def saturatedBandBuckets(bands: DataFrame, maxBucket: Long): DataFrame = {
    val counted = bands.groupBy(col("band_id"), col("band_key"))
      .agg(count(lit(1)).as("postings"))
    if (maxBucket <= 0) counted.filter(lit(false))
    else counted.filter(col("postings") > maxBucket)
  }

  /** One-row audit of what the hot-band cap discards — the repo's "no
    * silent caps" discipline (scrubPii's per-rule counts) applied to the
    * cap that protects the LSH self-joins: `(max_bucket,
    * n_buckets_dropped, postings_dropped)`. At 100 TB an operator must
    * SEE the discarded mass: a nonzero row says a replica/boilerplate
    * clique reached banding (exact-dedup upstream should have removed
    * it) and quantifies exactly how many postings the candidate join
    * never saw. Zeros when the cap is off or nothing saturates. */
  def hotBandAudit(bands: DataFrame, maxBucket: Long): DataFrame =
    saturatedBandBuckets(bands, maxBucket)
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_buckets_dropped"),
        coalesce(sum(col("postings")), lit(0L)).as("postings_dropped"))
      .select(lit(maxBucket).as("max_bucket"),
        col("n_buckets_dropped"), col("postings_dropped"))

  /** Drop (band_id, band_key) buckets holding more than `maxBucket`
    * postings before a band self-join. The saturated-bucket list is tiny
    * by construction (≤ postings / maxBucket entries), so the exclusion
    * join broadcasts — no posting re-shuffle. `maxBucket <= 0` passes
    * through untouched. What the cap discards is never silent:
    * [[hotBandAudit]] / [[NearDupIndex.saturationAudit]] report it, and
    * the persisted-index serves log it. */
  private[operators] def dropHotBands(bands: DataFrame,
                                      maxBucket: Long): DataFrame =
    if (maxBucket <= 0) bands
    else {
      val hot = saturatedBandBuckets(bands, maxBucket)
        .select(col("band_id"), col("band_key"))
      bands.join(broadcast(hot), Seq("band_id", "band_key"), "left_anti")
    }

  /** LSH banding: distinct candidate pairs sharing at least one band key.
    * `maxBucket` caps the per-bucket posting count ([[MaxBandBucketKey]];
    * negative = session conf, 0 = off). */
  def minHashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, numHashes: Int = 12,
                           bandSize: Int = 3,
                           maxBucket: Long = -1L): DataFrame = {
    val exploded = dropHotBands(
      bandKeys(docs, idCol, textCol, shingleN, numHashes, bandSize),
      resolveMaxBucket(docs, maxBucket))
    exploded.as("x").join(exploded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
  }

  /** Recall/precision report of MinHash-LSH candidate generation against
    * the EXACT near-dup answer — "measure, don't guess" for the one knob
    * every dedup pipeline argues about (bands × rows tradeoff). Emits a
    * single row: (threshold, n_true_pairs, n_candidate_pairs, n_hits,
    * recall, precision). recall < 1 quantifies what LSH at this banding
    * misses at `threshold`; precision says how much verification work
    * the candidates imply.
    *
    * This is an OFFLINE CALIBRATION query: the exact side is the
    * uncapped shingle self-join (verification-only by the same contract
    * as the q34 twin) — run it on a SAMPLE at 100 TB, then apply the
    * chosen banding corpus-wide. Counts are integers and the two ratios
    * are single int/int divisions — deterministic.
    *
    * Scale: truth and candidates are each one banded/bucketed join; the
    * hit join runs on pair ids only. The three 1-row counts cross-join
    * broadcast-style into the report row. */
  def lshRecallReport(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, numHashes: Int, bandSize: Int,
                      threshold: Double): DataFrame = {
    // both sides persisted: each feeds its own count AND the hit join in
    // ONE plan — unpersisted, the exact shingle self-join and the LSH
    // banding each ran twice (Catalyst does not dedupe the subtrees)
    val truth = ngramJaccardPairs(docs, idCol, textCol, shingleN,
        threshold, maxDf = 0, uncapped = true) // exact truth IS the report
      .select(col("a_id"), col("b_id"))
      .persist()
    val cand = minHashLshCandidates(docs, idCol, textCol, shingleN,
      numHashes, bandSize).select(col("a_id"), col("b_id"))
      .persist()
    val nTrue = truth.agg(count(lit(1)).as("n_true_pairs"))
    val nCand = cand.agg(count(lit(1)).as("n_candidate_pairs"))
    val nHit = truth.join(cand, Seq("a_id", "b_id"))
      .agg(count(lit(1)).as("n_hits"))
    nTrue.crossJoin(nCand).crossJoin(nHit)
      .withColumn("threshold", lit(threshold))
      .withColumn("recall",
        when(col("n_true_pairs") > 0,
          col("n_hits").cast("double") / col("n_true_pairs").cast("double")))
      .withColumn("precision",
        when(col("n_candidate_pairs") > 0,
          col("n_hits").cast("double") /
            col("n_candidate_pairs").cast("double")))
      .select(col("threshold"), col("n_true_pairs"),
        col("n_candidate_pairs"), col("n_hits"), col("recall"),
        col("precision"))
  }

  /** SimHash per document (up to 64 bits): per-token md5 nibble bits vote
    * ±1 per bit position; the sign of each bit-sum sets the fingerprint
    * bit. 32 bits is plenty for fingerprint equality/compact storage; use
    * 64 when the fingerprint feeds BAND BLOCKING
    * (graft.operators.Corpus.simHashHammingPairs) at scale — 16-bit bands
    * over 64 bits give 65,536 values per band vs 256 for 8-bit bands over
    * 32, i.e. 256× smaller candidate buckets for the same band count.
    *
    * One row in, one fingerprint out: ids are expected unique (a document
    * per row). Rows sharing an id each emit their own fingerprint — the
    * historical aggregate formulation instead merged their token votes
    * into one row, a merge no caller used (corpus tables carry unique
    * ids) and that blended two documents' fingerprints when it fired. */
  def simHash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 32): DataFrame = {
    require(bits <= 64,
      "fingerprint is packed into a single long (md5 supplies up to 128 " +
        "nibble bits, but 64 is the sign-safe long capacity here)")
    // one fused pass per document (graft.expressions.SimHashPack) — the
    // explode + bits-wide SUM formulation this replaces shuffled the whole
    // tokenized corpus per fingerprint pass; NearDupSimilaritySpec pins
    // signature equality against that aggregate formulation
    graft.GraftExtensions.register(docs.sparkSession)
    spread(docs)
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__t"))
      // the explode-based formulation emitted no row for token-less docs;
      // keep that row-set contract
      .filter(size(col("__t")) > 0)
      .select(col("doc_id"),
        call_function("simhash_pack", col("__t"), lit(bits)).as("simhash"))
  }

  /** Exact token-set-similarity self-join via PREFIX FILTERING (the
    * SSJoin/PPJoin family): emits every pair with Jaccard >= `minJaccard`
    * over DISTINCT whitespace tokens — exactly the all-pairs answer, found
    * without an all-pairs comparison.
    *
    * Why it is lossless: order tokens by a global total order (rarest
    * first: ascending document frequency, then token). A pair with
    * J >= t shares at least ceil(t * max(|A|,|B|)) tokens, so by
    * pigeonhole each side's PREFIX of length |X| - ceil(t*|X|) + 1
    * contains at least one shared token — and because both sides sort by
    * the SAME order, the smallest shared token sits in BOTH prefixes.
    * Candidates are therefore an equi-join on prefix tokens only; the
    * exact Jaccard check runs on candidates alone.
    *
    * Contrast with [[minHashLshCandidates]]: LSH is probabilistic
    * (recall < 1), this is exact — the right tool when missed duplicates
    * are unacceptable (eval-set hygiene, legal dedup). Cost: prefix
    * postings are a (1-t) fraction of all postings, and rare-first
    * ordering makes prefix buckets the SMALLEST buckets, so the join's
    * Σ bucket² stays near-linear; the length filter |B| >= t*|A| prunes
    * candidates before verification. Emits
    * (a_id, b_id, n_common, jaccard). */
  def prefixFilterJoin(docs: DataFrame, idCol: String, textCol: String,
                       minJaccard: Double): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"minJaccard must be in (0, 1], got $minJaccard")
    graft.GraftExtensions.register(docs.sparkSession)
    // every stage downstream of tokenization works on 64-BIT TOKEN HASHES:
    // the global order, the candidate join key, and the verification
    // arrays never carry token text (8 bytes/token through every exchange
    // instead of the string). Any total order is a valid prefix order, so
    // ordering by (df, hash) preserves losslessness; exactness is modulo
    // 64-bit hash collisions (~n²/2⁶⁵ — absent in practice). The hash
    // arrays are SORTED once per doc so pair verification is a codegen'd
    // merge walk (sorted_common) instead of a per-evaluation hash-set
    // build — measured 2.2 s → ~0.1 s on the 1.8M-candidate bench corpus,
    // and Catalyst may evaluate the verification predicate more than once
    // per row (join-condition inlining), which the merge makes free.
    // deliberately NOT persisted: the token-set frame feeds the posting
    // explode and both verification fetches, and `prefix` feeds both
    // self-join legs — but materializing the ARRAY-carrying frames
    // measured strictly worse single-shot at sf0.1 (cold 5.9 s → 10.5 s:
    // the cache write of per-doc hash arrays + the codegen break cost
    // more than the recomputes, the ngramPairStats lesson again)
    val tokenSets = spread(docs)
      .select(col(idCol).as("doc_id"),
        array_sort(transform(array_distinct(TextFunctions.tokens(col(textCol))),
          t => xxhash64(t))).as("__tk"))
      .filter(size(col("__tk")) > 0)
      .select(col("doc_id"), col("__tk"), size(col("__tk")).as("m"))
    val posting = tokenSets
      .select(col("doc_id"), col("m"), explode(col("__tk")).as("__h"))
    // global rare-first order via ONE window over the hash (postings are
    // token-distinct per doc, so count-over-hash IS document frequency —
    // no separate df aggregate + join-back shuffle)
    val posWin = Window.partitionBy(col("doc_id"))
      .orderBy(col("__df").asc, col("__h"))
    val prefix = posting
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .withColumn("__pos", row_number().over(posWin))
      // prefix length |X| - ceil(t*|X|) + 1
      .filter(col("__pos") <= col("m") - ceil(lit(minJaccard) * col("m")) + 1)
      .select(col("__h"), col("doc_id"), col("m"), col("__pos"))
    // PPJoin positional filter (lossless): for the FIRST common prefix
    // token, overlap <= 1 + min(remaining suffix lengths); a qualifying
    // pair needs overlap >= ceil(t/(1+t) * (mA+mB)), and the first-common-
    // token match always satisfies the bound — so filtering every match
    // and then de-duplicating pairs loses nothing while discarding the
    // (dominant, in dense corpora) matches on deep-prefix tokens
    val alpha = ceil(lit(minJaccard / (1.0 + minJaccard)) *
      (col("a.m") + col("b.m")))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.__h") === col("b.__h") &&
          col("a.doc_id") < col("b.doc_id") &&
          // J >= t forces t*max <= min (size filter, lossless)
          col("b.m").cast("double") * lit(minJaccard) <= col("a.m") &&
          col("a.m").cast("double") * lit(minJaccard) <= col("b.m") &&
          lit(1) + least(col("a.m") - col("a.__pos"),
            col("b.m") - col("b.__pos")) >= alpha)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    // exact verification on candidates only: fetch both token sets and
    // merge-count scalar-side (codegen'd sorted_common, no explode)
    cand
      .join(tokenSets.select(col("doc_id").as("a_id"),
        col("__tk").as("__ta"), col("m").as("__ma")), Seq("a_id"))
      .join(tokenSets.select(col("doc_id").as("b_id"),
        col("__tk").as("__tb"), col("m").as("__mb")), Seq("b_id"))
      .withColumn("n_common",
        call_function("sorted_common", col("__ta"), col("__tb")))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("__ma") + col("__mb") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("n_common"), col("jaccard"))
  }

  /** Blocked edit-distance record linkage: pairs of values whose
    * Levenshtein distance is <= `maxDist`, compared only WITHIN blocks
    * keyed by the lower-cased first character (classic record-linkage
    * blocking — approximate BY DESIGN: a typo in position 1 crosses
    * blocks and is missed, the documented trade for never comparing
    * across the full cross product). A length filter
    * |len(a) - len(b)| <= maxDist is applied inside blocks (lossless:
    * edit distance is bounded below by the length difference).
    *
    * Emits (a_id, b_id, a_value, b_value, distance), a_id < b_id.
    *
    * Scale: the equi-join on the block key is the only shuffle; per-block
    * cost is bucket², so blocks must stay small relative to the corpus —
    * for natural-language name data a first-character block is ~1/26 of
    * rows; refine the key (first char + soundex, or char + length band)
    * before running this against heavier distributions. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df
      .select(col(idCol).as("id"), col(strCol).as("v"))
      .filter(col("v").isNotNull && length(col("v")) > 0)
      .withColumn("__blk", lower(substring(col("v"), 1, 1)))
    base.as("a")
      .join(base.as("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.id") < col("b.id") &&
          abs(length(col("a.v")) - length(col("b.v"))) <= maxDist)
      .withColumn("distance", levenshtein(col("a.v"), col("b.v")))
      .filter(col("distance") <= maxDist)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.v").as("a_value"), col("b.v").as("b_value"),
        col("distance"))
  }

  /** Sorted-neighborhood blocking (the classic record-linkage
    * alternative to hash/band blocking): rows are globally ordered by a
    * domain `key` and every pair within `window` positions becomes a
    * candidate — catches near-dups whose edits fall OUTSIDE the key
    * (banding's blind spot is edits inside every band; SNM's is edits
    * inside the key prefix), which is why production linkage runs
    * several blocking passes and unions candidates.
    *
    * Emits `(a_id, b_id, rank_gap)` with a_id the lower-RANKED row and
    * rank_gap in 1..window-1 — candidates = N * (window - 1) exactly.
    *
    * Scale: the global order comes from a range partition + per-bucket
    * numbering + bucket-count prefix offsets (the globalRowNumber
    * telescoping, string-key-safe; no single-task global window). The
    * neighbor join is an equi-join on the dense rank, so the whole
    * operator is two bounded shuffles regardless of key skew; the
    * prefix-offset frame is one row per bucket. Range-partitioner
    * sampling only moves BUCKET BOUNDARIES — every rank, and therefore
    * the output, is a pure function of the (key, id) order. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, key: Column,
                              window: Int, buckets: Int = 64): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val base = df.select(col(idCol).as("id"), key.as("__k"))
      .filter(col("__k").isNotNull)
    val parted = base.repartitionByRange(buckets, col("__k"), col("id"))
      .withColumn("__p", spark_partition_id())
    val local = parted.withColumn("__lrn",
      row_number().over(
        Window.partitionBy(col("__p")).orderBy(col("__k"), col("id"))))
    val offsets = local.groupBy(col("__p")).agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(Window.orderBy(col("__p"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__p"), col("__off"))
    val ranked = local.join(broadcast(offsets), Seq("__p"))
      .select(col("id"), (col("__off") + col("__lrn")).as("__rn"))
    val left = ranked.select(col("id").as("a_id"), col("__rn"),
        explode(sequence(lit(1), lit(window - 1))).as("rank_gap"))
      .withColumn("__rn2", col("__rn") + col("rank_gap"))
    left.join(ranked.select(col("id").as("b_id"), col("__rn").as("__rn2")),
        Seq("__rn2"))
      .select(col("a_id"), col("b_id"), col("rank_gap"))
  }

  /** Winnowing fingerprints per document (Schleimer/Wilkerson/Aiken):
    * md5 each ordered `k`-word shingle, take the min hash of every
    * sliding window of `w` consecutive shingle hashes, emit the distinct
    * fingerprint set. Local edits perturb only the windows they touch,
    * so two documents sharing a long verbatim span share most of the
    * fingerprints selected inside it. Scalar-only (transform/slice over
    * the shingle array — no explode until the final distinct set). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    val sh = TextFunctions.wordShingles(TextFunctions.tokens(col(textCol)), k)
    spread(docs)
      .select(col(idCol).as("doc_id"), transform(sh, x => md5(x)).as("__h"))
      .filter(size(col("__h")) >= w)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("__h")) - (w - 1)),
          i => array_min(slice(col("__h"), i, lit(w)))))).as("fingerprint"))
  }

  /** Cross-document verbatim span reuse: which document pairs share
    * winnowed fingerprints, and how much. The attribution / contamination
    * question a corpus owner asks that near-dup scoring does not answer —
    * a 2% quoted span never clears a Jaccard threshold but lights up
    * here as `shared` fingerprint hits.
    *
    * Emits (a_id, b_id, shared, n_a, n_b, reuse) with
    * reuse = shared / min(n_a, n_b) over the df-capped fingerprint sets.
    *
    * Scale: identical posture to [[ngramJaccardPairs]] — fingerprints in
    * more than `maxDf` documents are boilerplate (nav text, licenses) and
    * are dropped from BOTH the pair join and the per-doc set sizes via a
    * broadcast anti-join against the (tiny, ≤ postings/maxDf) hot list,
    * bounding the self-join at Σ bucket² ≤ maxDf × postings. Winnowing
    * already thins postings ~(w+1)/2× vs raw shingles, so this runs on a
    * fraction of the q34/q68 join volume. */
  def winnowReusePairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 3, w: Int = 4, maxDf: Int = 16,
                       minShared: Int = 3): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
    val hot = fps.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("fingerprint"))
    val kept = fps.join(broadcast(hot), Seq("fingerprint"), "left_anti")
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
    val pairs = kept.as("a").join(kept.as("b"),
        col("a.fingerprint") === col("b.fingerprint") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("__n", "n_a"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("__n", "n_b"), Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("shared"),
        col("n_a"), col("n_b"),
        (col("shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("reuse"))
  }

  /** Longest common shingle RUN per candidate pair — the dedup
    * EXPLANATION operator: bag-overlap scores (Jaccard, containment)
    * say two docs share material; the longest run says whether it is
    * one contiguous lifted passage or scattered phrases. This is
    * longest-common-substring at shingle granularity, computed
    * distributed via the diagonal trick: a positional match (i, j)
    * belongs to diagonal i−j, and consecutive i on one diagonal ARE a
    * contiguous common run — so runs fall out of a gaps-and-islands
    * pass, no dynamic programming.
    *
    * Emits (a_id, b_id, n_matches, max_run) — run lengths in shingles
    * (tokens ≈ run + n − 1). Pairs with no shared shingle are absent.
    *
    * Scale: candidates must be a banded/blocked pair set (q72-style) —
    * the match join is per-pair Σ cnt_a·cnt_b over shared shingle
    * values, and the islands window is keyed on (pair, diagonal). Cost
    * is proportional to the CANDIDATE PAIR count, so run this after
    * exact dedup (replica corpora otherwise multiply pairs
    * quadratically — the same pathology as uncapped k-truss, removed
    * by the same upstream step). */
  /** MinHash-LSH parameter planner: given the CORPUS'S OWN pair-
    * similarity histogram, score every (bands, rowsPerBand) split of a
    * signature budget by expected recall above `simThreshold` and
    * expected false-candidate rate below it, using the S-curve
    * `P(candidate | s) = 1 − (1 − s^r)^b`. "Pick b and r from the
    * textbook" ignores the corpus; this reads the real similarity mass
    * and prices each config against it.
    *
    * Determinism: similarities bin EXACTLY (`floor(bins·I/U)` on
    * intersection/union integers); every S-curve probability is a
    * CONSTANT evaluated once here (bin midpoint literals, integer
    * exponents) and combined with the bin counts in fixed ascending-bin
    * order — the oracle interpolates the same literals, so no engine
    * `pow`/summation-order drift exists anywhere.
    *
    * The histogram only sees pairs with sim ≥ `minSim` (it comes from
    * a thresholded pair join); recall is exact over that support, and
    * the fp rate is measured among the near-miss band [minSim,
    * simThreshold) — the only false candidates that cost real
    * verification work.
    *
    * Scale: the histogram is the one data-sized pass (a thresholded
    * pair join — `maxDf` caps hot shingles, `candidates` restricts the
    * pass to pre-banded pairs, same levers as [[ngramJaccardPairs]];
    * the default uncapped all-pairs form is verification-scale only);
    * everything after is a bins-sized model. */
  def lshPlanner(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, minSim: Double = 0.2,
                 simThreshold: Double = 0.7, budget: Int = 24,
                 bins: Int = 20, maxDf: Int = 10000,
                 candidates: Option[DataFrame] = None,
                 uncapped: Boolean = false): DataFrame = {
    require(budget >= 2, s"budget must be >= 2, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = ngramPairStats(docs, idCol, textCol, n,
        requireCapOptIn(maxDf, candidates, uncapped), candidates)
      .filter(col("intersection").cast("double") /
        (col("n_a") + col("n_b") - col("intersection")).cast("double")
        >= minSim)
    // exact integer bin: floor(bins * I / U); clamp the sim == 1 edge
    val u = col("n_a") + col("n_b") - col("intersection")
    val bin = least(
      (((col("intersection") * bins)
        - pmod(col("intersection") * bins, u)) / u).cast("int"),
      lit(bins - 1))
    val hist = pairs.withColumn("__bin", bin)
      .groupBy(col("__bin")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val counts = (0 until bins).map(b => hist.getOrElse(b, 0L))
    val tBin = math.ceil(simThreshold * bins).toInt
    val configs = (1 to budget).filter(budget % _ == 0)
      .map(b => (b, budget / b))
    def pCurve(b: Int, r: Int, s: Double): Double = {
      var sr = 1.0
      (1 to r).foreach(_ => sr *= s) // repeated multiplication: no pow
      var q = 1.0
      (1 to b).foreach(_ => q *= (1.0 - sr))
      1.0 - q
    }
    val rows = configs.map { case (b, r) =>
      // fixed ascending-bin fold order — mirrored literally in the oracle
      var caught = 0.0; var missedBase = 0L
      var falseC = 0.0; var nearBase = 0L
      (0 until bins).foreach { i =>
        val p = pCurve(b, r, (i + 0.5) / bins)
        if (i >= tBin) { caught += counts(i) * p; missedBase += counts(i) }
        else { falseC += counts(i) * p; nearBase += counts(i) }
      }
      val recall = if (missedBase == 0) 0.0 else caught / missedBase
      val fp = if (nearBase == 0) 0.0 else falseC / nearBase
      (b, r, missedBase, nearBase, recall, fp)
    }
    rows.toDF("bands", "rows_per_band", "n_pairs_above", "n_pairs_near",
      "exp_recall", "exp_fp_rate")
  }

  /** Data-driven dedup threshold: near-dup similarity histograms are
    * characteristically bimodal — a near-miss mode low and a true-dup
    * mode high — and the principled cut is the VALLEY between them.
    * This finds it deterministically: the modal bin below the midpoint,
    * the modal bin above it (ties → lower bin), and the emptiest bin
    * strictly between (ties → lower); threshold = that bin's midpoint.
    * Replaces hand-picked 0.7s with the corpus's own structure, the
    * same spirit as [[lshPlanner]].
    *
    * Emits one row: (low_mode_bin, high_mode_bin, valley_bin,
    * threshold, n_pairs) — empty when the histogram lacks mass on
    * either side of the midpoint (no bimodal structure to cut).
    *
    * Scale: the histogram pass is the thresholded pair join (`maxDf`
    * caps hot shingles, `candidates` feeds pre-banded pairs — the
    * 100 TB shape; uncapped all-pairs is verification-scale only);
    * mode/valley selection runs on the bins-sized spine. */
  def autoThreshold(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, minSim: Double = 0.2, bins: Int = 20,
                    maxDf: Int = 10000,
                    candidates: Option[DataFrame] = None,
                    uncapped: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = ngramPairStats(docs, idCol, textCol, n,
        requireCapOptIn(maxDf, candidates, uncapped), candidates)
      .filter(col("intersection").cast("double") /
        (col("n_a") + col("n_b") - col("intersection")).cast("double")
        >= minSim)
    val u = col("n_a") + col("n_b") - col("intersection")
    val bin = least(
      (((col("intersection") * bins)
        - pmod(col("intersection") * bins, u)) / u).cast("int"),
      lit(bins - 1))
    val hist = pairs.withColumn("__bin", bin)
      .groupBy(col("__bin")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val counts = (0 until bins).map(b => b -> hist.getOrElse(b, 0L))
    val half = bins / 2
    val lowSide = counts.filter { case (b, cn) => b < half && cn > 0 }
    val highSide = counts.filter { case (b, cn) => b >= half && cn > 0 }
    if (lowSide.isEmpty || highSide.isEmpty)
      return Seq.empty[(Int, Int, Int, Double, Long)]
        .toDF("low_mode_bin", "high_mode_bin", "valley_bin", "threshold",
          "n_pairs")
    def modal(side: Seq[(Int, Long)]): Int =
      side.maxBy { case (b, cn) => (cn, -b) }._1
    val lo = modal(lowSide)
    val hi = modal(highSide)
    val between = counts.filter { case (b, _) => b > lo && b < hi }
    // adjacent modes leave no strict gap: cut at the high mode's bin
    val valley = if (between.isEmpty) hi
      else between.minBy { case (b, cn) => (cn, b) }._1
    val total = counts.map(_._2).sum
    Seq((lo, hi, valley, (2 * valley + 1).toDouble / (2 * bins), total))
      .toDF("low_mode_bin", "high_mode_bin", "valley_bin", "threshold",
        "n_pairs")
  }

  /** Longest INTERNAL repeated shingle run per document — the
    * self-plagiarism / template-stuffing signal: q63's repetition
    * ratios say how much of a doc repeats; this says whether the
    * repetition is one long copied block (navigation boilerplate, spun
    * sections) or scattered phrases. Same diagonal + islands identity
    * as [[commonRunLengths]], applied to the doc's self-matches with
    * i < j (the main diagonal is excluded by construction).
    *
    * Emits (idCol, n_self_matches, max_run) for docs with at least one
    * internal repeat. `maxTokens` truncates pathological docs before
    * the per-doc self-join (cost is Σ per-shingle multiplicity² —
    * exactly the docs this operator exists to flag). */
  def selfRepeatRuns(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, maxTokens: Int = 2048): DataFrame = {
    val sh = spread(docs).select(col(idCol),
        posexplode(slice(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), shingleN), 1, maxTokens))
          .as(Seq("__pos", "__sh")))
    val matches = sh.as("a")
      .join(sh.as("b"),
        col(s"a.$idCol") === col(s"b.$idCol") &&
          col("a.__sh") === col("b.__sh") &&
          col("a.__pos") < col("b.__pos"))
      .select(col(s"a.$idCol").as("__id"), col("a.__pos").as("__i"),
        col("b.__pos").as("__j"))
      .withColumn("__diag", col("__j") - col("__i"))
    val wIsl = Window.partitionBy(col("__id"), col("__diag"))
      .orderBy(col("__i"))
    matches
      .withColumn("__isl", col("__i") - row_number().over(wIsl))
      .groupBy(col("__id"), col("__diag"), col("__isl"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("__id").as(idCol))
      .agg(sum(col("__run")).as("n_self_matches"),
        max(col("__run")).as("max_run"))
  }

  def commonRunLengths(docs: DataFrame, idCol: String, textCol: String,
                       candidates: DataFrame, shingleN: Int = 3)
      : DataFrame = {
    val sh = spread(docs).select(col(idCol),
        posexplode(TextFunctions.wordShingles(
          TextFunctions.tokens(col(textCol)), shingleN))
          .as(Seq("__pos", "__sh")))
    val a = sh.select(col(idCol).as("a_id"), col("__pos").as("__i"),
      col("__sh"))
    val b = sh.select(col(idCol).as("b_id"), col("__pos").as("__j"),
      col("__sh"))
    val matches = candidates.select(col("a_id"), col("b_id"))
      .join(a, Seq("a_id"))
      .join(b, Seq("b_id", "__sh"))
      .withColumn("__diag", col("__i") - col("__j"))
    val wIsl = Window.partitionBy(col("a_id"), col("b_id"), col("__diag"))
      .orderBy(col("__i"))
    matches
      .withColumn("__isl", col("__i") - row_number().over(wIsl))
      .groupBy(col("a_id"), col("b_id"), col("__diag"), col("__isl"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("__run")).as("n_matches"),
        max(col("__run")).as("max_run"))
  }
}
