package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §7.7).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set against the
  *    corpus — one pass, no shuffle of the corpus, exact. The dot products
  *    are strict left-fold double sums so results are bit-reproducible
  *    across engines (needed for the differential oracle).
  *  - hyperplane LSH bucketing: the 100 TB path. Each vector gets a b-bit
  *    bucket from the signs of dot products with deterministic pseudo-random
  *    hyperplanes; candidate generation is then a bucket-equality join
  *    (shuffle on a small int key) instead of a cross join.
  */
object Similarity {

  /** Conf key bounding how many rows the brute-force paths may broadcast.
    * The "query side must be small" contract was previously documentation
    * only; this makes it enforced. At ~3 KB per 768-dim float vector the
    * default (1M rows) is ~3 GB of driver/executor broadcast — already
    * generous; anything larger is a mis-use that would OOM the driver on a
    * real cluster. */
  val MaxBroadcastRowsKey = "spark.graft.similarity.maxBroadcastRows"
  val DefaultMaxBroadcastRows: Long = 1000000L

  private def broadcastCap(df: DataFrame): Long =
    df.sparkSession.conf
      .get(MaxBroadcastRowsKey, DefaultMaxBroadcastRows.toString).toLong

  /** Fail-fast guard on a side that is about to be driver-broadcast.
    * Materializes at most cap+1 rows ONCE (limit short-circuits the scan;
    * localCheckpoint pins the bounded result), counts them, and — when
    * the side fits — returns the MATERIALIZED frame: a limit that did not
    * truncate is the complete side, so the subsequent broadcast build
    * reuses the probe's work instead of re-running the predicate scan
    * (the guard previously cost two full scans of the guarded side).
    * Throws before any broadcast is constructed. */
  private[operators] def requireBroadcastable(df: DataFrame, what: String,
                                              hint: String): DataFrame = {
    val cap = broadcastCap(df)
    val probe = math.min(cap + 1, Int.MaxValue.toLong).toInt
    // cache (not localCheckpoint): the failure path must RELEASE the
    // probe rows before throwing, and an evicted re-compute is safe —
    // under the cap the limit returns the complete (deterministic) set
    val limited = df.limit(probe).cache()
    val observed = limited.count() // counts the cached rows — no rescan
    if (observed > cap) {
      limited.unpersist(false)
      throw new IllegalArgumentException(
        s"$what matched more than $cap rows " +
          s"(conf $MaxBroadcastRowsKey=$cap); broadcasting it would OOM " +
          s"the driver at scale. $hint")
    }
    limited
  }

  /** Strict left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector (queries chosen by
    * predicate; must be small enough to broadcast). The scoring uses the
    * native codegen'd `vec_cosine` expression (graft.expressions
    * .FloatVecCosine) — bit-identical to the HOF `cosine` above but a
    * single fused pass instead of three interpreted lambda walks. */
  def cosineTopK(embeddings: DataFrame, idCol: String, embCol: String,
                 queryPredicate: Column, k: Int): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val q = requireBroadcastable(
      embeddings.filter(queryPredicate)
        .select(col(idCol).as("q_id"), col(embCol).as("__q_emb")),
      "cosineTopK query side (queryPredicate)",
      "Narrow the predicate, or use ivfTopK / lshBucketed candidates for " +
        "large query sets.")
    val cand = embeddings.select(col(idCol).as("n_id"), col(embCol).as("__n_emb"))
    val scored = cand.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        call_function("vec_cosine", col("__q_emb"), col("__n_emb")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("n_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: every (a, b) with cosine >=
    * threshold. With `candidates` given (e.g. LSH band pairs from
    * [[lshBucketed]] or IVF buckets), only those pairs are scored — the
    * scale path. Without, all pairs are scored via a broadcast cross join —
    * exact, for verification scale. */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, embCol: String,
                         threshold: Double,
                         candidates: Option[DataFrame] = None): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    // spread the probe side: single-file corpora scan as one task, which
    // would run the whole O(n^2) scoring loop single-threaded
    val a = embeddings
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("a_id"), col(embCol).as("__a_emb"))
    val b = embeddings.select(col(idCol).as("b_id"), col(embCol).as("__b_emb"))
    val pairs = candidates match {
      case Some(c) => c.join(a, "a_id").join(b, "b_id")
      case None =>
        a.join(broadcast(requireBroadcastable(b,
          "cosineNearDupPairs without candidates (all-pairs corpus broadcast)",
          "Pass candidates= (e.g. from lshBucketed bands, " +
            "simHashHammingPairs, or IVF buckets) for corpora above the " +
            "cap; the no-candidates path is verification-scale only.")),
          col("a_id") < col("b_id"))
    }
    pairs
      .withColumn("cosine",
        call_function("vec_cosine", col("__a_emb"), col("__b_emb")))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Margin-based bitext mining: mutual-best cross-collection matches
    * whose cosine clearly beats each side's runner-up — the
    * margin-scoring idea behind large-scale parallel-corpus mining
    * (a raw cosine threshold can't separate "true translation" from
    * "hubness region where everything scores 0.8"; dividing by the
    * local competition can).
    *
    * For x in A (rows matching `sideA`) and y in B: x's candidates are
    * ALL of B, ranked by (cosine desc, id asc); y's symmetrically over
    * A. A pair is mined iff x and y are each other's rank-1 AND
    * `margin = cos(x,y) / ((runnerUp_x + runnerUp_y) / 2) >= minMargin`
    * where runnerUp is each side's rank-2 cosine. The denominator is
    * one fixed two-term sum of two order-free window maxima — no
    * accumulation-order nondeterminism anywhere, so a differential
    * oracle matches bitwise. A side with no runner-up (singleton
    * competition — common under bucket-local candidates) falls back to
    * the OTHER side's runner-up; when neither side has one, the margin
    * is NULL and the pair is dropped — no-competition evidence is no
    * evidence.
    *
    * Emits (a_id, b_id, cosine, margin), one row per mined pair.
    *
    * Scale: without `candidates`, B and A are broadcast in turn
    * (guarded — verification scale only). With `candidates` (a_id,
    * b_id) from [[lshBucketed]] bands or IVF buckets, only those pairs
    * are scored and ranked — rank-1/rank-2 are then bucket-local, the
    * standard ANN-mining approximation, and the whole pass is
    * candidate-bound. */
  def marginBitextMine(embeddings: DataFrame, idCol: String, embCol: String,
                       sideA: Column, sideB: Column, minMargin: Double,
                       candidates: Option[DataFrame] = None): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val a = embeddings.filter(sideA)
      .select(col(idCol).as("a_id"), col(embCol).as("__a_emb"))
    val b = embeddings.filter(sideB)
      .select(col(idCol).as("b_id"), col(embCol).as("__b_emb"))
    val pairs = candidates match {
      case Some(c) => c.select(col("a_id"), col("b_id"))
        .join(a, "a_id").join(b, "b_id")
      case None =>
        val spreadA = a.repartition(
          embeddings.sparkSession.sparkContext.defaultParallelism)
        spreadA.crossJoin(broadcast(requireBroadcastable(b,
          "marginBitextMine side B (all-pairs cross join)",
          "Pass candidates= (lshBucketed / IVF buckets) for collections " +
            "above the cap; the no-candidates path is verification-scale " +
            "only.")))
    }
    val scored = pairs.withColumn("cosine",
      call_function("vec_cosine", col("__a_emb"), col("__b_emb")))
      .select(col("a_id"), col("b_id"), col("cosine"))
    val wA = Window.partitionBy(col("a_id"))
      .orderBy(col("cosine").desc, col("b_id"))
    val wB = Window.partitionBy(col("b_id"))
      .orderBy(col("cosine").desc, col("a_id"))
    val ranked = scored
      .withColumn("__ra", row_number().over(wA))
      .withColumn("__rb", row_number().over(wB))
    // runner-up cosine per side, joined back onto the mutual-best pairs
    val r2a = ranked.filter(col("__ra") === 2)
      .select(col("a_id"), col("cosine").as("__s2a"))
    val r2b = ranked.filter(col("__rb") === 2)
      .select(col("b_id"), col("cosine").as("__s2b"))
    ranked.filter(col("__ra") === 1 && col("__rb") === 1)
      .join(r2a, Seq("a_id"), "left")
      .join(r2b, Seq("b_id"), "left")
      .withColumn("__den", (coalesce(col("__s2a"), col("__s2b"))
        + coalesce(col("__s2b"), col("__s2a"))) / lit(2.0))
      // a zero/negative runner-up mean is no competition baseline at
      // all — and a NEGATIVE denominator inverts the ratio, letting a
      // negative-cosine pair with more-negative runner-ups pass; the
      // margin contract only means something against positive runner-up
      // mass (NULL __den — no runner-up on either side — drops here too)
      .filter(col("__den") > 0)
      .withColumn("margin", col("cosine") / col("__den"))
      .filter(col("margin") >= minMargin)
      .select(col("a_id"), col("b_id"), col("cosine"), col("margin"))
  }

  // ---- IVF (inverted-file) ANN: the centroid-bucketed scale path --------

  /** Deterministic IVF seed centroids: the k vectors with the smallest
    * md5(vec_id) — an arbitrary but engine-portable pseudo-random draw.
    * (A production IVF refines these with Lloyd iterations; element-wise
    * mean centroids are deliberately NOT computed here because distributed
    * float summation order would break cross-engine reproducibility.) */
  def ivfCentroids(embeddings: DataFrame, idCol: String, embCol: String,
                   k: Int): DataFrame =
    embeddings
      .select(col(idCol).as("centroid_id"), col(embCol).as("centroid_emb"),
        md5(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h"), col("centroid_id"))
      .limit(k)
      .drop("__h")

  /** Assign every vector to its nearest centroid by cosine (broadcast of
    * the tiny centroid set; one scan, no shuffle of the corpus). */
  def ivfAssign(embeddings: DataFrame, idCol: String, embCol: String,
                centroids: DataFrame): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val scored = embeddings.crossJoin(broadcast(centroids))
      .withColumn("cos",
        call_function("vec_cosine", col(embCol), col("centroid_emb")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos").desc, col("centroid_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("centroid_id"), col("cos").as("centroid_cos"))
  }

  /** IVF top-k search: probe only the `nprobe` nearest centroid buckets
    * per query. Candidate volume is corpus/k * nprobe instead of the whole
    * corpus — the 100 TB trade of recall for a k-fold scan cut. Join is on
    * the small centroid id (bucket), never a cross join of the corpus. */
  def ivfTopK(embeddings: DataFrame, idCol: String, embCol: String,
              queryPredicate: Column, centroids: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val assigned = ivfAssign(embeddings, idCol, embCol, centroids)
    val corpus = embeddings.select(col(idCol).as("n_id"), col(embCol).as("__n_emb"))
      .join(assigned.select(col(idCol).as("n_id"), col("centroid_id")), "n_id")
    val queries = embeddings.filter(queryPredicate)
      .select(col(idCol).as("q_id"), col(embCol).as("__q_emb"))
    // top-nprobe centroids per query
    val qc = queries.crossJoin(broadcast(centroids))
      .withColumn("cos",
        call_function("vec_cosine", col("__q_emb"), col("centroid_emb")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("__q_emb"), col("centroid_id"))
    qc.join(corpus, Seq("centroid_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        call_function("vec_cosine", col("__q_emb"), col("__n_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("n_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }

  /** IVF recall calibration: the measured recall@k curve over
    * nprobe = 1..maxNprobe, against exact brute-force top-k ground truth
    * on a query sample — the ANN analogue of the LSH parameter planner
    * ([[graft.operators.NearDup.lshPlanner]]): pick the cheapest nprobe
    * whose measured recall clears the budget, instead of guessing from
    * folklore.
    *
    * One scoring pass: candidates are scored once at `maxNprobe` with
    * each candidate's PROBE RANK (the rank of its bucket among the
    * query's nearest centroids) attached; the nprobe = p curve point
    * re-ranks the candidates with probe rank ≤ p — a bounded explode
    * (≤ maxNprobe copies of the candidate set), never a re-scan. Recall
    * is hit-count / exact-pair-count — integer counts, one division, so
    * a differential oracle matches bitwise.
    *
    * Emits one row per nprobe: (nprobe, n_exact, n_hit, recall).
    *
    * Scale: ground truth is [[cosineTopK]] (broadcast-guarded query
    * side — calibration runs on a SAMPLE, the q142 posture); the IVF
    * side joins on the bucket key like [[ivfTopK]]. */
  def ivfRecallCalibration(embeddings: DataFrame, idCol: String,
                           embCol: String, queryPredicate: Column,
                           centroids: DataFrame, k: Int,
                           maxNprobe: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxNprobe >= 1, s"maxNprobe must be >= 1, got $maxNprobe")
    graft.GraftExtensions.register(embeddings.sparkSession)
    val exact = cosineTopK(embeddings, idCol, embCol, queryPredicate, k)
      .select(col("q_id"), col("n_id"))
    val exactCount = exact.agg(count(lit(1)).as("n_exact"))
    val assigned = ivfAssign(embeddings, idCol, embCol, centroids)
    val corpus = embeddings
      .select(col(idCol).as("n_id"), col(embCol).as("__n_emb"))
      .join(assigned.select(col(idCol).as("n_id"), col("centroid_id")),
        "n_id")
    val queries = embeddings.filter(queryPredicate)
      .select(col(idCol).as("q_id"), col(embCol).as("__q_emb"))
    val qc = queries.crossJoin(broadcast(centroids))
      .withColumn("cos",
        call_function("vec_cosine", col("__q_emb"), col("centroid_emb")))
      .withColumn("__probe_rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("__probe_rank") <= maxNprobe)
      .select(col("q_id"), col("__q_emb"), col("centroid_id"),
        col("__probe_rank"))
    val cand = qc.join(corpus, Seq("centroid_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine",
        call_function("vec_cosine", col("__q_emb"), col("__n_emb")))
      .select(col("q_id"), col("n_id"), col("cosine"), col("__probe_rank"))
    val perProbe = cand
      .withColumn("nprobe",
        explode(sequence(col("__probe_rank").cast("int"), lit(maxNprobe))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"), col("nprobe"))
          .orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= k)
    val hits = perProbe.join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hit"))
    val spine = embeddings.sparkSession.range(1, maxNprobe + 1)
      .select(col("id").cast("int").as("nprobe"))
    spine.join(hits, Seq("nprobe"), "left")
      .na.fill(0L, Seq("n_hit"))
      .crossJoin(broadcast(exactCount))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
      .select(col("nprobe"), col("n_exact"), col("n_hit"), col("recall"))
  }

  /** Deterministic pseudo-random hyperplanes: component (p, i) is derived
    * from an md5 nibble, shifted to be zero-centered (value − 7.5). Public
    * md5 arithmetic only, so any engine can reproduce the planes. */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Array[Double]] = {
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val block = md5hex(s"plane$p:${i / 32}")
        val nib = Integer.parseInt(block.charAt(i % 32).toString, 16)
        nib - 7.5
      }.toArray
    }
  }

  /** Sign-of-projection LSH bucket (b bits for b planes). */
  def lshBucket(emb: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, j) =>
      val proj = w.zipWithIndex
        .map { case (wi, i) => element_at(emb, i + 1).cast("double") * lit(wi) }
        .reduce(_ + _)
      when(proj >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucketed corpus: each vector tagged with its LSH bucket and the bucket
    * population (candidate-set size a query in that bucket would scan). */
  // ---- int8 scalar quantization: the memory/IO scale path ---------------

  /** Per-vector symmetric int8 quantization: q_i = floor(x_i * 127 /
    * max|x|). An embedding column stored int8 is 4× smaller than float32 —
    * at 100 TB that is the difference between a corpus that fits the
    * cluster's NVMe cache and one that doesn't — and integer dot products
    * are exact, so scoring is bit-reproducible across engines (unlike float
    * sums, whose order matters). `floor` (not round) because float→int
    * rounding modes differ across engines; truncation toward -∞ is
    * universal. Zero vectors yield a NULL quantized column (no scale
    * exists); callers filter or coalesce. */
  def quantizeInt8(emb: Column): Column = {
    val mx = array_max(transform(emb, x => abs(x.cast("double"))))
    when(mx > 0.0,
      transform(emb, x =>
        floor(x.cast("double") * (lit(127.0) / mx)).cast("long")))
      .otherwise(lit(null).cast("array<bigint>"))
  }

  /** Exact top-k under QUANTIZED cosine: same shape as [[cosineTopK]]
    * (broadcast query side, corpus scanned once, partial top-k before the
    * exchange) but scoring int8 codes. The integer dot/norm sums are exact,
    * so the only float ops are one sqrt-product-divide per pair — the
    * differential oracle reproduces them bit-for-bit. Quality vs the float
    * ranking is bounded in QuantizedSimilaritySpec (recall@k). */
  def quantizedCosineTopK(embeddings: DataFrame, idCol: String,
                          embCol: String, queryPredicate: Column,
                          k: Int): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val quantized = embeddings
      .select(col(idCol), quantizeInt8(col(embCol)).as("__q8"))
      .filter(col("__q8").isNotNull)
    // exact integer dot, codegen'd (graft.expressions.QuantizedDot) — the
    // n×queries scoring loop must not run interpreted HOF lambdas
    def idot(a: Column, b: Column): Column = call_function("q8_dot", a, b)
    // norms once per VECTOR (before the pair join), not once per pair
    val q = requireBroadcastable(
      quantized.filter(queryPredicate)
        .select(col(idCol).as("q_id"), col("__q8").as("__qa"),
          idot(col("__q8"), col("__q8")).as("__na")),
      "quantizedCosineTopK query side (queryPredicate)",
      "Narrow the predicate, or use ivfTopK / lshBucketed candidates for " +
        "large query sets.")
    val cand = quantized
      .select(col(idCol).as("n_id"), col("__q8").as("__qb"),
        idot(col("__q8"), col("__q8")).as("__nb"))
    val scored = cand.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("q_cosine",
        idot(col("__qa"), col("__qb")).cast("double") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("q_cosine").desc, col("n_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("q_cosine"), col("rank"))
  }

  def lshBucketed(embeddings: DataFrame, idCol: String, embCol: String,
                  numPlanes: Int, dim: Int): DataFrame = {
    val bucket = lshBucket(col(embCol), hyperplanes(numPlanes, dim))
    embeddings.select(col(idCol), bucket.as("bucket"))
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("bucket"))))
  }

  /** Semantic (embedding-space) deduplication: rows whose vectors are
    * within `threshold` cosine of each other collapse to one survivor per
    * connected near-dup cluster — the SemDeDup-style "drop semantic
    * copies" operation, as one call. Pairs come from
    * [[cosineNearDupPairs]]; cluster resolution and keeper choice are
    * [[Corpus.resolveDuplicates]] (keeper = max `prefer`, ties → min id;
    * min id when `prefer` is None). Emits surviving rows with
    * `cluster_id` and `cluster_size`.
    *
    * Scale: pass `candidates` (LSH bands from [[lshBucketed]] or IVF
    * buckets) — pair scoring is then a bucket join, and component
    * resolution runs over pairs only, never the corpus. Without
    * `candidates` the exact all-pairs path applies, verification-scale
    * only and guarded by the broadcast cap. */
  def semanticDedup(embeddings: DataFrame, idCol: String, embCol: String,
                    threshold: Double,
                    candidates: Option[DataFrame] = None,
                    prefer: Option[Column] = None): DataFrame = {
    val pairs = cosineNearDupPairs(embeddings, idCol, embCol, threshold,
      candidates)
    Corpus.resolveDuplicates(embeddings, idCol,
      pairs.select(col("a_id"), col("b_id")), "a_id", "b_id", prefer)
  }

  /** Semantic decontamination: flag corpus documents whose EMBEDDING is
    * within `threshold` cosine of any eval-set document — the leakage
    * n-gram decontamination ([[Corpus.decontaminate]]) cannot see
    * (paraphrases, translations, templated rewrites share no shingles
    * but land next to the eval item in embedding space). Emits one row
    * per contaminated corpus doc: (corpus_id, eval_id of the closest
    * match at rank 1 under (cosine DESC, eval_id), cosine).
    *
    * Scale: the eval set is the SMALL side by nature (benchmarks are
    * thousands of items, the corpus is billions) — it broadcasts under
    * the fail-fast cap and the corpus is scanned exactly once, making
    * the default path linear in corpus size at any scale. For an eval
    * side beyond the cap, pass `candidates` (corpus_id, eval_id) pairs
    * from LSH/IVF bucketing ([[lshBucketed]]) and only those pairs are
    * scored — the same contract as [[cosineNearDupPairs]]. */
  def semanticDecontaminate(corpus: DataFrame, corpusId: String,
                            corpusEmb: String,
                            evalSet: DataFrame, evalId: String,
                            evalEmb: String,
                            threshold: Double,
                            candidates: Option[DataFrame] = None): DataFrame = {
    graft.GraftExtensions.register(corpus.sparkSession)
    val c = corpus.select(col(corpusId).as("corpus_id"),
      col(corpusEmb).as("__c_emb"))
    val e = evalSet.select(col(evalId).as("eval_id"),
      col(evalEmb).as("__e_emb"))
    val paired = candidates match {
      case Some(cand) =>
        cand.select(col("corpus_id"), col("eval_id"))
          .join(c, Seq("corpus_id")).join(e, Seq("eval_id"))
      case None =>
        c.crossJoin(broadcast(requireBroadcastable(e,
          "semanticDecontaminate eval side",
          "Pass candidates = LSH/IVF bucket pairs for an eval set this " +
            "large.")))
    }
    paired
      .withColumn("cosine",
        call_function("vec_cosine", col("__c_emb"), col("__e_emb")))
      .filter(col("cosine") >= threshold)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("corpus_id"))
          .orderBy(col("cosine").desc, col("eval_id"))))
      .filter(col("rank") === 1)
      .select(col("corpus_id"), col("eval_id"), col("cosine"))
  }

  // ---- k-means (Lloyd) centroid training, cross-engine exact ------------

  /** Strict left-fold double dot product of an int8-code array against a
    * double centroid array — the only float summation in the k-means
    * loop, and it folds in array order so any engine reproduces it.
    * Codegen'd (graft.expressions.QuantizedDot): the HOF formulation it
    * replaces ran interpreted per element on the n×k assignment path. */
  private def qcDot(q8: Column, cen: Column): Column =
    call_function("q8_dot", q8, cen)

  /** sqrt of the exact integer self-dot of an int8 code array. */
  private def qNorm(q8: Column): Column =
    sqrt(aggregate(transform(q8, x => x * x), lit(0L), (acc, v) => acc + v)
      .cast("double"))

  /** Lloyd k-means over int8-QUANTIZED embeddings, engine-exact — the
    * trained-centroid refinement [[ivfCentroids]]'s docstring deliberately
    * skips for raw floats. Quantizing first makes every per-cluster
    * centroid component an exact rational (a BIGINT sum over member codes
    * divided by the member count: one correctly-rounded division), and
    * assignment scores are strict in-order folds — so the full train →
    * assign loop is bit-reproducible across engines and restarts, and a
    * DuckDB oracle replays it iteration by iteration (q104).
    *
    * Seeds: the k smallest-md5(id) codes (the [[ivfCentroids]] draw).
    * Each round assigns every vector to its max-cosine centroid
    * (tie-break: lowest centroid id) and recomputes centroids as
    * element-wise member means; a cluster that loses all members keeps
    * its previous centroid. Returns the final assignment
    * (id, cluster_id, cluster_cos) against the trained centroids.
    *
    * Scale: per round, the CACHED int8 codes are scanned once with the k
    * centroids compiled INTO THE PROJECTION as literals — assignment is
    * `array_max` over k scored structs, a pure scalar expression: no
    * cross join, no per-id window, ZERO shuffle (the previous
    * crossJoin + row_number formulation shuffled codes × k rows per
    * round). The update is a two-phase (cluster, dim) aggregate: shuffle
    * volume is O(k × dim), not O(corpus). Each round runs as an eager
    * action that collects only the k×dim centroid table (a few KB — data
    * never reaches the driver), so the training run is exactly `iters`
    * cached scans plus one raw scan to build the cache and one for the
    * final assignment after the cache is released. k is dozens-to-
    * thousands (the IVF regime): k×dim literals stay well under codegen
    * limits at dim ≲ 100, and the struct-max compare is k-1 double
    * compares per row. */
  def kmeansAssignQuantized(embeddings: DataFrame, idCol: String,
                            embCol: String, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    graft.GraftExtensions.register(embeddings.sparkSession)
    // every Lloyd iteration (and the seed draw, and the final assign)
    // re-reads the quantized codes: materialize them ONCE — the int8
    // codes are 4× smaller than the float input, so the cache is cheap
    // and saves (iters + 2) re-quantization scans
    val codes = embeddings
      .select(col(idCol), quantizeInt8(col(embCol)).as("__q8"))
      .filter(col("__q8").isNotNull)
      .withColumn("__qn", qNorm(col("__q8")))
      .cache()
    // seed draw: k smallest md5(id), centroid_id = 0..k-1 in draw order
    val spark = embeddings.sparkSession
    import spark.implicits._
    val seedCens: Seq[(Int, Seq[Double])] = codes
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .withColumn("cluster_id", (row_number().over(
        Window.orderBy(col("__h"), col(idCol))) - 1).cast("int"))
      .select(col("cluster_id"),
        transform(col("__q8"), x => x.cast("double")).as("__cen"))
      .as[(Int, Seq[Double])].collect().toSeq
    // centroids live on the DRIVER (k×dim doubles — the hyperplane-
    // literal pattern, not a data collect) and are compiled into the
    // assignment projection each round. Numerics are unchanged from the
    // crossJoin formulation: the same in-order double self-dot for the
    // centroid norm (now folded on the driver), the same q8_dot score
    // fold, the same single division — and the struct-max tie-break
    // (cos, then LOWEST cluster_id) reproduces the old
    // `row_number over (order by cos desc, cluster_id)` pick exactly.
    def assign(cens: Seq[(Int, Seq[Double])]): DataFrame = {
      val scored = cens.map { case (cid, cen) =>
        var acc = 0.0
        cen.foreach(y => acc += y * y)
        val cn = math.sqrt(acc)
        struct(
          (qcDot(col("__q8"), typedLit(cen)) / (col("__qn") * lit(cn)))
            .as("cos"),
          lit(-cid).as("ncid"))
      }
      codes.withColumn("__best", array_max(array(scored: _*)))
        .withColumn("cluster_id", (-col("__best.ncid")).cast("int"))
        .withColumn("cluster_cos", col("__best.cos"))
        .drop("__best")
    }
    // each Lloyd iteration COLLECTS the k×dim centroid table: per-
    // iteration actions run against the cached codes, and the cache can
    // be RELEASED before returning (the one final re-scan is bounded; an
    // unreleased cache would pin a copy of the corpus per call for the
    // session lifetime). The mean is the same long-sum / count division,
    // performed on the driver.
    val trained = (0 until iters).foldLeft(seedCens) { (cens, _) =>
      val sums = assign(cens)
        .select(col("cluster_id"), posexplode(col("__q8")).as(Seq("__d", "__v")))
        .groupBy(col("cluster_id"), col("__d"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
        .as[(Int, Int, Long, Long)].collect()
      val means = sums.groupBy(_._1).map { case (cid, rows) =>
        cid -> rows.sortBy(_._2).map(r => r._3.toDouble / r._4).toSeq
      }
      // a cluster that lost every member keeps its previous centroid
      cens.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    val result = assign(trained)
      .select(col(idCol), col("cluster_id"), col("cluster_cos"))
    codes.unpersist(blocking = false)
    result
  }

  /** Pairwise cosine similarity between PER-LABEL CENTROIDS of an
    * embedding column, in exact scaled-integer arithmetic — "how close
    * are the class prototypes" for stratified-corpus audits (two labels
    * whose centroids are near-parallel are candidates for merging or for
    * leakage checks).
    *
    * Exactness contract: each component is quantized q = floor(x ·
    * qScale) (float→double is exact, qScale is a power of two so the
    * product is exact, floor is exact), the centroid is kept as the
    * integer component-SUM (never divided — cosine is invariant to the
    * 1/n scaling), and dot/norms are exact Long sums. The only floating
    * ops are the final int64→double conversions, sqrt, multiply, divide
    * — each IEEE-correctly-rounded, hence bit-identical across engines.
    *
    * Bounds: |q| ≤ qScale for unit-normalized inputs, so a component sum
    * over n vectors is ≤ n·qScale and dot/norm terms are ≤ dim·(n·
    * qScale)²; with the default qScale 1024 that stays inside Long up to
    * ~1.4 M vectors per label at dim 64 — past that, lower qScale (the
    * doc-level knob) or widen to decimal.
    *
    * Scale posture: one posexplode + map-side-combined sum shuffled by
    * (label, pos) — the only pass over the data; everything after runs
    * on labels×dim rows (tiny, broadcast-joined). */
  def labelCentroidCosine(embeddings: DataFrame, idCol: String,
                          embCol: String, labelCol: String,
                          qScale: Int = 1024): DataFrame = {
    require(qScale > 0 && (qScale & (qScale - 1)) == 0,
      s"qScale must be a positive power of two, got $qScale")
    val comp = embeddings
      .filter(col(labelCol).isNotNull && col(embCol).isNotNull)
      .select(col(labelCol).as("label"),
        posexplode(col(embCol)).as(Seq("pos", "x")))
      .withColumn("q",
        floor(col("x").cast("double") * lit(qScale.toDouble)).cast("long"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("c"))
    val norms = comp.groupBy(col("label"))
      .agg(sum(col("c") * col("c")).as("nn"))
    val a = comp.select(col("label").as("label_a"), col("pos"),
      col("c").as("ca"))
    val b = comp.select(col("label").as("label_b"), col("pos"),
      col("c").as("cb"))
    val dots = a.join(b, Seq("pos"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
    dots
      .join(norms.select(col("label").as("label_a"), col("nn").as("__na")),
        Seq("label_a"))
      .join(norms.select(col("label").as("label_b"), col("nn").as("__nb")),
        Seq("label_b"))
      .withColumn("cos",
        when(col("__na") === 0L || col("__nb") === 0L, lit(null))
          .otherwise(col("dot").cast("double") /
            (sqrt(col("__na").cast("double")) *
              sqrt(col("__nb").cast("double")))))
      .select(col("label_a"), col("label_b"), col("dot"), col("cos"))
  }

  /** Per-vector cosine to its OWN label centroid, with a low-similarity
    * outlier flag — the mislabel/noise detector for a labeled embedding
    * corpus. Same exactness contract as [[labelCentroidCosine]]: the
    * centroid is the scaled-integer component sum (the vector itself
    * included — a leave-one-out centroid would need per-vector
    * subtraction; at corpus sizes the self-term is negligible and the
    * flag threshold absorbs it), dots and norms are exact Long sums,
    * and only the final sqrt/divide run in floating point. A vector or
    * centroid with zero norm gets a NULL cosine and is flagged.
    *
    * Scale posture: one posexplode pass feeds BOTH the centroid sums
    * (map-side combine on label×dim) and the per-vector join — the join
    * side is broadcast (labels×dim rows), so the corpus never
    * re-shuffles; the per-vector aggregation combines map-side on the
    * id. */
  def embeddingOutliers(embeddings: DataFrame, idCol: String,
                        embCol: String, labelCol: String,
                        qScale: Int = 1024,
                        cosThreshold: Double = 0.5): DataFrame = {
    require(qScale > 0 && (qScale & (qScale - 1)) == 0,
      s"qScale must be a positive power of two, got $qScale")
    val quant = embeddings
      .filter(col(labelCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).as("__id"), col(labelCol).as("label"),
        posexplode(col(embCol)).as(Seq("pos", "x")))
      .withColumn("q",
        floor(col("x").cast("double") * lit(qScale.toDouble)).cast("long"))
    val comp = quant.groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("c"))
    val cnorm = comp.groupBy(col("label"))
      .agg(sum(col("c") * col("c")).as("cn"))
    quant
      .join(broadcast(comp), Seq("label", "pos"))
      .groupBy(col("__id"), col("label"))
      .agg(sum(col("q") * col("c")).as("dot"),
        sum(col("q") * col("q")).as("vn"))
      .join(broadcast(cnorm), Seq("label"))
      .withColumn("cos",
        when(col("vn") === 0L || col("cn") === 0L, lit(null))
          .otherwise(col("dot").cast("double") /
            (sqrt(col("vn").cast("double")) *
              sqrt(col("cn").cast("double")))))
      .withColumn("is_outlier",
        coalesce(col("cos") < lit(cosThreshold), lit(true)))
      .select(col("__id").as(idCol), col("label"), col("dot"), col("cos"),
        col("is_outlier"))
  }

  /** Exact upper-triangle covariance matrix of the quantized embedding
    * components — the foundation for PCA / feature-drift / whitening
    * over an embedding corpus. Per pair (i <= j):
    * cov = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / n², with every sum an exact BIGINT and
    * the division the single IEEE op — bit-identical across engines.
    *
    * Scale: the cross-product expansion is SCALAR-side (one flattened
    * d(d+1)/2 struct array per row — no self-join), and the explode
    * feeds a hash aggregate with d(d+1)/2 distinct keys, so map-side
    * partial aggregation reduces each task's output to one matrix
    * regardless of row count. Component sums ride a d-row frame;
    * both small frames broadcast onto the pair aggregate.
    * Contract: |q| <= qScale and n·(qScale²·n) must stay in Int64 —
    * beyond ~10⁹ rows at qScale=1024 move the sums to DECIMAL(38,0). */
  def quantizedCovariance(embeddings: DataFrame, idCol: String,
                          embCol: String, qScale: Int = 1024): DataFrame = {
    require(qScale > 0 && (qScale & (qScale - 1)) == 0,
      s"qScale must be a positive power of two, got $qScale")
    // null ELEMENTS quantize to 0: for integer sums, excluding a null
    // term and adding 0 are the same value, so this matches the prior
    // explode formulation's null-skipping sums bit for bit — while the
    // Dataset[Array[Long]] encoder below would otherwise abort the job
    // on the first null element
    val base = embeddings.filter(col(embCol).isNotNull)
      .select(col(idCol).as("__id"),
        transform(col(embCol), x =>
          coalesce(floor(x.cast("double") * lit(qScale.toDouble))
            .cast("long"), lit(0L)))
          .as("__q"))
    // Per-partition Gram accumulation (mapPartitions is justified here:
    // the declarative form explodes d(d+1)/2 struct rows PER VECTOR
    // through interpreted HOF lambdas — 2,080 rows/vector at d=64 —
    // while this pass ships d(d+1)/2 + d + 1 longs PER PARTITION to the
    // shuffle: sketch-sized, not data-sized, the shape that holds at
    // 100 TB). Integer sums are order-independent, so the values are
    // bit-identical to the explode formulation and the oracle replay.
    val sess = embeddings.sparkSession
    import sess.implicits._
    val partial = base.select(col("__q")).as[Array[Long]]
      .mapPartitions { it =>
        var d = -1
        var tri: Array[Long] = null
        var s: Array[Long] = null
        var cnt = 0L
        while (it.hasNext) {
          val q = it.next()
          if (d < 0) { d = q.length; tri = new Array(d * d); s = new Array(d) }
          require(q.length == d,
            s"quantizedCovariance: ragged embedding (dim ${q.length} vs $d)")
          cnt += 1L
          var i = 0
          while (i < d) {
            s(i) += q(i)
            var j = i
            while (j < d) { tri(i * d + j) += q(i) * q(j); j += 1 }
            i += 1
          }
        }
        if (cnt == 0L) Iterator.empty
        else {
          val out = Iterator.tabulate(d * (d + 1) / 2) { k =>
            // unrank k -> (i, j) over the upper triangle
            var i = 0
            var rem = k
            while (rem >= d - i) { rem -= d - i; i += 1 }
            val j = i + rem
            (i, j, tri(i * d + j))
          }
          out ++ Iterator.tabulate(d)(i => (i, -1, s(i))) ++
            Iterator.single((-1, -1, cnt))
        }
      }.toDF("i", "j", "v")
    val n = partial.filter(col("i") === -1)
      .agg(coalesce(sum(col("v")), lit(0L)).as("n"))
    val sums = partial.filter(col("j") === -1 && col("i") >= 0)
      .groupBy(col("i").as("pos")).agg(sum(col("v")).as("s"))
    val pairs = partial.filter(col("j") >= 0)
      .groupBy(col("i"), col("j")).agg(sum(col("v")).as("s_ij"))
    pairs
      .join(broadcast(sums.select(col("pos").as("i"), col("s").as("s_i"))),
        Seq("i"))
      .join(broadcast(sums.select(col("pos").as("j"), col("s").as("s_j"))),
        Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), col("n"), col("s_i"), col("s_j"),
        col("s_ij"),
        ((col("n") * col("s_ij") - col("s_i") * col("s_j")).cast("double") /
          (col("n") * col("n")).cast("double")).as("cov"))
  }

  /** Multi-probe LSH candidate pairs: vectors whose hyperplane buckets
    * differ in AT MOST ONE bit. Single-bucket LSH (q38) misses every
    * near-neighbor pair that straddles one hyperplane; the standard
    * fixes are more tables (× storage) or multi-probe — also querying
    * the buckets one bit-flip away. One flip costs `numPlanes` extra
    * probe rows per vector but no extra tables.
    *
    * Emits (a_id, b_id, bucket_a, bucket_b, probe_dist) with
    * probe_dist = popcount(bucket_a ⊕ bucket_b) ∈ {0, 1}; each
    * qualifying pair appears exactly once (a given ⊕ matches exactly
    * one probe).
    *
    * Scale: the probe explode is ×(numPlanes+1) on the id+bucket
    * projection only (ints, not embeddings); the join is an equi-join
    * on bucket keys. Candidate volume is Σ over bucket-pairs at
    * Hamming ≤ 1 of |A|·|B| — the multi-probe tradeoff, still never
    * all-pairs. */
  def multiProbeCandidates(embeddings: DataFrame, idCol: String,
                           embCol: String, numPlanes: Int,
                           dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val b = embeddings.filter(col(embCol).isNotNull)
      .select(col(idCol).as("a_id"),
        lshBucket(col(embCol), planes).as("bucket_a"))
    val probes = b.select(col("a_id"), col("bucket_a"),
      explode(array(col("bucket_a") +: (0 until numPlanes).map(j =>
        col("bucket_a").bitwiseXOR(lit(1 << j))): _*)).as("__probe"))
    probes.join(b.select(col("a_id").as("b_id"),
        col("bucket_a").as("bucket_b")),
        col("__probe") === col("bucket_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("bucket_a"), col("bucket_b"),
        bit_count(col("bucket_a").bitwiseXOR(col("bucket_b")))
          .cast("int").as("probe_dist"))
  }

  /** Coreset / distillation representatives: the `k` most central
    * members of every IVF cell (highest cosine to the cell centroid,
    * ties → min id), with the cell population. The "label a budgeted
    * subset" and "summarize the corpus" selection — k · |cells| rows
    * stand in for the whole corpus.
    *
    * Scale: rides [[ivfAssign]] (broadcast centroid frame, corpus
    * scanned once); the per-cell top-k is a rank-limited window
    * (WindowGroupLimit prunes before the exchange). */
  def clusterRepresentatives(embeddings: DataFrame, idCol: String,
                             embCol: String, centroids: DataFrame,
                             k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val assigned = ivfAssign(embeddings, idCol, embCol, centroids)
    val w = Window.partitionBy(col("centroid_id"))
    assigned
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("rep_rank", row_number().over(
        w.orderBy(col("centroid_cos").desc, col(idCol).asc)).cast("int"))
      .filter(col("rep_rank") <= k)
      .select(col("centroid_id"), col("rep_rank"), col(idCol),
        col("centroid_cos"), col("n_members"))
  }

  /** Contrastive hard-negative mining: per anchor, the `k` OTHER-label
    * vectors with the highest quantized cosine — the semi-hard negatives
    * a contrastive/embedding-training loop pairs with each anchor
    * (random negatives are too easy; same-label top matches are
    * positives). Same shape, int8 quantization, and broadcast-guarded
    * query side as [[quantizedCosineTopK]]; rows with NULL labels are
    * excluded from both sides. */
  def hardNegatives(embeddings: DataFrame, idCol: String, embCol: String,
                    labelCol: String, queryPredicate: Column,
                    k: Int): DataFrame = {
    graft.GraftExtensions.register(embeddings.sparkSession)
    val quantized = embeddings
      .filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).as("__lbl"),
        quantizeInt8(col(embCol)).as("__q8"))
      .filter(col("__q8").isNotNull)
    def idot(a: Column, b: Column): Column = call_function("q8_dot", a, b)
    val q = requireBroadcastable(
      quantized.filter(queryPredicate)
        .select(col(idCol).as("q_id"), col("__lbl").as("q_label"),
          col("__q8").as("__qa"), idot(col("__q8"), col("__q8")).as("__na")),
      "hardNegatives query side (queryPredicate)",
      "Narrow the predicate, or mine negatives inside LSH/IVF buckets " +
        "for large anchor sets.")
    val cand = quantized
      .select(col(idCol).as("n_id"), col("__lbl").as("n_label"),
        col("__q8").as("__qb"), idot(col("__q8"), col("__q8")).as("__nb"))
    cand.crossJoin(broadcast(q))
      .filter(col("n_label") =!= col("q_label"))
      .withColumn("q_cosine",
        idot(col("__qa"), col("__qb")).cast("double") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("q_cosine").desc, col("n_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
        col("q_cosine"), col("rank"))
  }

  // ---- Product quantization (PQ): subspace codebooks + ADC search -------

  /** Deterministic PQ codebook: the `k` corpus vectors with the smallest
    * md5(id) (the [[ivfCentroids]] draw), carrying dense codes 0..k−1 in
    * that order. One table serves every subspace — subspace `m` uses the
    * code vector's m-th slice. (A production PQ refines per-subspace
    * codebooks with Lloyd iterations; data-drawn codewords keep the
    * construction engine-portable, same rationale as ivfCentroids.) */
  def pqCodebook(embeddings: DataFrame, idCol: String, embCol: String,
                 k: Int): DataFrame = {
    val drawn = embeddings
      .filter(col(embCol).isNotNull)
      .select(col(idCol).as("__cid"), col(embCol).as("code_emb"),
        md5(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h"), col("__cid"))
      .limit(k)
    // k-row frame: the numbering window is trivially single-task
    drawn
      .withColumn("code",
        (row_number().over(Window.orderBy(col("__h"), col("__cid"))) - 1)
          .cast("int"))
      .select(col("code"), col("code_emb"))
  }

  /** Squared L2 distance between subspace `m` (0-based) of two vectors:
    * a strict left-fold double sum over the m-th `subDim`-wide slice —
    * bit-reproducible across engines (the [[dot]] discipline). */
  private def subDist(a: Column, b: Column, m: Column,
                      subDim: Int): Column = {
    val sa = slice(a, m * subDim + 1, lit(subDim))
    val sb = slice(b, m * subDim + 1, lit(subDim))
    aggregate(
      zip_with(sa, sb, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)
  }

  /** PQ code assignment: for every vector and every subspace, the code
    * of the codebook entry whose slice is L2-nearest (ties → smallest
    * code). Emits (idCol, subspace, code, dist) — the M-byte-per-vector
    * compressed representation ADC search then scans instead of the
    * full float vectors (a dim·4/M storage cut; 64× at dim 64, M 4).
    *
    * Scale: codebook is broadcast (k rows); the argmin is a map-side-
    * combinable min(struct) groupBy, so the shuffle carries one narrow
    * row per (vector, subspace) — never the k-way candidate fanout and
    * never the embedding payload. */
  def pqAssign(embeddings: DataFrame, idCol: String, embCol: String,
               codebook: DataFrame, embDim: Int,
               numSubspaces: Int): DataFrame = {
    require(numSubspaces >= 1 && embDim % numSubspaces == 0,
      s"numSubspaces must divide embDim, got $embDim / $numSubspaces")
    val subDim = embDim / numSubspaces
    embeddings
      .filter(col(embCol).isNotNull)
      .select(col(idCol), col(embCol))
      .crossJoin(broadcast(codebook))
      .withColumn("subspace",
        explode(array((0 until numSubspaces).map(lit): _*)))
      .withColumn("__cand",
        struct(subDist(col(embCol), col("code_emb"), col("subspace"), subDim)
          .as("dist"), col("code")))
      .groupBy(col(idCol), col("subspace"))
      .agg(min(col("__cand")).as("__best"))
      .select(col(idCol), col("subspace"),
        col("__best.code").as("code"), col("__best.dist").as("dist"))
  }

  /** PQ asymmetric-distance (ADC) top-k: the query keeps full precision,
    * the corpus is its PQ codes; the approximate distance is the sum of
    * per-subspace query→codeword distances looked up from a tiny
    * (queries × k × M) table. The per-subspace partials are re-widened
    * into fixed columns before the final sum so the M-term addition has
    * ONE order on every engine.
    *
    * Scale: the corpus-sized work is the [[pqAssign]] pass plus a
    * broadcast-joined groupBy on narrow (query, neighbor) rows; the
    * ranking window prunes to k per query before the exchange
    * (WindowGroupLimit). Query side is broadcast-guarded. */
  def pqAdcTopK(embeddings: DataFrame, idCol: String, embCol: String,
                codebook: DataFrame, embDim: Int, numSubspaces: Int,
                queryPredicate: Column, k: Int): DataFrame = {
    val subDim = embDim / numSubspaces
    val q = requireBroadcastable(
      embeddings.filter(queryPredicate)
        .filter(col(embCol).isNotNull)
        .select(col(idCol).as("q_id"), col(embCol).as("__q_emb")),
      "pqAdcTopK query side (queryPredicate)",
      "Narrow the predicate; PQ-ADC serves small query sets against a " +
        "compressed corpus.")
    val adc = q.crossJoin(broadcast(codebook))
      .withColumn("subspace",
        explode(array((0 until numSubspaces).map(lit): _*)))
      .select(col("q_id"), col("subspace"), col("code"),
        subDist(col("__q_emb"), col("code_emb"), col("subspace"), subDim)
          .as("__qdist"))
    val assigned = pqAssign(embeddings, idCol, embCol, codebook, embDim,
      numSubspaces)
      .select(col(idCol).as("n_id"), col("subspace"), col("code"))
    val aggs = (0 until numSubspaces).map(m =>
      sum(when(col("subspace") === m, col("__qdist"))).as(s"__d$m"))
    val wide = assigned
      .join(broadcast(adc), Seq("subspace", "code"))
      .filter(col("n_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(aggs.head, aggs.tail: _*)
    val approx = (0 until numSubspaces).map(m => col(s"__d$m"))
      .reduceLeft(_ + _)
    wide
      .withColumn("approx_dist", approx)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("approx_dist").asc, col("n_id"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("approx_dist"), col("rank"))
  }
}
