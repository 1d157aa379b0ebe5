package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ranked keyword retrieval over a document corpus (SURVEY §7.7 extension:
  * the query side of a training-data / RAG pipeline).
  *
  * Scoring is BM25-shaped but with the RATIONAL idf `(N - df + 0.5) /
  * (df + 0.5)` instead of its logarithm: ln() is the one transcendental
  * whose last-bit rounding is not guaranteed identical across engines, and
  * the ranking it induces is unchanged for a fixed query (log is
  * monotone). Every other term is IEEE +,*,/ in a FIXED fold order over
  * the literal query-term list, so scores are bit-identical across
  * engines and the differential oracle can hash-compare them.
  *
  * Scale posture: the per-term term frequencies are computed SCALAR-side
  * (`size(filter(tokens, _ == term))` — codegen'd, no explode), so the
  * corpus is scanned exactly ONCE with no shuffle of document data. The
  * only aggregations are a single 1-row global-stats reduction (N, avgdl,
  * per-term df) that is broadcast back, and the final top-k, which Spark
  * plans as TakeOrderedAndProject — per-partition partial top-k, then a
  * k-row merge on the driver. Nothing grows with corpus size except the
  * one scan.
  */
object Retrieval {

  /** BM25 (rational-idf) top-k: score every document against the fixed
    * `terms` list and keep the `topK` best, ranked with a deterministic
    * (score desc, doc_id) tie-break. Emits
    * (doc_id, dl, score, rank) — dl is the document token count. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], topK: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "query term list must be non-empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = TextFunctions.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).as(s"__tf_$i")
    }
    // token-less docs (NULL or whitespace-only text) can never score and
    // must not dilute n_docs/avgdl/df — and an all-empty corpus would
    // otherwise reach the b*dl/avgdl division with avgdl = 0 (ANSI abort)
    val base = docs
      .select((col(idCol).as("doc_id") +: size(toks).as("dl") +: tfCols): _*)
      .filter(col("dl") > 0)
    // one 1-row global-stats aggregate, broadcast back onto every doc row
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i"))
    val stats = base.agg(count(lit(1)).as("__n_docs"),
      ((sum(col("dl")).cast("double") / count(lit(1))).as("__avgdl") +:
        dfCols): _*)
    val scored = base.crossJoin(broadcast(stats))
    // in-order fold over the literal term list: term 0 first, then 1, ...
    val score = terms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val idf = (col("__n_docs") - col(s"__df_$i") + lit(0.5)) /
        (col(s"__df_$i") + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl")))
    }.reduceLeft(_ + _)
    scored
      .select(col("doc_id"), col("dl"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("int"))
  }

  /** Inverted-index build: per term (length >= `minTermLen`), document
    * frequency, total term frequency, and an order-pinned fingerprint
    * of the postings list (doc_id:tf:first_pos triples sorted by
    * doc_id, md5'd) — the serving-index artifact behind [[bm25TopK]].
    * The fingerprint stands in for the raw nested postings column
    * because engines stringify arrays differently (the q166
    * nested-export convention); it pins BOTH membership and order.
    *
    * Scale: one tokenize+posexplode pass; tf/first_pos is a
    * (doc, term) map-combined aggregate; the per-term fold is a
    * groupBy whose skew ceiling is the stop-word df — cap with
    * `minTermLen` (and the caller's stopword policy), exactly like the
    * q57/q68 df discipline. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minTermLen: Int = 4): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .filter(length(col("term")) >= minTermLen)
    val perDoc = toks.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), min(col("pos")).as("first_pos"))
    perDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("tf"),
            col("first_pos")))),
          e => concat_ws(":", e.getField("doc_id"), e.getField("tf"),
            e.getField("first_pos"))), "|")).as("postings_fp"))
  }

  /** PMI collocations: the top-`k` adjacent word bigrams by pointwise
    * mutual information, emitted as the RAW ratio
    * N·c(ab) / (c(a)·c(b)) — BM25's q57 idf convention: ln() is left
    * to the caller because the ratio of exact BIGINTs under one IEEE
    * division is bit-identical across engines and the log is
    * monotone, so the ranking is unchanged. `minPair` is the classic
    * PMI low-frequency guard (a hapax pair scores absurdly high).
    *
    * Scale: one tokenize pass for unigrams + one scalar shingle pass
    * for bigrams, both map-combined; the top-k is a TakeOrdered, never
    * a global sort. */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minTermLen: Int = 3, minPair: Long = 5,
                      k: Int = 100): DataFrame = {
    val toksCol = TextFunctions.tokens(col(textCol))
    val uni = docs.select(explode(toksCol).as("w"))
      .filter(length(col("w")) >= minTermLen)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val allPairs = docs
      .select(explode(TextFunctions.wordShingles(toksCol, 2)).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .filter(length(col("w1")) >= minTermLen &&
        length(col("w2")) >= minTermLen)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_pair"))
    // N = ALL qualifying bigram events (counted before the frequency
    // guard — the guard prunes candidates, not the event space)
    val n = allPairs.agg(sum(col("c_pair")).as("__n"))
    val pairs = allPairs.filter(col("c_pair") >= minPair)
    val scored = pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_w2")), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c_pair"), col("c_w1"),
        col("c_w2"),
        ((col("__n") * col("c_pair")).cast("double") /
          (col("c_w1") * col("c_w2")).cast("double")).as("pmi_ratio"))
    scored.orderBy(col("pmi_ratio").desc, col("w1"), col("w2")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi_ratio").desc, col("w1"), col("w2")))
        .cast("int"))
  }

  /** Reciprocal-rank fusion of two ranked lists (the hybrid-retrieval
    * merge: lexical BM25 + vector ANN): rrf = 1/(k0 + rank_a)
    * + 1/(k0 + rank_b), missing-side contribution 0. The sum is a
    * fixed-order TWO-term row expression over integer ranks, so the
    * fused scores (and the rank ordering they induce) are bit-identical
    * across engines. k0 = 60 is the constant from Cormack et al.'s RRF.
    *
    * Scale: both inputs are top-k lists (k rows each) — the outer join
    * and re-rank are k-sized no matter the corpus behind them. */
  def rrfFuse(a: DataFrame, aId: String, aRank: String,
              b: DataFrame, bId: String, bRank: String,
              k0: Int = 60): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    val left = a.select(col(aId).cast("long").as("id"),
      col(aRank).cast("int").as("rank_a"))
    val right = b.select(col(bId).cast("long").as("id"),
      col(bRank).cast("int").as("rank_b"))
    val fused = left.join(right, Seq("id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_a").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("rank_b").cast("double")),
          lit(0.0)))
    fused.withColumn("fused_rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col("id"))).cast("int"))
      .select(col("id"), col("rank_a"), col("rank_b"), col("rrf_score"),
        col("fused_rank"))
  }

  /** Exact phrase search over the corpus via positional postings:
    * documents containing `phrase` as CONSECUTIVE tokens, with the
    * match count and first position — what a bag-of-words ranker (q107
    * BM25) structurally cannot express ("table scan" ≠ "scan table").
    *
    * Scale: postings are pruned to the phrase's terms BEFORE any join
    * (the selective-term postings lists, not the corpus), then chained
    * as (doc, position)-keyed equi-joins — position adjacency is an
    * equality (pos_i = pos_0 + i), so Catalyst plans hash joins, never
    * a theta join. Shuffle is bounded by the phrase terms' posting
    * sizes; a stop-word-only phrase degrades toward the full corpus,
    * the usual positional-index caveat. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two tokens")
    val postings = docs
      .select(col(idCol),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.map(lit): _*))
    val p0 = postings.filter(col("term") === phrase.head)
      .select(col(idCol), col("pos").as("pos0"))
    val matched = phrase.zipWithIndex.tail.foldLeft(p0) { case (acc, (t, i)) =>
      val pi = postings.filter(col("term") === t)
        .select(col(idCol), col("pos").as(s"__p$i"))
      acc.join(pi, Seq(idCol))
        .filter(col(s"__p$i") === col("pos0") + i)
        .drop(s"__p$i")
    }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"), min(col("pos0")).as("first_pos"))
  }

  /** Dirichlet-smoothed query-likelihood ranking — the language-model
    * complement of [[bm25TopK]] (the other classic lexical ranker; QL
    * with Dirichlet smoothing is the standard strong baseline for long
    * queries where BM25's saturation underweights repeated terms):
    * score(d) = Σ_t ln((tf_t,d + µ·p(t|C)) / (|d| + µ)), with
    * p(t|C) the collection unigram probability.
    *
    * Determinism (the q140 grid discipline): each term's log is floored
    * to the 2^-30-nat integer grid and the per-doc sum runs over
    * BIGINTs — exact, associative, partition-order-free; `score` is the
    * exact unscale of `score_scaled`. The oracle replays the same grid.
    *
    * Scale: per-term tf columns fuse into one scan (terms is a small
    * literal list); collection stats are a 1-row broadcast; top-k is a
    * rank-limited sort, never a full-corpus ordering to the driver. */
  def queryLikelihoodTopK(docs: DataFrame, idCol: String, textCol: String,
                          terms: Seq[String], topK: Int,
                          mu: Double = 2000.0): DataFrame = {
    require(terms.nonEmpty, "query term list must be non-empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(mu > 0, s"mu must be > 0, got $mu")
    val Scale = 1073741824L // 2^30
    val toks = TextFunctions.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).as(s"__tf_$i")
    }
    val base = docs
      .select((col(idCol).as("doc_id") +: size(toks).as("dl") +: tfCols): _*)
      .filter(col("dl") > 0)
    val ctfCols = terms.indices.map(i =>
      sum(col(s"__tf_$i")).cast("long").as(s"__ctf_$i"))
    val aggCols = sum(col("dl")).cast("long").as("__clen") +: ctfCols
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    // a query term absent from the WHOLE collection has p(t|C) = 0 and
    // would send ln to -inf for every doc equally — drop its term score
    // (0 contribution) rather than poisoning the ranking
    val termScores = terms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val pC = col(s"__ctf_$i").cast("double") / col("__clen").cast("double")
      val ratio = (tf + lit(mu) * pC) / (col("dl").cast("double") + lit(mu))
      when(col(s"__ctf_$i") === 0L, lit(0L))
        .otherwise(floor(log(ratio) * lit(Scale.toDouble)).cast("long"))
    }
    val scoreScaled = termScores.reduceLeft(_ + _)
    scored
      .select(col("doc_id"), col("dl"), scoreScaled.as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
      .limit(topK)
      .withColumn("score",
        col("score_scaled").cast("double") / lit(Scale.toDouble))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_scaled").desc, col("doc_id"))).cast("int"))
  }
}
