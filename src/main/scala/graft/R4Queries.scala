package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.CorpusPipeline

/** Round-4 queries: the end-to-end [[CorpusPipeline]] COMPOSITION under a
  * differential oracle. Every stage was already individually oracled
  * (q84 normalize, q30 gates, q33 exact dedup, q72/q73/q82 near-dup,
  * q69 decontaminate); these two queries prove the composition — stage
  * ordering, survivor wiring, and the survival report — against one DuckDB
  * SQL chain that re-runs the whole pipeline.
  */
object R4Queries {

  private val stopList = ExtQueries.stopList

  /** SimHash tok/sums/sims CTEs over a source CTE exposing (doc_id, w). */
  private def oSimHashOver(src: String, bits: Int): String = {
    val sums = (0 until bits).map { j =>
      val nib = s"(strpos('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1)"
      s"SUM(2 * (($nib >> ${j % 4}) & 1) - 1) AS s_$j"
    }.mkString(",\n             ")
    val packed = (0 until bits).map(j =>
      s"(CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""stok AS (SELECT doc_id, md5(unnest(w)) AS h FROM $src),
      ssums AS (SELECT doc_id,
             $sums
      FROM stok GROUP BY doc_id),
      sims AS (SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM ssums)"""
  }

  // pipeline config for the oracled run: every gate exercises a real drop
  // on the sf corpora (tokens 10..99, stopword-ratio p25 ~0.04), 32-bit
  // SimHash (the q72-proven banding), q69's eval-set convention
  private val MinTok = 20
  private val MaxTok = 90
  private val MinStop = 0.02
  private val cfg = CorpusPipeline.Config(
    minTokens = MinTok, maxTokens = MaxTok, minStopwordRatio = MinStop,
    nearDupHamming = 3, simHashBits = 32, simHashBands = 4,
    decontaminateShingleN = 3, maxEvalOverlapRatio = 0.5)

  private def runPipeline(s: SparkSession, d: String): CorpusPipeline.Result = {
    val docs = Tables.documents(s, d)
    CorpusPipeline.run(s, docs.filter(col("doc_id") % 50 =!= 0), "doc_id",
      "text", evalDocs = docs.filter(col("doc_id") % 50 === 0), cfg)
  }

  /** The full pipeline as one DuckDB CTE chain, ending at `fin` (the
    * surviving corpus) with all stage CTEs named for count probes. */
  private val oPipelineChain = s"""
      norm AS (SELECT doc_id,
               trim(regexp_replace(lower(strip_accents(nfc_normalize(text))),
                 '\\s+', ' ', 'g')) AS text,
               lang, source, n_chars
             FROM documents WHERE doc_id % 50 <> 0),
      tokd AS (SELECT *, ${ExtQueries.oToks("text")} AS w FROM norm),
      lg AS (SELECT * FROM tokd WHERE len(w) BETWEEN $MinTok AND $MaxTok),
      qg AS (SELECT * FROM lg
             WHERE coalesce(
               CAST(len(list_filter(w, x -> x IN ($stopList))) AS DOUBLE) /
                 CAST(NULLIF(len(w), 0) AS DOUBLE), 0.0) >= $MinStop),
      ed AS (SELECT doc_id, text, lang, source, n_chars, w FROM (
               SELECT *, row_number() OVER (PARTITION BY md5(text)
                 ORDER BY doc_id) AS ern FROM qg)
             WHERE ern = 1),
      ${oSimHashOver("ed", 32)},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT doc_id AS id, doc_id AS r FROM ed
                UNION
                SELECT e.src AS id, reach.r
                FROM edges e JOIN reach ON e.dst = reach.id),
      comp AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      nd AS (SELECT doc_id, text, lang, source, n_chars, w FROM (
               SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, d.w,
                      row_number() OVER (PARTITION BY c.cluster_id
                        ORDER BY length(d.text) DESC, d.doc_id) AS krn
               FROM ed d JOIN comp c USING (doc_id))
             WHERE krn = 1),
      evw AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
              FROM documents WHERE doc_id % 50 = 0),
      evsh AS (SELECT DISTINCT unnest(list_distinct(${ExtQueries.oShingles("w", 3)})) AS s
               FROM evw WHERE len(w) >= 3),
      post AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM (
                 SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
                 FROM nd WHERE len(w) >= 3)),
      cont AS (SELECT p.doc_id
               FROM post p LEFT JOIN evsh e USING (s)
               GROUP BY p.doc_id
               HAVING (CAST(COUNT(e.s) AS DOUBLE) /
                       CAST(MAX(p.n_sh) AS DOUBLE)) > 0.5),
      fin AS (SELECT doc_id, text, lang, source, n_chars FROM nd
              WHERE doc_id NOT IN (SELECT doc_id FROM cont))"""

  /** The surviving corpus of the composed pipeline. */
  private val q88 = QueryDef(
    "q88_corpus_pipeline",
    (s, d) => runPipeline(s, d).corpus,
    Some(s"""
      WITH RECURSIVE $oPipelineChain
      SELECT doc_id, text, lang, source, n_chars FROM fin"""))

  /** The per-stage survival report of the same run, cross-checked row by
    * row (stage boundaries, in/out/dropped counts). */
  private val q89 = QueryDef(
    "q89_corpus_survival",
    (s, d) => runPipeline(s, d).report,
    Some(s"""
      WITH RECURSIVE $oPipelineChain,
      c AS (SELECT
        (SELECT count(*) FROM documents WHERE doc_id % 50 <> 0) AS c0,
        (SELECT count(*) FROM norm) AS c1,
        (SELECT count(*) FROM lg) AS c2,
        (SELECT count(*) FROM qg) AS c3,
        (SELECT count(*) FROM ed) AS c4,
        (SELECT count(*) FROM nd) AS c5,
        (SELECT count(*) FROM fin) AS c6)
      SELECT CAST(1 AS INT) AS stage, 'normalize' AS stage_name,
             CAST(c0 AS BIGINT) AS n_in, CAST(c1 AS BIGINT) AS n_out,
             CAST(c0 - c1 AS BIGINT) AS n_dropped FROM c
      UNION ALL SELECT 2, 'length_gate', c1, c2, c1 - c2 FROM c
      UNION ALL SELECT 3, 'quality_gate', c2, c3, c2 - c3 FROM c
      UNION ALL SELECT 4, 'exact_dedup', c3, c4, c3 - c4 FROM c
      UNION ALL SELECT 5, 'near_dedup', c4, c5, c4 - c5 FROM c
      UNION ALL SELECT 6, 'decontaminate', c5, c6, c5 - c6 FROM c"""))

  /** Per-source quota sampling: at most 15 of each source's 25 docs
    * survive, chosen by deterministic md5 ranking (run-stable, unbiased
    * vs crawl order). */
  private val q90 = QueryDef(
    "q90_cap_per_source",
    (s, d) => operators.Corpus.capPerSource(Tables.documents(s, d),
        "doc_id", "source", maxDocs = 15)
      .select(col("doc_id"), col("source"), col("source_rank")),
    Some("""
      SELECT doc_id, source, CAST(rn AS INT) AS source_rank
      FROM (SELECT doc_id, source,
              row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents)
      WHERE rn <= 15"""))

  /** The q77 incremental gate against a PRECOMPUTED signature store — the
    * corpus text is never re-read. Same oracle as q77 (signatures are a
    * pure function of the corpus), so equality also proves
    * store == recompute. */
  private val q91 = QueryDef(
    "q91_dedupe_against_signatures",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sigStore = operators.NearDup.simHash(
        docs.filter(col("doc_id") % 10 =!= 9), "doc_id", "text", bits = 32)
      operators.Corpus.dedupeAgainstSignatures(
          batch = docs.filter(col("doc_id") % 10 === 9), sigStore,
          idCol = "doc_id", textCol = "text", maxHamming = 3)
        .select(col("doc_id"), col("lang"), col("source"))
    },
    Some(s"""
      WITH ${ExtQueries.oSimHashCtes},
      dup AS (SELECT DISTINCT x.doc_id
              FROM sims x JOIN sims y
                ON x.doc_id % 10 = 9 AND y.doc_id % 10 <> 9
               AND bit_count(xor(x.simhash, y.simhash)) <= 3)
      SELECT d.doc_id, d.lang, d.source
      FROM documents d
      WHERE d.doc_id % 10 = 9
        AND d.doc_id NOT IN (SELECT doc_id FROM dup)"""))

  /** Deterministic training shards: md5-derived shard + in-shard position
    * (the reproducible global shuffle a data loader consumes). */
  private val q92 = QueryDef(
    "q92_train_shards",
    (s, d) => operators.Corpus.shardForTraining(Tables.documents(s, d),
        "doc_id", nShards = 8, seed = "r4")
      .select(col("doc_id"), col("shard_id"), col("shard_pos")),
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(h, $j, 1)) - 1)"
      // 12 hex digits = the 48 hash bits the operator shards on
      val hash48 = (0 until 12)
        .map(k => s"${BigInt(16).pow(11 - k)}*${nib(k + 1)}")
        .mkString(" + ")
      s"""
      WITH t AS (SELECT doc_id,
                   md5('r4:' || CAST(doc_id AS VARCHAR)) AS h
                 FROM documents),
      sh AS (SELECT doc_id, h,
               CAST(CAST($hash48 AS BIGINT) % 8 AS INT) AS shard_id
             FROM t)
      SELECT doc_id, shard_id,
             CAST(row_number() OVER (PARTITION BY shard_id
               ORDER BY h, doc_id) AS INT) AS shard_pos
      FROM sh"""
    })

  /** Per-source token budget: md5-ranked prefix per source while the
    * running whitespace-token total stays within 600. */
  private val q93 = QueryDef(
    "q93_token_budget",
    (s, d) => operators.Corpus.capTokensPerSource(Tables.documents(s, d),
        "doc_id", "source",
        tokenCount = size(TextFunctions.tokens(col("text"))),
        maxTokens = 600)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens")),
    Some(s"""
      WITH t AS (SELECT doc_id, source,
                   CAST(len(${ExtQueries.oToks("text")}) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
              CAST(SUM(n_tokens) OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM t)
      SELECT doc_id, source, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 600"""))

  /** Gopher-style per-rule quality flags: every rule's boolean plus the
    * keep conjunction, cross-checked signal by signal. */
  private val q94 = QueryDef(
    "q94_gopher_flags",
    (s, d) => operators.Corpus.gopherQualityFlags(Tables.documents(s, d),
        "doc_id", "text", minWords = 20, maxWords = 80,
        minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
        maxSymbolRatio = 0.1, minAlphaRatio = 0.8, minStopwordHits = 2)
      .select(col("doc_id"), col("n_words").cast("int").as("n_words"),
        col("mean_word_len"), col("symbol_ratio"), col("alpha_ratio"),
        col("stop_hits").cast("int").as("stop_hits"),
        col("flag_word_count"), col("flag_mean_word_len"),
        col("flag_symbol_ratio"), col("flag_alpha_ratio"),
        col("flag_stopwords"), col("keep")),
    Some(s"""
      WITH t AS (SELECT doc_id, text, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      m AS (SELECT doc_id,
              CAST(len(w) AS INT) AS n_words,
              CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) /
                CAST(NULLIF(len(w), 0) AS DOUBLE) AS mean_word_len,
              coalesce(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                  AS DOUBLE) /
                CAST(NULLIF(len(w), 0) AS DOUBLE), 0.0) AS symbol_ratio,
              coalesce(CAST(len(list_filter(w,
                    x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) /
                CAST(NULLIF(len(w), 0) AS DOUBLE), 0.0) AS alpha_ratio,
              CAST(len(list_distinct(list_filter(w,
                x -> x IN ($stopList)))) AS INT) AS stop_hits
            FROM t)
      SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
             stop_hits,
             (n_words >= 20 AND n_words <= 80) AS flag_word_count,
             coalesce(mean_word_len >= 3.0 AND mean_word_len <= 10.0,
               false) AS flag_mean_word_len,
             (symbol_ratio <= 0.1) AS flag_symbol_ratio,
             (alpha_ratio >= 0.8) AS flag_alpha_ratio,
             (stop_hits >= 2) AS flag_stopwords,
             ((n_words >= 20 AND n_words <= 80)
               AND coalesce(mean_word_len >= 3.0 AND mean_word_len <= 10.0,
                 false)
               AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
               AND stop_hits >= 2) AS keep
      FROM m"""))

  /** Semantic dedup over embeddings: cosine near-dup pairs → connected
    * components → min-id keeper, as one call; the oracle recomputes the
    * exact pair set and the recursive closure. */
  private val q95 = QueryDef(
    "q95_semantic_dedup",
    (s, d) => operators.Similarity.semanticDedup(Tables.embeddings(s, d),
        "vec_id", "embedding", threshold = 0.4)
      .select(col("vec_id"), col("cluster_id"), col("cluster_size")),
    Some(s"""
      WITH RECURSIVE
      a AS (SELECT vec_id AS a_id, embedding AS ae FROM embeddings),
      b AS (SELECT vec_id AS b_id, embedding AS be FROM embeddings),
      prs AS (SELECT a_id, b_id FROM a JOIN b ON a_id < b_id
              WHERE ${ExtQueries.oCos("ae", "be")} >= 0.4),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT vec_id AS id, vec_id AS r FROM embeddings
                UNION
                SELECT e.src AS id, reach.r
                FROM edges e JOIN reach ON e.dst = reach.id),
      comp AS (SELECT id AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      j AS (SELECT vec_id, cluster_id,
              row_number() OVER (PARTITION BY cluster_id ORDER BY vec_id) AS rn,
              count(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM comp)
      SELECT vec_id, cluster_id, cluster_size FROM j WHERE rn = 1"""))

  /** Corpus vocabulary induction: top-200 tokens by occurrence count with
    * document frequencies, deterministically ranked. */
  private val q96 = QueryDef(
    "q96_vocabulary",
    (s, d) => operators.Corpus.vocabulary(Tables.documents(s, d),
      "doc_id", "text", topK = 200),
    Some(s"""
      WITH t AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
                 FROM documents),
      c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM t GROUP BY token)
      SELECT token, n_occurrences, n_docs,
             CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
               AS INT) AS rank
      FROM c QUALIFY rank <= 200"""))

  /** BPE merge-candidate statistics: top-100 adjacent character pairs
    * inside words, corpus-wide. */
  private val q97 = QueryDef(
    "q97_bpe_pairs",
    (s, d) => operators.Corpus.bpePairStats(Tables.documents(s, d),
      "text", topK = 100),
    Some(s"""
      WITH w AS (SELECT unnest(${ExtQueries.oToks("text")}) AS tok
                 FROM documents),
      p AS (SELECT unnest(list_transform(range(1, length(tok)),
              i -> substr(tok, i, 2))) AS pair
            FROM w WHERE length(tok) >= 2),
      c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM p GROUP BY pair)
      SELECT pair, n_occurrences,
             CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair)
               AS INT) AS rank
      FROM c QUALIFY rank <= 100"""))

  /** Semantic dedup on the SCALE PATH: candidates from hyperplane-LSH
    * same-bucket pairs instead of the all-pairs broadcast — the plan a
    * 100 TB corpus actually runs. The oracle replicates the deterministic
    * plane weights (as q38 does), so the approximate candidate cut itself
    * is differentially verified, not just the exact fallback. */
  private val q98 = QueryDef(
    "q98_semantic_dedup_lsh",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val b = operators.Similarity.lshBucketed(e, "vec_id", "embedding",
        numPlanes = 8, dim = ExtQueries.OracleEmbDim)
      val cand = b.as("x").join(b.as("y"),
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      operators.Similarity.semanticDedup(e, "vec_id", "embedding",
          threshold = 0.4, candidates = Some(cand))
        .select(col("vec_id"), col("cluster_id"), col("cluster_size"))
    },
    Some(s"""
      WITH RECURSIVE
      b AS (SELECT vec_id, embedding,
              CAST(${ExtQueries.oLshBucket(8)} AS INT) AS bucket
            FROM embeddings),
      prs AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id
              FROM b x JOIN b y
                ON x.bucket = y.bucket AND x.vec_id < y.vec_id
              WHERE ${ExtQueries.oCos("x.embedding", "y.embedding")} >= 0.4),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT vec_id AS id, vec_id AS r FROM embeddings
                UNION
                SELECT e.src AS id, reach.r
                FROM edges e JOIN reach ON e.dst = reach.id),
      comp AS (SELECT id AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      j AS (SELECT vec_id, cluster_id,
              row_number() OVER (PARTITION BY cluster_id ORDER BY vec_id) AS rn,
              count(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM comp)
      SELECT vec_id, cluster_id, cluster_size FROM j WHERE rn = 1"""))

  /** Deterministic score-proportional sampling: keep-probability rises
    * with document length; the md5 draw is an exact binary fraction both
    * engines reproduce bit-for-bit. */
  private val q99 = QueryDef(
    "q99_sample_by_score",
    (s, d) => operators.Corpus.sampleByScore(Tables.documents(s, d),
        "doc_id", least(lit(1.0), col("n_chars") / lit(400.0)), seed = "r4")
      .select(col("doc_id"), col("n_chars"), col("sample_u")),
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(h, $j, 1)) - 1)"
      val hash48 = (0 until 12)
        .map(k => s"${BigInt(16).pow(11 - k)}*${nib(k + 1)}")
        .mkString(" + ")
      s"""
      WITH t AS (SELECT doc_id, n_chars,
                   md5('r4:' || CAST(doc_id AS VARCHAR)) AS h
                 FROM documents),
      u AS (SELECT doc_id, n_chars,
              CAST(CAST($hash48 AS BIGINT) AS DOUBLE) / 281474976710656.0
                AS sample_u
            FROM t)
      SELECT doc_id, n_chars, sample_u
      FROM u WHERE sample_u < least(1.0, n_chars / 400.0)"""
    })

  /** PII pseudonymization with stable per-match tokens: the oracle
    * reconstructs each token from the fixture's known email/phone values
    * (construction-based differential check of the RegexHashReplace
    * expression — same-value matches must collapse to the same token). */
  private val q100 = QueryDef(
    "q100_pseudonymize_pii",
    (s, d) => {
      val phone = format_string("%02d-%03d-%03d-%04d",
        col("c_custkey") % 90 + 10, col("c_custkey") % 900 + 100,
        (col("c_custkey") * 7) % 900 + 100,
        (col("c_custkey") * 13) % 9000 + 1000)
      val contact = concat(
        lit("contact "), lower(regexp_replace(col("c_name"), "#", "-")),
        lit("@example.com or call "), phone,
        when(col("c_custkey") % 3 === 0,
          concat(lit(" alt "), phone)).otherwise(lit("")),
        lit(" re "), col("c_mktsegment"))
      operators.Corpus.pseudonymizePii(
        Tables.customer(s, d).select(col("c_custkey"),
          contact.as("contact_text")),
        "c_custkey", "contact_text", Seq(
          ("email", "[a-z0-9-]+@[a-z]+[.][a-z]+", "EM_"),
          ("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "PH_")))
    },
    Some("""
      WITH t AS (SELECT c_custkey,
             lower(replace(c_name, '#', '-')) || '@example.com' AS em,
             printf('%02d-%03d-%03d-%04d', c_custkey % 90 + 10,
               c_custkey % 900 + 100, (c_custkey * 7) % 900 + 100,
               (c_custkey * 13) % 9000 + 1000) AS ph,
             c_mktsegment AS seg
             FROM customer)
      SELECT c_custkey,
             'contact EM_' || substr(md5(em), 1, 8) ||
             ' or call PH_' || substr(md5(ph), 1, 8) ||
             (CASE WHEN c_custkey % 3 = 0
               THEN ' alt PH_' || substr(md5(ph), 1, 8) ELSE '' END) ||
             ' re ' || seg AS pseudonymized,
             CAST(1 AS INT) AS n_email,
             CAST(CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END AS INT)
               AS n_phone
      FROM t"""))

  val all: Seq[QueryDef] = Seq(q88, q89, q90, q91, q92, q93, q94, q95,
    q96, q97, q98, q99, q100)
}
