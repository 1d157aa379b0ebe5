package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.{Clusters, Corpus, DateSpine, NearDup, Similarity}

/** Round-2 additions: edge semantics of the reference surfaced by the
  * round-1 review (VERDICT.md) — the date-spine NULL-bounds fallback and
  * the df-capped n-gram Jaccard — each with a DuckDB oracle that mirrors
  * the exact semantics.
  */
object R2Queries {

  /** X1 edge: the reference's ISNULL bounds fallback (SQLproject1.sql:262-
    * 263) — an all-NULL date column still yields the full 2010-01-01..
    * 2025-12-31 spine (5,844 days), not an empty date dim. */
  private val q67 = QueryDef(
    "q67_date_spine_fallback",
    (s, d) => {
      // a "bad file drop": every date failed to parse
      val allNull = Tables.orders(s, d).select(
        lit(null).cast("date").as("bad_lo"), lit(null).cast("date").as("bad_hi"))
      DateSpine.fromBounds(allNull, col("bad_lo"), col("bad_hi"))
        .select(col("date_key"),
          date_format(col("date"), "yyyy-MM-dd").as("date_str"),
          col("year"), col("quarter"), col("month"), col("day"),
          col("week_of_year"), col("month_name"), col("quarter_name"),
          col("is_weekend"))
    },
    Some("""
      WITH days AS (SELECT unnest(generate_series(
             DATE '2010-01-01', DATE '2025-12-31', INTERVAL 1 DAY))::DATE AS d)
      SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
             strftime(d, '%Y-%m-%d') AS date_str,
             CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
             CAST(month(d) AS INT) AS month, CAST(day(d) AS INT) AS day,
             CAST(weekofyear(d) AS INT) AS week_of_year,
             monthname(d) AS month_name,
             'Q' || CAST(quarter(d) AS VARCHAR) AS quarter_name,
             dayname(d) IN ('Saturday', 'Sunday') AS is_weekend
      FROM days"""))

  private val CapDf = 25

  /** The hot-shingle df cap actually EXERCISED (maxDf low enough to drop
    * shingles on this corpus), with the oracle mirroring the capped
    * semantics: df over distinct postings, postings with df > cap removed
    * from both intersections and set sizes, then exact Jaccard. */
  private val q68 = QueryDef(
    "q68_ngram_jaccard_capped",
    (s, d) => NearDup.ngramJaccardPairs(Tables.documents(s, d), "doc_id",
      "text", n = 3, threshold = 0.1, maxDf = CapDf),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w FROM documents),
      ws AS MATERIALIZED (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      posting AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM ws),
      df AS (SELECT s, COUNT(*) AS c FROM posting GROUP BY s),
      capped AS MATERIALIZED (SELECT p.doc_id, p.s FROM posting p JOIN df USING (s)
                 WHERE c <= $CapDf),
      sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       COUNT(*) AS intersection
                FROM capped a JOIN capped b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, intersection,
             CAST(intersection AS DOUBLE) /
               CAST(sa.n_sh + sb.n_sh - intersection AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sz sa ON a_id = sa.doc_id
      JOIN sz sb ON b_id = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) /
              CAST(sa.n_sh + sb.n_sh - intersection AS DOUBLE) >= 0.1"""))

  /** Benchmark decontamination: every 50th doc plays the eval set, the rest
    * are the training corpus; flag docs whose 3-gram overlap with the eval
    * set exceeds 50%. */
  private val q69 = QueryDef(
    "q69_decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.decontaminate(
          corpus = docs.filter(col("doc_id") % 50 =!= 0),
          evalDocs = docs.filter(col("doc_id") % 50 === 0),
          idCol = "doc_id", textCol = "text", n = 3, maxOverlapRatio = 0.5)
        .select(col("doc_id"), col("n_shingles").cast("long"),
          col("n_overlap"), col("overlap_ratio"), col("contaminated"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w FROM documents),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      eval_sh AS (SELECT DISTINCT unnest(sh) AS s FROM ws WHERE doc_id % 50 = 0),
      posting AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s
                  FROM ws WHERE doc_id % 50 <> 0)
      SELECT p.doc_id,
             CAST(MAX(p.n_sh) AS BIGINT) AS n_shingles,
             CAST(COUNT(e.s) AS BIGINT) AS n_overlap,
             CAST(COUNT(e.s) AS DOUBLE) / CAST(MAX(p.n_sh) AS DOUBLE)
               AS overlap_ratio,
             (CAST(COUNT(e.s) AS DOUBLE) / CAST(MAX(p.n_sh) AS DOUBLE)) > 0.5
               AS contaminated
      FROM posting p LEFT JOIN eval_sh e USING (s)
      GROUP BY p.doc_id"""))

  private val PackBudget = 128

  /** Concat-then-chunk sequence packing: docs laid head-to-tail per shard
    * (shard = doc_id % 8, ordered by doc_id), chunked every 128 BPE-ish
    * tokens. */
  private val q70 = QueryDef(
    "q70_pack_sequences",
    (s, d) => Corpus.packSequences(Tables.documents(s, d), "doc_id",
      shard = col("doc_id") % 8,
      tokenCount = TextFunctions.bpeTokenCount(col("text")),
      budget = PackBudget),
    Some(s"""
      WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(regexp_extract_all(text,
               '${TextFunctions.bpeTokenPattern}')) AS BIGINT) AS n_tok
             FROM documents),
      c AS (SELECT doc_id, shard, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_offset
            FROM t)
      SELECT doc_id, shard, n_tok, start_offset,
             start_offset // $PackBudget AS bin,
             start_offset % $PackBudget AS bin_offset
      FROM c"""))

  /** PII scrubbing over deterministic synthetic contact text: an email
    * derived from c_name plus a TPC-H-style phone derived from c_custkey
    * (twice for every third customer, so counts vary). Patterns avoid
    * backslash classes so the regex source is byte-identical across
    * engines. */
  private val q71 = QueryDef(
    "q71_pii_scrub", { (s, d) =>
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
      Corpus.scrubPii(
        Tables.customer(s, d).select(col("c_custkey"),
          contact.as("contact_text")),
        "c_custkey", "contact_text", Seq(
          ("email", "[a-z0-9-]+@[a-z]+[.][a-z]+", "<EMAIL>"),
          ("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>")))
    },
    Some("""
      WITH t AS (SELECT c_custkey,
             'contact ' || lower(replace(c_name, '#', '-')) ||
             '@example.com or call ' ||
             printf('%02d-%03d-%03d-%04d', c_custkey % 90 + 10,
               c_custkey % 900 + 100, (c_custkey * 7) % 900 + 100,
               (c_custkey * 13) % 9000 + 1000) ||
             (CASE WHEN c_custkey % 3 = 0 THEN ' alt ' ||
               printf('%02d-%03d-%03d-%04d', c_custkey % 90 + 10,
                 c_custkey % 900 + 100, (c_custkey * 7) % 900 + 100,
                 (c_custkey * 13) % 9000 + 1000) ELSE '' END)
             || ' re ' || c_mktsegment AS txt
             FROM customer)
      SELECT c_custkey,
             regexp_replace(
               regexp_replace(txt, '[a-z0-9-]+@[a-z]+[.][a-z]+', '<EMAIL>', 'g'),
               '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed,
             CAST(len(regexp_extract_all(txt, '[a-z0-9-]+@[a-z]+[.][a-z]+'))
               AS INT) AS n_email,
             CAST(len(regexp_extract_all(txt,
               '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone
      FROM t"""))

  /** SimHash Hamming-radius near-dups via band blocking; the oracle does
    * the full O(n²) comparison over the same fingerprints (byte-identical
    * to q36's), so equality proves the banding loses no pairs. */
  private val q72 = QueryDef(
    "q72_simhash_hamming",
    (s, d) => Corpus.simHashHammingPairs(Tables.documents(s, d), "doc_id",
      "text", maxHamming = 3),
    Some(s"""
      WITH ${ExtQueries.oSimHashCtes}
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""))

  /** Near-dup cluster resolution: the q72 Hamming pairs resolved into
    * connected components (cluster_id = min reachable doc_id — a unique
    * fixpoint both engines can state; the oracle uses a recursive
    * transitive closure, the Spark side min-label propagation). */
  private val q73 = QueryDef(
    "q73_dedup_clusters",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.connectedComponents(docs, "doc_id",
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id")
    },
    Some(s"""
      WITH RECURSIVE ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
                UNION
                SELECT e.src AS id, reach.r
                FROM edges e JOIN reach ON e.dst = reach.id)
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id"""))

  private val EmbDim = 64

  /** Top-k neighbors under int8-quantized cosine. Quantization uses floor
    * (truncation is engine-universal; rounding modes are not) and integer
    * dot/norm sums are exact, so the only float ops per pair are
    * sqrt-multiply-divide — reproduced bit-for-bit by the oracle's
    * unrolled SQL. */
  private val q74 = QueryDef(
    "q74_quantized_topk",
    (s, d) => Similarity.quantizedCosineTopK(Tables.embeddings(s, d),
      "vec_id", "embedding", col("vec_id") < 10, k = 3),
    Some {
      def idotSql(a: String, b: String) = (1 to EmbDim)
        .map(i => s"$a.q8[$i]*$b.q8[$i]").mkString(" + ")
      s"""
      WITH base AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) AS mx
             FROM embeddings),
      qt AS (SELECT vec_id,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS q8
             FROM base WHERE mx > 0),
      scored AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             CAST(${idotSql("q", "n")} AS DOUBLE) /
               (sqrt(CAST(${idotSql("q", "q")} AS DOUBLE)) *
                sqrt(CAST(${idotSql("n", "n")} AS DOUBLE))) AS q_cosine
             FROM qt q JOIN qt n ON q.vec_id < 10 AND n.vec_id <> q.vec_id)
      SELECT q_id, n_id, q_cosine,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY q_cosine DESC, n_id) AS INT) AS rank
      FROM scored
      QUALIFY rank <= 3"""
    })

  /** Overlapping-window chunking (50-token chunks, 10-token overlap):
    * trailing windows that add no new tokens are dropped in both engines
    * by the same start-filter rule. */
  private val q75 = QueryDef(
    "q75_chunk_documents",
    (s, d) => Corpus.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
      chunkSize = 50, overlap = 10),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w FROM documents),
      b AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
      st AS (SELECT doc_id, w, n,
             unnest(list_filter(range(0, n, 40),
               s -> s = 0 OR s + 10 < n)) AS start_tok
             FROM b)
      SELECT doc_id,
             CAST(start_tok // 40 AS INT) AS chunk_id,
             CAST(start_tok AS INT) AS start_tok,
             CAST(least(50, n - start_tok) AS INT) AS n_tok,
             array_to_string(w[start_tok + 1 : start_tok + 50], ' ')
               AS chunk_text
      FROM st"""))

  /** Mixture sampling: src0 upsampled 2.5×, src1 halved, src2 dropped,
    * everything else kept at 1×. Thresholds are integers both engines
    * compare against the same md5 16-bit bucket. */
  private val q76 = QueryDef(
    "q76_mix_sources",
    (s, d) => Corpus.mixSources(Tables.documents(s, d), "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 0.0)),
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket = s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT)"
      s"""
      WITH w(source, nw, thr) AS (VALUES
        ('src0', 2, 32768), ('src1', 0, 32768), ('src2', 0, 0)),
      d AS (SELECT doc_id, source, $bucket AS b FROM documents),
      c AS (SELECT doc_id, source,
             coalesce(nw, 1) + (CASE WHEN b < coalesce(thr, 0)
               THEN 1 ELSE 0 END) AS n
            FROM d LEFT JOIN w USING (source))
      SELECT doc_id, source, CAST(unnest(range(1, n + 1)) AS INT) AS copy_id
      FROM c WHERE n >= 1"""
    })

  /** Incremental crawl gate: docs with doc_id % 10 = 9 play the new batch,
    * the rest the existing corpus; batch docs within Hamming 3 of any
    * corpus doc are dropped. The oracle does the full batch × corpus
    * comparison over the same fingerprints. */
  private val q77 = QueryDef(
    "q77_dedupe_against_corpus",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.dedupeAgainstCorpus(
          batch = docs.filter(col("doc_id") % 10 === 9),
          corpus = docs.filter(col("doc_id") % 10 =!= 9),
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

  val all: Seq[QueryDef] = Seq(q67, q68, q69, q70, q71, q72, q73, q74, q75,
    q76, q77)
}
