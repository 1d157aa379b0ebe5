package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators._

/** LLM-data-pipeline extension queries (SURVEY §7.7): text analysis,
  * dedup family, similarity search, event windows. Several oracles are
  * program-generated SQL (signatures, bit math, unrolled dot products) —
  * the same Scala constants feed both the Spark plan and the oracle text,
  * so the two engines compute literally the same arithmetic. */
object ExtQueries {

  private val D2 = DecimalType(18, 2)
  private def money(c: Column): Column = c.cast(D2)

  // ---- oracle SQL building blocks (DuckDB) --------------------------------

  /** Whitespace tokens with empties removed. */
  private[graft] def oToks(t: String) =
    s"list_filter(string_split_regex($t, '\\s+'), x -> x <> '')"

  /** Word n-gram shingles over a token-list column. */
  private[graft] def oShingles(w: String, n: Int) = {
    val terms = (0 until n).map(k => s"$w[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($w)-${n - 2}), i -> $terms)"
  }

  // shared across the query registries (like oToks/oShingles): ONE source
  // of truth for the oracle-side stopword list and the unrolled cosine SQL
  private[graft] val stopList =
    TextFunctions.stopwords.map(s => s"'$s'").mkString(", ")

  /** DuckDB replay of Stats.cdfTable: per-distinct-value two-sample
    * counts + inclusive cumulative sums + totals. `bSelect` must yield
    * columns (v DOUBLE, a BOOLEAN) already filtered to non-NULL. */
  private[graft] def oCdfFrom(bSelect: String): String = s"""
      b AS ($bSelect),
      pv AS (SELECT v,
               CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
             FROM b GROUP BY 1),
      c AS (SELECT v, n_a, n_b,
              CAST(sum(n_a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
              CAST(sum(n_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
            FROM pv),
      t AS (SELECT CAST(sum(n_a) AS BIGINT) AS na,
              CAST(sum(n_b) AS BIGINT) AS nb FROM pv)"""

  /** DuckDB replay of Stats.mannWhitney's exact rank-sum aggregates on
    * top of [[oCdfFrom]]'s CTE chain (emits CTEs `agg` and `z` with
    * two_ua / ties / na / nb). */
  private[graft] val oMannWhitneyAgg: String = """
      agg AS (SELECT
               CAST(sum(n_a * (2 * (cum_a + cum_b - (n_a + n_b))
                 + (n_a + n_b) + 1)) AS HUGEINT) AS two_ra,
               CAST(sum((n_a + n_b) * (n_a + n_b) * (n_a + n_b)
                 - (n_a + n_b)) AS HUGEINT) AS ties
             FROM c),
      z AS (SELECT na, nb, ties,
              two_ra - CAST(na AS HUGEINT) * (na + 1) AS two_ua
            FROM agg CROSS JOIN t)"""

  private[graft] val OracleEmbDim = 64
  private[graft] def oDot(a: String, b: String) = "0.0 + " + (1 to OracleEmbDim)
    .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
  private[graft] def oCos(a: String, b: String) =
    s"(${oDot(a, b)}) / (sqrt(${oDot(a, a)}) * sqrt(${oDot(b, b)}))"

  /** Hyperplane-LSH bucket id over an `embedding` column (or `$e.embedding`
    * with a prefix), replicating Similarity.hyperplanes' deterministic
    * plane weights as SQL literals. */
  private[graft] def oLshBucket(numPlanes: Int, e: String = ""): String = {
    val emb = if (e.isEmpty) "embedding" else s"$e.embedding"
    graft.operators.Similarity.hyperplanes(numPlanes, OracleEmbDim)
      .zipWithIndex.map { case (w, j) =>
        val proj = w.zipWithIndex
          .map { case (wi, i) => s"CAST($emb[${i + 1}] AS DOUBLE)*($wi)" }
          .mkString(" + ")
        s"(CASE WHEN ($proj) >= 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
  }

  // ---- text analysis ------------------------------------------------------

  /** Token counting + quality scoring (length/stopword/punct signals). */
  private val q30 = QueryDef(
    "q30_text_stats",
    (s, d) => {
      val t = Tables.documents(s, d)
      val toks = TextFunctions.tokens(col("text"))
      t.select(col("doc_id"), toks.as("__t"), col("text"))
        .select(
          col("doc_id"),
          size(col("__t")).as("n_tokens"),
          length(col("text")).cast("int").as("n_chars_calc"),
          TextFunctions.bpeTokenCount(col("text")).cast("int").as("bpe_tokens"),
          TextFunctions.stopwordRatio(col("__t")).as("stop_ratio"),
          (aggregate(transform(col("__t"), x => length(x)), lit(0), (a, v) => a + v)
            .cast("double") /
            nullif(size(col("__t")), lit(0)).cast("double")).as("avg_token_len"),
          regexp_count(col("text"), lit("[.,!?;:]")).cast("int").as("punct_count"))
        .withColumn("quality_score",
          least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.5 +
            coalesce(col("stop_ratio"), lit(0.0)) * 0.5)
    },
    Some(s"""
      WITH t AS (SELECT doc_id, text, ${oToks("text")} AS w FROM documents)
      SELECT doc_id,
             CAST(len(w) AS INT) AS n_tokens,
             CAST(length(text) AS INT) AS n_chars_calc,
             CAST(len(regexp_extract_all(text, '${TextFunctions.bpeTokenPattern}')) AS INT)
               AS bpe_tokens,
             CAST(len(list_filter(w, x -> x IN ($stopList))) AS DOUBLE) /
               CAST(NULLIF(len(w), 0) AS DOUBLE) AS stop_ratio,
             CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) /
               CAST(NULLIF(len(w), 0) AS DOUBLE) AS avg_token_len,
             CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INT) AS punct_count,
             least(1.0, CAST(len(w) AS DOUBLE) / 100.0) * 0.5 +
               coalesce(CAST(len(list_filter(w, x -> x IN ($stopList))) AS DOUBLE) /
                 CAST(NULLIF(len(w), 0) AS DOUBLE), 0.0) * 0.5 AS quality_score
      FROM t"""))

  /** Language-ID by marker-stopword hit counts, deterministic arg-max. */
  private val q31 = QueryDef(
    "q31_lang_id",
    (s, d) => {
      val toks = TextFunctions.tokens(col("text"))
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), toks.as("__t"))
      val scored = TextFunctions.langMarkers.foldLeft(base) { case (df, (l, ms)) =>
        df.withColumn(s"c_$l", TextFunctions.langScore(col("__t"), ms))
      }
      scored.select(
        col("doc_id"), col("lang"),
        col("c_en"), col("c_de"), col("c_fr"), col("c_es"),
        when(col("c_en") === 0 && col("c_de") === 0 &&
             col("c_fr") === 0 && col("c_es") === 0, "unknown")
          .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") &&
                col("c_en") >= col("c_es"), "en")
          .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es"), "de")
          .when(col("c_fr") >= col("c_es"), "fr")
          .otherwise("es").as("predicted_lang"))
    },
    Some {
      val scoreSql = TextFunctions.langMarkers.map { case (l, ms) =>
        val lst = ms.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(w, x -> x IN ($lst))) AS INT) AS c_$l"
      }.mkString(",\n             ")
      s"""
      WITH t AS (SELECT doc_id, lang, ${oToks("text")} AS w FROM documents),
      sc AS (SELECT doc_id, lang,
             $scoreSql
      FROM t)
      SELECT doc_id, lang, c_en, c_de, c_fr, c_es,
             CASE WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'unknown'
                  WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
                  WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                  WHEN c_fr >= c_es THEN 'fr'
                  ELSE 'es' END AS predicted_lang
      FROM sc"""
    })

  /** Winnowing-lite document fingerprint (rolling min-hash of shingles). */
  private val q32 = QueryDef(
    "q32_fingerprint",
    (s, d) => Tables.documents(s, d).select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fingerprint")),
    Some(s"""
      WITH t AS (SELECT doc_id, text, ${oToks("text")} AS w FROM documents)
      SELECT doc_id,
             CASE WHEN len(w) >= 5
                  THEN list_aggregate(list_transform(${oShingles("w", 5)}, s -> md5(s)), 'min')
                  ELSE md5(text) END AS fingerprint
      FROM t"""))

  // ---- dedup family -------------------------------------------------------

  /** Exact dedup groups by normalized content hash. */
  private val q33 = QueryDef(
    "q33_dedup_exact",
    (s, d) => Dedup.exactGroups(Tables.documents(s, d), "doc_id",
      md5(lower(trim(col("text"))))),
    Some("""
      SELECT md5(lower(trim(text))) AS content_hash,
             min(doc_id) AS keep_id, COUNT(*) AS dup_count
      FROM documents GROUP BY md5(lower(trim(text)))"""))

  /** EXACT n-gram Jaccard similarity pairs via the uncapped shingle
    * self-join — a verification query by contract (the `_exact` suffix +
    * `uncapped = true` opt-in): it states ground truth for the banded/
    * capped production paths on verification-scale corpora. maxDf is
    * pinned to 0 because THIS oracle states the uncapped semantics —
    * relying on a default cap merely not biting at the fixture's size
    * would prime a divergence on any larger corpus. The production twin
    * with a capped oracle is q68. */
  private val q34 = QueryDef(
    "q34_ngram_jaccard_exact",
    (s, d) => NearDup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
      n = 3, threshold = 0.2, maxDf = 0, uncapped = true),
    Some(s"""
      WITH t AS (SELECT doc_id, ${oToks("text")} AS w FROM documents),
      ws AS MATERIALIZED (SELECT doc_id, list_distinct(${oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      sh AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM ws),
      sz AS MATERIALIZED (SELECT doc_id, len(sh) AS n_sh FROM ws),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS intersection
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, intersection,
             CAST(intersection AS DOUBLE) /
               CAST(sa.n_sh + sb.n_sh - intersection AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sz sa ON a_id = sa.doc_id
      JOIN sz sb ON b_id = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) /
              CAST(sa.n_sh + sb.n_sh - intersection AS DOUBLE) >= 0.2"""))

  private val MinHashes = 12
  private val BandSize = 3

  /** MinHash + LSH banding candidate pairs. */
  private val q35 = QueryDef(
    "q35_minhash_lsh",
    (s, d) => NearDup.minHashLshCandidates(Tables.documents(s, d), "doc_id",
      "text", shingleN = 3, numHashes = MinHashes, bandSize = BandSize),
    Some {
      val sigCols = (0 until MinHashes).map(i =>
        s"list_aggregate(list_transform(sh, x -> md5('$i|' || x)), 'min') AS sig_$i")
        .mkString(",\n             ")
      val bandSelects = (0 until MinHashes / BandSize).map { b =>
        val sigs = (0 until BandSize).map(k => s"sig_${b * BandSize + k}").mkString(", ")
        s"SELECT doc_id, $b AS band_id, md5(concat_ws(',', $sigs)) AS band_key FROM sigs"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH t AS (SELECT doc_id, ${oToks("text")} AS w FROM documents),
      ws AS (SELECT doc_id, list_distinct(${oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      sigs AS MATERIALIZED (SELECT doc_id,
             $sigCols
      FROM ws),
      bands0 AS MATERIALIZED (
        $bandSelects),
      bands AS MATERIALIZED (
        -- the default-on hot-band cap (spark.graft.neardup.maxBandBucket
        -- = ${NearDup.DefaultMaxBandBucket}): buckets holding more
        -- postings are dropped BEFORE the self-join on the Spark side —
        -- modeled here so the gate stays meaningful if a corpus ever
        -- saturates a bucket
        SELECT doc_id, band_id, band_key FROM bands0
        QUALIFY count(*) OVER (PARTITION BY band_id, band_key)
          <= ${NearDup.DefaultMaxBandBucket})
      SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_key = y.band_key
       AND x.doc_id < y.doc_id"""
    })

  private val SimHashBits = 32

  /** CTE list replicating NearDup.simHash in DuckDB; the final CTE `sims`
    * is (doc_id, simhash BIGINT). Shared by q36 and R2Queries' q72. */
  private[graft] def oSimHashCtes: String = {
    val sums = (0 until SimHashBits).map { j =>
      val nib = s"(strpos('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1)"
      s"SUM(2 * (($nib >> ${j % 4}) & 1) - 1) AS s_$j"
    }.mkString(",\n             ")
    val bits = (0 until SimHashBits).map(j =>
      s"(CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""tok AS (SELECT doc_id, md5(unnest(${oToks("text")})) AS h FROM documents),
      sums AS MATERIALIZED (SELECT doc_id,
             $sums
      FROM tok GROUP BY doc_id),
      sims AS MATERIALIZED (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sums)"""
  }

  /** 32-bit SimHash fingerprints. */
  private val q36 = QueryDef(
    "q36_simhash",
    (s, d) => NearDup.simHash(Tables.documents(s, d), "doc_id", "text", SimHashBits),
    Some(s"""
      WITH $oSimHashCtes
      SELECT doc_id, simhash FROM sims"""))

  // ---- similarity search --------------------------------------------------

  private val EmbDim = OracleEmbDim

  /** Brute-force cosine top-k: the unrolled oracle repeats the exact
    * left-fold add order of Similarity.dot, so doubles match bitwise. */
  private val q37 = QueryDef(
    "q37_cosine_topk",
    (s, d) => Similarity.cosineTopK(Tables.embeddings(s, d), "vec_id",
      "embedding", col("vec_id") < 10, k = 3),
    Some {
      def dotSql(a: String, b: String) = "0.0 + " + (1 to EmbDim)
        .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)").mkString(" + ")
      s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
                 WHERE vec_id < 10),
      c AS (SELECT vec_id AS n_id, embedding AS n_emb FROM embeddings),
      sc AS (SELECT q_id, n_id,
               (${dotSql("q_emb", "n_emb")}) /
               (sqrt(${dotSql("q_emb", "q_emb")}) * sqrt(${dotSql("n_emb", "n_emb")}))
                 AS cosine
             FROM c CROSS JOIN q WHERE q_id <> n_id),
      rk AS (SELECT q_id, n_id, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine DESC, n_id) AS INT) AS rank
             FROM sc)
      SELECT q_id, n_id, cosine, rank FROM rk WHERE rank <= 3"""
    })

  private val LshPlanes = 8

  /** Hyperplane-LSH bucketing (the ANN scale path): bucket id + population. */
  private val q38 = QueryDef(
    "q38_embed_lsh",
    (s, d) => Similarity.lshBucketed(Tables.embeddings(s, d), "vec_id",
      "embedding", LshPlanes, EmbDim),
    Some(s"""
      WITH b AS (SELECT vec_id, CAST(${oLshBucket(LshPlanes)} AS INT)
                   AS bucket FROM embeddings)
      SELECT vec_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bucket_size
      FROM b"""))

  // ---- event windows (batch form; streaming variants in graft.streaming) --

  /** Tumbling 1-hour windows per event type. */
  private val q39 = QueryDef(
    "q39_events_tumbling",
    (s, d) => EventOps.tumblingAgg(Tables.events(s, d), col("ts"), 3600,
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n_events"),
            sum(money(col("value"))).cast("double").as("sum_value")))
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")),
    Some("""
      WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
      SELECT strftime(make_timestamp((sec - sec % 3600) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS window_start,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM e GROUP BY 1, 2"""))

  /** Sliding 10-minute windows every 5 minutes. */
  private val q40 = QueryDef(
    "q40_events_sliding",
    (s, d) => EventOps.slidingAgg(Tables.events(s, d), col("ts"), 600, 300,
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n_events"),
            sum(money(col("value"))).cast("double").as("sum_value")))
      .withColumn("window_start",
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")),
    Some("""
      WITH e AS (SELECT event_type, value,
                        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      x AS (SELECT event_type, value, sec, unnest([0, 1]) AS k FROM e),
      w AS (SELECT event_type, value,
                   ((sec - k*300) - ((sec - k*300) % 600)) + k*300 AS wsec FROM x)
      SELECT strftime(make_timestamp(wsec * 1000000), '%Y-%m-%d %H:%M:%S')
               AS window_start,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM w GROUP BY 1, 2"""))

  /** Gap-based sessionization (30-min inactivity) + per-session rollup. */
  private val q41 = QueryDef(
    "q41_events_sessionize",
    (s, d) => EventOps.sessionize(Tables.events(s, d), col("user_id"),
        col("ts"), col("event_id"), gapSec = 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(unix_micros(col("ts"))).as("session_start_us"),
           max(unix_micros(col("ts"))).as("session_end_us"),
           count(lit(1)).as("n_events"),
           sum(money(col("value"))).cast("double").as("sum_value")),
    Some("""
      WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events),
      l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                        AS prev FROM e),
      f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                           THEN 1 ELSE 0 END AS flag FROM l),
      s AS (SELECT *, SUM(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             min(us) AS session_start_us, max(us) AS session_end_us,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM s GROUP BY user_id, session_id"""))

  val all: Seq[QueryDef] = Seq(
    q30, q31, q32, q33, q34, q35, q36, q37, q38, q39, q40, q41)
}
