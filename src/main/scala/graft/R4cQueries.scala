package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Corpus, NearDup, Quality, Retrieval, Windows}

/** Round-4 wave 4: exact-substring span profiling, deterministic BM25
  * retrieval, the exact (lossless) prefix-filter set-similarity join,
  * gaps-and-islands streaks, blocked edit-distance linkage, exact-moment
  * statistics, and the distribution-rank window suite. Numeric discipline
  * as repo-wide: integer-exact counts, single-division ratios, in-order
  * float folds over exact decimal sums, no transcendentals.
  */
object R4cQueries {

  private val SpanLen = 8

  /** Span-granular exact-duplication profile (the Lee-et-al-style exact
    * substring dedup signal, at `SpanLen`-token span granularity). */
  private val q106 = QueryDef(
    "q106_span_dedup",
    (s, d) => Corpus.spanDuplication(Tables.documents(s, d),
      "doc_id", "text", spanLen = SpanLen),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      sp AS (SELECT DISTINCT doc_id, span FROM (
               SELECT doc_id, unnest(${ExtQueries.oShingles("w", SpanLen)})
                 AS span
               FROM t WHERE len(w) >= $SpanLen)),
      dfc AS (SELECT span, count(*) AS nd FROM sp GROUP BY span),
      agg AS (SELECT sp.doc_id,
                CAST(count(*) AS INT) AS n_spans,
                CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_shared_spans
              FROM sp JOIN dfc USING (span) GROUP BY sp.doc_id)
      SELECT doc_id, n_spans, n_shared_spans,
             CAST(n_shared_spans AS DOUBLE) / n_spans AS dup_fraction
      FROM agg"""))

  private val Bm25Terms = Seq("customer", "vector", "hash", "join")
  private val Bm25K = 25
  // k1 = 1.5, b = 0.75: every derived literal (k1+1 = 2.5, 1-b = 0.25) is
  // exactly representable, so the oracle can spell the same constants
  private val Bm25K1 = 1.5
  private val Bm25B = 0.75

  /** Deterministic BM25 (rational idf — see Retrieval scaladoc) top-k. */
  private val q107 = QueryDef(
    "q107_bm25_topk",
    (s, d) => Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
      Bm25Terms, topK = Bm25K, k1 = Bm25K1, b = Bm25B),
    Some {
      val tfCols = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(w, x -> x = '$t')) AS tf_$i"
      }.mkString(",\n              ")
      val dfCols = Bm25Terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
        .mkString(",\n              ")
      // mirror the Spark expression tree exactly: idf * (tf * (k1+1)) /
      // (tf + k1 * ((1-b) + b * dl / avgdl)), folded left-to-right
      val score = Bm25Terms.indices.map { i =>
        s"""(((CAST(n_docs - df_$i AS DOUBLE) + 0.5) /
             (CAST(df_$i AS DOUBLE) + 0.5)) *
            (CAST(tf_$i AS DOUBLE) * CAST(2.5 AS DOUBLE)) /
            (CAST(tf_$i AS DOUBLE) + CAST(1.5 AS DOUBLE) *
              (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)))"""
      }.reduceLeft((a, b) => s"($a + $b)")
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      base AS (SELECT doc_id, CAST(len(w) AS INT) AS dl,
              $tfCols
            FROM t WHERE len(w) > 0),
      st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
              $dfCols
            FROM base),
      sc AS (SELECT doc_id, dl, $score AS score
             FROM base CROSS JOIN st)
      SELECT doc_id, dl, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
               AS rank
      FROM sc
      QUALIFY rank <= $Bm25K"""
    })

  // 15/16 — exactly representable, so the threshold compare cannot straddle
  // a decimal/double literal gap between engines
  private val PfjTau = 0.9375

  /** Exact prefix-filter set-similarity self-join: the oracle is the plain
    * all-pairs Jaccard — what it verifies is that the prefix filter is
    * LOSSLESS (recall 1.0), the property that separates it from LSH. */
  private val q108 = QueryDef(
    "q108_prefix_filter_join",
    (s, d) => NearDup.prefixFilterJoin(Tables.documents(s, d),
      "doc_id", "text", minJaccard = PfjTau),
    Some(s"""
      WITH t AS (SELECT doc_id,
              list_distinct(${ExtQueries.oToks("text")}) AS tk
            FROM documents),
      s AS (SELECT doc_id, tk, len(tk) AS m FROM t WHERE len(tk) > 0),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT) AS n_common,
              a.m AS ma, b.m AS mb
            FROM s a JOIN s b ON a.doc_id < b.doc_id)
      SELECT a_id, b_id, n_common,
             CAST(n_common AS DOUBLE) / (ma + mb - n_common) AS jaccard
      FROM p
      WHERE CAST(n_common AS DOUBLE) / (ma + mb - n_common) >=
            CAST($PfjTau AS DOUBLE)"""))

  /** Gaps-and-islands: consecutive-order-day streaks per customer (streaks
    * of >= 2 days; dates emitted as ISO strings per repo date discipline). */
  private val q109 = QueryDef(
    "q109_gaps_islands",
    (s, d) => Windows.gapsAndIslands(Tables.orders(s, d),
        "o_custkey", "o_orderdate")
      .filter(col("n_days") >= 2)
      .select(col("o_custkey"),
        date_format(col("streak_start"), "yyyy-MM-dd").as("streak_start"),
        date_format(col("streak_end"), "yyyy-MM-dd").as("streak_end"),
        col("n_days")),
    Some("""
      WITH d AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
                 FROM orders WHERE o_orderdate IS NOT NULL),
      i AS (SELECT o_custkey, d,
              d - CAST(row_number() OVER (
                PARTITION BY o_custkey ORDER BY d) AS INT) AS anchor
            FROM d)
      SELECT o_custkey,
             strftime(min(d), '%Y-%m-%d') AS streak_start,
             strftime(max(d), '%Y-%m-%d') AS streak_end,
             CAST(count(*) AS BIGINT) AS n_days
      FROM i GROUP BY o_custkey, anchor
      HAVING count(*) >= 2"""))

  private val FuzzyMaxDist = 4

  /** Blocked Levenshtein linkage over the distinct part-name vocabulary
    * (the oracle mirrors the first-char block, so what it checks is the
    * distance math and the in-block pairing). */
  private val q110 = QueryDef(
    "q110_fuzzy_pairs",
    (s, d) => NearDup.editDistancePairs(
      Tables.part(s, d).select(col("p_name")).distinct(),
      "p_name", "p_name", maxDist = FuzzyMaxDist),
    Some(s"""
      WITH n AS (SELECT DISTINCT p_name AS v FROM part
                 WHERE p_name IS NOT NULL AND len(p_name) > 0)
      SELECT a.v AS a_id, b.v AS b_id, a.v AS a_value, b.v AS b_value,
             CAST(levenshtein(a.v, b.v) AS INT) AS distance
      FROM n a JOIN n b
        ON lower(substr(a.v, 1, 1)) = lower(substr(b.v, 1, 1))
        AND a.v < b.v
        AND abs(len(a.v) - len(b.v)) <= $FuzzyMaxDist
      WHERE levenshtein(a.v, b.v) <= $FuzzyMaxDist"""))

  /** Exact-moment statistics: mean/stddev/skewness/corr from exact decimal
    * power sums (see Quality.exactMoments scaladoc for why the built-in
    * streaming moment aggregates cannot be oracle-checked). */
  private val q111 = QueryDef(
    "q111_exact_moments",
    (s, d) => Quality.exactMoments(Tables.lineitem(s, d),
      Seq("l_returnflag"), "l_extendedprice", "l_quantity"),
    Some("""
      WITH a AS (SELECT l_returnflag,
              CAST(count(*) AS BIGINT) AS n,
              SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS dsx,
              SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  CAST(l_extendedprice AS DECIMAL(12,2))) AS dsxx,
              SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
                       CAST(l_extendedprice AS DECIMAL(12,2))
                       AS DECIMAL(25,4)) *
                  CAST(l_extendedprice AS DECIMAL(12,2))) AS dsxxx,
              SUM(CAST(l_quantity AS DECIMAL(12,2))) AS dsy,
              SUM(CAST(l_quantity AS DECIMAL(12,2)) *
                  CAST(l_quantity AS DECIMAL(12,2))) AS dsyy,
              SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  CAST(l_quantity AS DECIMAL(12,2))) AS dsxy
            FROM lineitem GROUP BY l_returnflag),
      -- decimal -> double via VARCHAR: DuckDB's direct decimal->double
      -- cast double-rounds int128-backed decimals (raw > 2^53); strtod is
      -- correctly rounded, matching Spark's BigDecimal.doubleValue
      f AS (SELECT l_returnflag, n,
              CAST(n AS DOUBLE) AS nd,
              CAST(CAST(dsx AS VARCHAR) AS DOUBLE) AS sx,
              CAST(CAST(dsxx AS VARCHAR) AS DOUBLE) AS sxx,
              CAST(CAST(dsxxx AS VARCHAR) AS DOUBLE) AS sxxx,
              CAST(CAST(dsy AS VARCHAR) AS DOUBLE) AS sy,
              CAST(CAST(dsyy AS VARCHAR) AS DOUBLE) AS syy,
              CAST(CAST(dsxy AS VARCHAR) AS DOUBLE) AS sxy
            FROM a)
      SELECT l_returnflag, n,
             (sx / nd) AS mean_x,
             sqrt((nd * sxx - sx * sx) / nullif(nd * (nd - 1.0), 0.0))
               AS stddev_x,
             ((((sxxx / nd) - ((3.0 * (sx / nd)) * (sxx / nd))) +
               (((2.0 * (sx / nd)) * (sx / nd)) * (sx / nd))) /
              nullif((((sxx / nd) - ((sx / nd) * (sx / nd))) *
               sqrt((sxx / nd) - ((sx / nd) * (sx / nd)))), 0.0))
               AS skewness_x,
             ((nd * sxy - sx * sy) /
              nullif(sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy),
                0.0)) AS corr_xy
      FROM f"""))

  /** Distribution-rank window suite: quartile ntile + percent_rank +
    * cume_dist + dense_rank in one window, totally ordered so ntile is
    * well-defined (see Windows.rankSuite scaladoc). */
  private val q112 = QueryDef(
    "q112_rank_suite",
    (s, d) => Windows.rankSuite(
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_orderkey"),
        col("l_partkey"), col("l_linenumber"), col("l_extendedprice")),
      partition = Seq(col("l_returnflag")),
      ordering = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_partkey"), col("l_linenumber")),
      buckets = 4),
    Some("""
      SELECT l_returnflag, l_orderkey, l_partkey, l_linenumber,
             l_extendedprice,
             CAST(ntile(4) OVER w AS INT) AS bucket,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume_dist,
             CAST(dense_rank() OVER w AS INT) AS dense_rank
      FROM lineitem
      WINDOW w AS (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_partkey,
                            l_linenumber)"""))

  val all: Seq[QueryDef] =
    Seq(q106, q107, q108, q109, q110, q111, q112)
}
