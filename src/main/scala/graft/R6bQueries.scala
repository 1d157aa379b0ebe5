package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Linkage, NearDup, Skyline}

/** Round-6 wave 4: span-level reuse attribution, probabilistic linkage
  * weights, and the Pareto-frontier (skyline) operator.
  *
  * q190 answers the attribution/contamination question near-dup scoring
  * misses (a short quoted span never clears a Jaccard threshold); q191
  * turns the blocking machinery (q184/q185) into Fellegi–Sunter match
  * evidence; q192 adds the classic "best tradeoff" OLAP operator the
  * reference's single-measure dashboard rankings cannot express.
  */
object R6bQueries {

  /** Shared winnowing CTEs (q56's fingerprint pipeline: 3-word shingles,
    * window 4) ending in `fp(doc_id, fingerprint)`. */
  private val oWinnowCtes = """
      t AS (SELECT doc_id,
              list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
            FROM documents),
      sh AS (SELECT doc_id,
               list_transform(range(1, len(w) - 1),
                 i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS h
             FROM t WHERE len(w) >= 3),
      wins AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(h) - 2),
                   i -> list_aggregate(h[i:i+3], 'min'))) AS fps
               FROM sh WHERE len(h) >= 4),
      fp AS MATERIALIZED (SELECT doc_id, unnest(fps) AS fingerprint
                          FROM wins)"""

  /** Cross-document verbatim span reuse over df-capped winnowing
    * fingerprints (NearDup.winnowReusePairs; reuse = shared hits over
    * the smaller fingerprint set). */
  private val q190 = QueryDef(
    "q190_span_reuse",
    (s, d) => NearDup.winnowReusePairs(
      Tables.documents(s, d).filter(col("text").isNotNull),
      "doc_id", "text", k = 3, w = 4, maxDf = 16, minShared = 3),
    Some(s"""
      WITH $oWinnowCtes,
      hot AS MATERIALIZED (SELECT fingerprint FROM fp GROUP BY 1 HAVING COUNT(*) > 16),
      kept AS MATERIALIZED (SELECT fp.doc_id, fp.fingerprint FROM fp
            WHERE NOT EXISTS (SELECT 1 FROM hot
                              WHERE hot.fingerprint = fp.fingerprint)),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM kept GROUP BY 1),
      pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              CAST(COUNT(*) AS BIGINT) AS shared
            FROM kept a JOIN kept b
              ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      SELECT pr.a_id, pr.b_id, pr.shared, sa.n AS n_a, sb.n AS n_b,
        CAST(pr.shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)
          AS reuse
      FROM pr JOIN sz sa ON sa.doc_id = pr.a_id
              JOIN sz sb ON sb.doc_id = pr.b_id"""))

  /** Fellegi–Sunter per-field match weights estimated from labeled pair
    * sets: matches = exact-text duplicate pairs, non-matches =
    * hash-order sorted-neighborhood pairs (deterministic pseudo-random
    * adjacencies) minus any true dups. Fields: source / lang equality,
    * length proximity, 20-char prefix equality. */
  private val q191 = QueryDef(
    "q191_linkage_weights",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val attrs = docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), substring(col("text"), 1, 20).as("pfx"),
        md5(col("text")).as("__h"))
      val matches = attrs.as("a").join(attrs.as("b"),
          col("a.__h") === col("b.__h") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          lit(true).as("is_match"))
      val rand = NearDup.sortedNeighborhoodPairs(docs, "doc_id",
          md5(col("doc_id").cast("string")), window = 2)
        .select(least(col("a_id"), col("b_id")).as("a_id"),
          greatest(col("a_id"), col("b_id")).as("b_id"))
      val unmatches = rand.join(matches.select(col("a_id"), col("b_id")),
          Seq("a_id", "b_id"), "left_anti")
        .withColumn("is_match", lit(false))
      val pairs = matches.unionByName(unmatches)
      def eq2(c: String): org.apache.spark.sql.Column =
        col(s"da.$c").isNotNull && col(s"db.$c").isNotNull &&
          col(s"da.$c") === col(s"db.$c")
      val labeled = pairs
        .join(attrs.as("da"), col("da.doc_id") === col("a_id"))
        .join(attrs.as("db"), col("db.doc_id") === col("b_id"))
        .select(col("is_match"),
          eq2("source").as("source_eq"),
          eq2("lang").as("lang_eq"),
          (col("da.n_chars").isNotNull && col("db.n_chars").isNotNull &&
            abs(col("da.n_chars") - col("db.n_chars")) <= 50)
            .as("len_close"),
          eq2("pfx").as("prefix_eq"))
      Linkage.fellegiSunterWeights(labeled, "is_match",
        Seq("source_eq", "lang_eq", "len_close", "prefix_eq"))
    },
    Some("""
      WITH d AS MATERIALIZED (SELECT doc_id, source, lang, n_chars,
              substr(text, 1, 20) AS pfx, md5(text) AS h,
              md5(CAST(doc_id AS VARCHAR)) AS rk
            FROM documents WHERE text IS NOT NULL),
      m AS MATERIALIZED (SELECT a.doc_id AS a_id, b.doc_id AS b_id, TRUE AS is_match
            FROM d a JOIN d b ON a.h = b.h AND a.doc_id < b.doc_id),
      r AS (SELECT doc_id, row_number() OVER (ORDER BY rk, doc_id) AS rn
            FROM d),
      rp AS (SELECT least(a.doc_id, b.doc_id) AS a_id,
              greatest(a.doc_id, b.doc_id) AS b_id
            FROM r a JOIN r b ON b.rn = a.rn + 1),
      u AS (SELECT rp.a_id, rp.b_id, FALSE AS is_match FROM rp
            WHERE NOT EXISTS (SELECT 1 FROM m
                              WHERE m.a_id = rp.a_id AND m.b_id = rp.b_id)),
      p AS (SELECT * FROM m UNION ALL SELECT * FROM u),
      j AS MATERIALIZED (SELECT p.is_match,
              (da.source IS NOT NULL AND db.source IS NOT NULL
                AND da.source = db.source) AS source_eq,
              (da.lang IS NOT NULL AND db.lang IS NOT NULL
                AND da.lang = db.lang) AS lang_eq,
              (da.n_chars IS NOT NULL AND db.n_chars IS NOT NULL
                AND abs(da.n_chars - db.n_chars) <= 50) AS len_close,
              (da.pfx IS NOT NULL AND db.pfx IS NOT NULL
                AND da.pfx = db.pfx) AS prefix_eq
            FROM p JOIN d da ON da.doc_id = p.a_id
                   JOIN d db ON db.doc_id = p.b_id),
      f AS (SELECT 'source_eq' AS field, source_eq AS agree, is_match FROM j
            UNION ALL SELECT 'lang_eq', lang_eq, is_match FROM j
            UNION ALL SELECT 'len_close', len_close, is_match FROM j
            UNION ALL SELECT 'prefix_eq', prefix_eq, is_match FROM j),
      g AS (SELECT field,
              CAST(SUM(CASE WHEN is_match AND agree THEN 1 ELSE 0 END)
                AS BIGINT) AS m_agree,
              CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match,
              CAST(SUM(CASE WHEN NOT is_match AND agree THEN 1 ELSE 0 END)
                AS BIGINT) AS u_agree,
              CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unmatch
            FROM f GROUP BY 1)
      SELECT field, m_agree, n_match, u_agree, n_unmatch,
        CAST(m_agree + 1 AS DOUBLE) / CAST(n_match + 2 AS DOUBLE) AS m_prob,
        CAST(u_agree + 1 AS DOUBLE) / CAST(n_unmatch + 2 AS DOUBLE)
          AS u_prob,
        CAST((m_agree + 1) * (n_unmatch + 2) AS DOUBLE)
          / CAST((n_match + 2) * (u_agree + 1) AS DOUBLE) AS weight_ratio
      FROM g"""))

  /** Pareto frontier of customers on (exact decimal revenue, order
    * count) — the joint-best set no weighted ranking can produce. */
  private val q192 = QueryDef(
    "q192_pareto_frontier",
    (s, d) => {
      val g = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("__rev"),
          count(lit(1)).as("n_orders"))
      Skyline.paretoFrontier2D(g, col("__rev"), col("n_orders"))
        .select(col("o_custkey"), col("__rev").cast("double").as("revenue"),
          col("n_orders"))
    },
    Some("""
      WITH g AS (SELECT o_custkey,
              SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
              CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1)
      SELECT o_custkey, CAST(rev AS DOUBLE) AS revenue, n_orders
      FROM g p
      WHERE NOT EXISTS (SELECT 1 FROM g q
              WHERE q.rev >= p.rev AND q.n_orders >= p.n_orders
                AND (q.rev > p.rev OR q.n_orders > p.n_orders))"""))

  val all: Seq[QueryDef] = Seq(q190, q191, q192)
}
