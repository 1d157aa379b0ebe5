package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Cleaning, Corpus, EventOps, RangeJoin}

/** Round-2 second wave: range joins (the binned equi-join formulation —
  * Spark's own BETWEEN-join plan is a nested loop), ordered-funnel and
  * retention analytics over the events stream, end-to-end duplicate
  * resolution, CCNet-style paragraph dedup, and Unicode text
  * normalization via the native `unicode_normalize` expression.
  */
object R3Queries {

  /** The q78/q85 shared fixture: ±30 s windows around error events (the
    * intervals) and purchase instants (the points), second granularity —
    * one definition so the hand-binned operator (q78) and the
    * rule-rewritten plain join (q85) provably query the same frames. */
  private def errorWindowsAndPurchases(s: org.apache.spark.sql.SparkSession,
                                       d: String) = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"),
        (unix_timestamp(col("ts")) - 30).as("lo"),
        (unix_timestamp(col("ts")) + 30).as("hi"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        unix_timestamp(col("ts")).as("pt"))
    (errors, purchases)
  }

  /** Same SQL for q78 and q85: same semantics, two execution paths. */
  private val oRangeJoinSql = """
      WITH e AS (SELECT event_id, event_type,
                        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
      SELECT p.event_id AS purchase_id, x.event_id AS error_id,
             p.sec - x.sec AS delta_sec
      FROM e p JOIN e x
        ON p.event_type = 'purchase' AND x.event_type = 'error'
       AND p.sec BETWEEN x.sec - 30 AND x.sec + 30"""

  /** Point-in-interval range join: purchases within ±30 s of an error
    * event. The binned plan is a shuffled HASH join on `__bin` with the
    * BETWEEN as residual — never a nested loop. Second-granularity
    * timestamps on both sides (q39's epoch convention). */
  private val q78 = QueryDef(
    "q78_range_join",
    (s, d) => {
      val (errors, purchases) = errorWindowsAndPurchases(s, d)
      RangeJoin.pointInInterval(purchases, "pt", errors, "lo", "hi",
          binWidth = 60)
        .select(col("purchase_id"), col("error_id"),
          (col("pt") - col("lo") - 30).as("delta_sec"))
    },
    Some(oRangeJoinSql))

  /** Interval-overlap range join: ±30 s windows around errors vs around
    * purchases; a pair matches once (left-edge-bin dedup rule), exactly
    * the inequality join's row set. */
  private val q79 = QueryDef(
    "q79_interval_overlap",
    (s, d) => {
      val ev = Tables.events(s, d)
      def windows(tpe: String, idName: String, lo: String, hi: String) =
        ev.filter(col("event_type") === tpe)
          .select(col("event_id").as(idName),
            (unix_timestamp(col("ts")) - 30).as(lo),
            (unix_timestamp(col("ts")) + 30).as(hi))
      RangeJoin.intervalOverlap(
          windows("error", "error_id", "e_lo", "e_hi"), "e_lo", "e_hi",
          windows("purchase", "purchase_id", "p_lo", "p_hi"), "p_lo", "p_hi",
          binWidth = 60)
        .select(col("error_id"), col("purchase_id"))
    },
    Some("""
      WITH e AS (SELECT event_id, event_type,
                        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
      SELECT x.event_id AS error_id, p.event_id AS purchase_id
      FROM e x JOIN e p
        ON x.event_type = 'error' AND p.event_type = 'purchase'
       AND x.sec - 30 <= p.sec + 30 AND p.sec - 30 <= x.sec + 30"""))

  /** Ordered funnel signup → click → purchase: step i counts only events
    * at or after the user's step i-1 instant. Second-granularity
    * timestamps so both engines resolve same-second ties identically. */
  private val q80 = QueryDef(
    "q80_funnel",
    (s, d) => EventOps.funnelCounts(Tables.events(s, d), col("user_id"),
      timestamp_seconds(unix_timestamp(col("ts"))),
      Seq(EventOps.Step("signup", col("event_type") === "signup"),
        EventOps.Step("click", col("event_type") === "click"),
        EventOps.Step("purchase", col("event_type") === "purchase"))),
    Some("""
      WITH e AS (SELECT user_id, event_type,
                        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      s1 AS (SELECT user_id, min(sec) AS t FROM e
             WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.sec) AS t FROM e
             JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click' AND e.sec >= s1.t GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.sec) AS t FROM e
             JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.sec >= s2.t GROUP BY 1),
      n AS (SELECT (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s3) AS n3)
      SELECT 1 AS step, 'signup' AS step_name, n1 AS n_users,
             CAST(n1 AS DOUBLE) / n1 AS conversion FROM n
      UNION ALL SELECT 2, 'click', n2, CAST(n2 AS DOUBLE) / n1 FROM n
      UNION ALL SELECT 3, 'purchase', n3, CAST(n3 AS DOUBLE) / n1 FROM n"""))

  /** 30-day retention matrix: cohort = first active day per user, then
    * distinct active users per (cohort, day offset). */
  private val q81 = QueryDef(
    "q81_retention",
    (s, d) => EventOps.retention(Tables.events(s, d), col("user_id"),
      col("ts"), maxOffsetDays = 30),
    Some("""
      WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
      SELECT c.cohort_day, CAST(a.day - c.cohort_day AS INT) AS day_offset,
             count(DISTINCT a.user_id) AS n_users
      FROM a JOIN c ON a.user_id = c.user_id
      WHERE a.day - c.cohort_day <= 30
      GROUP BY 1, 2"""))

  /** End-to-end duplicate resolution: SimHash Hamming pairs → connected
    * components → keep the LONGEST doc per cluster (ties → min id). The
    * oracle recomputes the closure recursively and picks keepers with a
    * window — the full pipeline, differentially. */
  private val q82 = QueryDef(
    "q82_resolve_duplicates",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.resolveDuplicates(docs, "doc_id",
          Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
          "a_id", "b_id", prefer = Some(col("n_chars")))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("cluster_id"), col("cluster_size"))
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
                FROM edges e JOIN reach ON e.dst = reach.id),
      comp AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      j AS (SELECT d.doc_id, d.lang, d.source, d.n_chars, c.cluster_id,
                   row_number() OVER (PARTITION BY c.cluster_id
                     ORDER BY d.n_chars DESC, d.doc_id) AS rn,
                   count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
            FROM documents d JOIN comp c ON d.doc_id = c.doc_id)
      SELECT doc_id, lang, source, n_chars, cluster_id, cluster_size
      FROM j WHERE rn = 1"""))

  /** The q83/q87 shared paragraphizer: the corpus text is single-line, so
    * both engines first break it into 3-token "paragraphs" with the same
    * regex rewrite — defined once so the two paragraph operators provably
    * see identical paragraph streams. */
  private def paragraphized(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(col("doc_id"),
      regexp_replace(col("text"), "((\\S+ ){2}\\S+) ", "$1\n").as("text"))

  /** DuckDB twin of [[paragraphized]] + explode: CTEs ending at `p`
    * (doc_id, idx, para). Plain-quoted so the `\S`/`\1` stay literal. */
  private val oParagraphCtes = """t AS (SELECT doc_id,
             regexp_replace(text, '((\S+ ){2}\S+) ', '\1' || chr(10), 'g') AS tx
             FROM documents),
      s AS (SELECT doc_id, string_split(tx, chr(10)) AS ps FROM t),
      e AS (SELECT doc_id, unnest(range(1, len(ps) + 1)) AS idx, ps FROM s),
      p AS (SELECT doc_id, idx, ps[idx] AS para FROM e
            WHERE len(ps[idx]) > 0)"""

  /** CCNet-style paragraph dedup: across the corpus each distinct
    * paragraph survives only at its first (doc_id, idx) occurrence. */
  private val q83 = QueryDef(
    "q83_paragraph_dedup",
    (s, d) => Corpus.dedupParagraphs(paragraphized(s, d), "doc_id", "text"),
    Some(s"""
      WITH $oParagraphCtes,
      r AS (SELECT doc_id, idx, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS occ
            FROM p),
      g AS (SELECT doc_id,
             string_agg(CASE WHEN occ = 1 THEN para END, chr(10) ORDER BY idx)
               AS text,
             count(CASE WHEN occ = 1 THEN 1 END) AS n_para_kept,
             count(CASE WHEN occ <> 1 THEN 1 END) AS n_para_dropped
            FROM r GROUP BY doc_id)
      SELECT d.doc_id, coalesce(g.text, '') AS text,
             coalesce(g.n_para_kept, 0) AS n_para_kept,
             coalesce(g.n_para_dropped, 0) AS n_para_dropped
      FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id"""))

  /** Unicode normalization round-trip: uppercase the corpus, accent every
    * E (Spark injects the COMPOSED form U+00C9; the oracle injects the
    * DECOMPOSED E+U+0301 — different byte sequences for the same glyph),
    * double all spaces — then `Cleaning.normalizeText` must reproduce the
    * original text exactly on both engines. Exercises NFD/NFC,
    * combining-mark stripping, case folding and whitespace collapse
    * against DuckDB's independent nfc_normalize/strip_accents
    * implementation. */
  private val q84 = QueryDef(
    "q84_normalize_text",
    (s, d) => {
      GraftExtensions.register(s)
      val docs = Tables.documents(s, d)
      val messy = regexp_replace(
        regexp_replace(upper(col("text")), "E", "É"), " ", "  ")
      docs.select(col("doc_id"),
          Cleaning.normalizeText(messy).as("norm_text"), col("text"))
        .withColumn("roundtrip_ok", col("norm_text") === col("text"))
        .drop("text")
    },
    Some("""
      WITH m AS (SELECT doc_id, text,
             replace(replace(upper(text), 'E', 'E' || chr(769)), ' ', '  ')
               AS messy FROM documents),
      n AS (SELECT doc_id, text,
             trim(regexp_replace(lower(strip_accents(nfc_normalize(messy))),
               '\s+', ' ', 'g')) AS norm_text FROM m)
      SELECT doc_id, norm_text, (norm_text = text) AS roundtrip_ok FROM n"""))

  /** The SAME join as q78 written as a plain inequality join — no manual
    * binning — accelerated transparently by
    * [[graft.plans.RangeJoinRule]]. The rule + conf are installed on an
    * ISOLATED child session (`newSession()`: own SQLConf and
    * experimental methods, shared SparkContext), so the caller's session
    * never changes behavior — an armed rewrite rule with a
    * domain-specific bin width must not leak into unrelated queries.
    * Same oracle as q78: the rewrite must be invisible in the result. */
  private val q85 = QueryDef(
    "q85_range_join_rule",
    (s, d) => {
      import graft.plans.RangeJoinRule
      val iso = s.newSession()
      iso.experimental.extraOptimizations =
        iso.experimental.extraOptimizations :+ RangeJoinRule
      iso.conf.set(RangeJoinRule.BinWidthConf, "60")
      iso.conf.set(Tables.NanosConf, "true") // newSession inherits only
      // builder-time confs; be explicit rather than depend on that
      val (errors, purchases) = errorWindowsAndPurchases(iso, d)
      purchases.join(errors, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select(col("purchase_id"), col("error_id"),
          (col("pt") - col("lo") - 30).as("delta_sec"))
    },
    Some(oRangeJoinSql))

  /** q80 with a 1-hour conversion window per transition: each step must
    * happen within 3600 s of the previous one, not just after it. */
  private val q86 = QueryDef(
    "q86_funnel_within",
    (s, d) => EventOps.funnelCounts(Tables.events(s, d), col("user_id"),
      timestamp_seconds(unix_timestamp(col("ts"))),
      Seq(EventOps.Step("signup", col("event_type") === "signup"),
        EventOps.Step("click", col("event_type") === "click"),
        EventOps.Step("purchase", col("event_type") === "purchase")),
      withinSec = Some(3600L)),
    Some("""
      WITH e AS (SELECT user_id, event_type,
                        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      s1 AS (SELECT user_id, min(sec) AS t FROM e
             WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.sec) AS t FROM e
             JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'click'
               AND e.sec >= s1.t AND e.sec <= s1.t + 3600 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.sec) AS t FROM e
             JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase'
               AND e.sec >= s2.t AND e.sec <= s2.t + 3600 GROUP BY 1),
      n AS (SELECT (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s3) AS n3)
      SELECT 1 AS step, 'signup' AS step_name, n1 AS n_users,
             CAST(n1 AS DOUBLE) / n1 AS conversion FROM n
      UNION ALL SELECT 2, 'click', n2, CAST(n2 AS DOUBLE) / n1 FROM n
      UNION ALL SELECT 3, 'purchase', n3, CAST(n3 AS DOUBLE) / n1 FROM n"""))

  /** Boilerplate kill: 3-token paragraphs appearing in more than 2
    * distinct documents vanish from every document. */
  private val q87 = QueryDef(
    "q87_drop_boilerplate",
    (s, d) => Corpus.dropBoilerplateParagraphs(paragraphized(s, d),
      "doc_id", "text", maxDocFrequency = 2),
    Some(s"""
      WITH $oParagraphCtes,
      f AS (SELECT para, count(DISTINCT doc_id) AS df FROM p GROUP BY 1),
      k AS (SELECT p.doc_id, p.idx, p.para, (f.df <= 2) AS keep
            FROM p JOIN f ON p.para = f.para),
      g AS (SELECT doc_id,
             string_agg(CASE WHEN keep THEN para END, chr(10) ORDER BY idx)
               AS text,
             count(CASE WHEN keep THEN 1 END) AS n_para_kept,
             count(CASE WHEN NOT keep THEN 1 END) AS n_para_dropped
            FROM k GROUP BY doc_id)
      SELECT d.doc_id, coalesce(g.text, '') AS text,
             coalesce(g.n_para_kept, 0) AS n_para_kept,
             coalesce(g.n_para_dropped, 0) AS n_para_dropped
      FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id"""))

  val all: Seq[QueryDef] = Seq(q78, q79, q80, q81, q82, q83, q84, q85,
    q86, q87)
}
