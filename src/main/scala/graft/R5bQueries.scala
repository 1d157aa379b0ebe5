package graft

import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Corpus, EventOps, NearDup, Sketches, Windows}

/** Round-5 wave 2: LM-based corpus quality, sketch-based source overlap,
  * LSH calibration, product growth accounting, attribution, journey
  * mining, and trailing trend slopes.
  */
object R5bQueries {

  private def dstr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")
  private def money(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  /** Per-document unigram cross-entropy (LM quality score). The scaled-
    * integer log-prob sum (see the operator's determinism contract) is
    * replayed verbatim in DuckDB: same floor(ln·2^30) grid, same BIGINT
    * accumulation, same final two divisions. */
  private val q140 = QueryDef(
    "q140_unigram_ce",
    (s, d) => Corpus.unigramCrossEntropy(Tables.documents(s, d),
      "doc_id", "text"),
    Some(s"""
      WITH dt AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
            FROM documents),
      c AS (SELECT doc_id, token, count(*) AS cnt FROM dt GROUP BY 1, 2),
      v AS (SELECT token, sum(cnt) AS gcnt FROM c GROUP BY token),
      tot AS (SELECT sum(gcnt) AS total FROM v),
      lp AS (SELECT token,
              CAST(floor(ln(CAST(gcnt AS DOUBLE) / CAST(total AS DOUBLE))
                * 1073741824.0) AS BIGINT) AS lps
             FROM v CROSS JOIN tot)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             (-(CAST(sum(cnt * lps) AS DOUBLE) / 1073741824.0))
               / CAST(sum(cnt) AS DOUBLE) AS cross_entropy_nats
      FROM c JOIN lp USING (token)
      GROUP BY doc_id"""))

  private val OverlapK = 256

  /** Bottom-k sketch estimate of pairwise source token overlap. The
    * whole estimator — md5 bottom-k per source, union bottom-k, shared
    * count — is replayed in DuckDB, so the approximation itself is
    * differentially verified (the q132 discipline). */
  private val q141 = QueryDef(
    "q141_source_overlap_sketch",
    (s, d) => Sketches.kmvPairwiseOverlap(
      Tables.documents(s, d)
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("token")),
      "source", "token", OverlapK),
    Some(s"""
      WITH tok AS (SELECT source AS g, unnest(${ExtQueries.oToks("text")})
                AS v
             FROM documents WHERE source IS NOT NULL),
      h AS (SELECT DISTINCT g, md5(v) AS h FROM tok),
      sk AS (SELECT g, h FROM (
               SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h)
                 AS rn FROM h)
             WHERE rn <= $OverlapK),
      gs AS (SELECT DISTINCT g FROM sk),
      pr AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
      u AS (SELECT ga, gb, h,
              max(CASE WHEN sk.g = ga THEN 1 ELSE 0 END) AS ina,
              max(CASE WHEN sk.g = gb THEN 1 ELSE 0 END) AS inb
            FROM pr JOIN sk ON sk.g = pr.ga OR sk.g = pr.gb
            GROUP BY 1, 2, 3),
      r AS (SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h)
              AS urn FROM u)
      SELECT ga AS group_a, gb AS group_b,
             CAST(count(*) AS BIGINT) AS k_used,
             CAST(sum(ina * inb) AS BIGINT) AS n_shared_in_union_k,
             CAST(sum(ina * inb) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS jaccard_est
      FROM r WHERE urn <= $OverlapK GROUP BY ga, gb"""))

  private val RecallTau = 0.25
  private val RecallHashes = 12
  private val RecallBand = 3

  /** LSH banding calibration: recall/precision of 12-hash/3-row MinHash
    * candidates against the exact Jaccard >= 0.25 ground truth — a
    * threshold well BELOW the banding's s-curve midpoint ((1/4)^(1/3) ≈
    * 0.63), so missed pairs would show up as recall < 1. The synthetic
    * corpus's near-dup pairs are all high-Jaccard, so recall is 1.0
    * here; the differential check verifies the measurement machinery,
    * and the spec covers the recall < 1 regime with a planted fixture. */
  private val q142 = QueryDef(
    "q142_lsh_recall",
    (s, d) => NearDup.lshRecallReport(Tables.documents(s, d), "doc_id",
      "text", shingleN = 3, numHashes = RecallHashes, bandSize = RecallBand,
      threshold = RecallTau),
    Some {
      val sigCols = (0 until RecallHashes).map(i =>
        s"list_aggregate(list_transform(sh, x -> md5('$i|' || x)), 'min') AS sig_$i")
        .mkString(",\n             ")
      val bandSelects = (0 until RecallHashes / RecallBand).map { b =>
        val sigs = (0 until RecallBand).map(k => s"sig_${b * RecallBand + k}")
          .mkString(", ")
        s"SELECT doc_id, $b AS band_id, md5(concat_ws(',', $sigs)) AS band_key FROM sigs"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)})
               AS sh
             FROM t WHERE len(w) >= 3),
      sh AS (SELECT doc_id, unnest(sh) AS s FROM ws),
      sz AS (SELECT doc_id, len(sh) AS n_sh FROM ws),
      ip AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               COUNT(*) AS i
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      truth AS (SELECT a_id, b_id FROM ip
                JOIN sz sa ON a_id = sa.doc_id
                JOIN sz sb ON b_id = sb.doc_id
                WHERE CAST(i AS DOUBLE) /
                  CAST(sa.n_sh + sb.n_sh - i AS DOUBLE) >= $RecallTau),
      sigs AS MATERIALIZED (SELECT doc_id,
             $sigCols
      FROM ws),
      bands0 AS (
        $bandSelects),
      bands AS (
        -- the candidate side's default-on hot-band cap, modeled (see q35)
        SELECT doc_id, band_id, band_key FROM bands0
        QUALIFY count(*) OVER (PARTITION BY band_id, band_key)
          <= ${graft.operators.NearDup.DefaultMaxBandBucket}),
      cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
               FROM bands x JOIN bands y
                 ON x.band_id = y.band_id AND x.band_key = y.band_key
                AND x.doc_id < y.doc_id),
      hits AS (SELECT * FROM truth INTERSECT SELECT * FROM cand)
      SELECT CAST($RecallTau AS DOUBLE) AS threshold,
             (SELECT count(*) FROM truth) AS n_true_pairs,
             (SELECT count(*) FROM cand) AS n_candidate_pairs,
             (SELECT count(*) FROM hits) AS n_hits,
             CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
               CAST((SELECT count(*) FROM hits) AS DOUBLE) /
               CAST((SELECT count(*) FROM truth) AS DOUBLE) END AS recall,
             CASE WHEN (SELECT count(*) FROM cand) > 0 THEN
               CAST((SELECT count(*) FROM hits) AS DOUBLE) /
               CAST((SELECT count(*) FROM cand) AS DOUBLE) END AS precision"""
    })

  /** Daily growth accounting over the event stream: new / retained /
    * resurrected actives plus churn attributed to the day after the
    * user's last active day. */
  private val q143 = QueryDef(
    "q143_growth_accounting",
    (s, d) => EventOps.growthAccounting(Tables.events(s, d),
        col("user_id"), col("ts"))
      .select(dstr(col("day")).as("day"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"), col("n_churned")),
    Some("""
      WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      f AS (SELECT u, d,
              lag(d) OVER (PARTITION BY u ORDER BY d) AS prev,
              lead(d) OVER (PARTITION BY u ORDER BY d) AS next
            FROM ud),
      act AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS n_active,
              CAST(count(*) FILTER (WHERE prev IS NULL) AS BIGINT) AS n_new,
              CAST(count(*) FILTER (WHERE prev = d - 1) AS BIGINT)
                AS n_retained,
              CAST(count(*) FILTER (WHERE prev IS NOT NULL AND prev < d - 1)
                AS BIGINT) AS n_resurrected
            FROM f GROUP BY 1),
      lastd AS (SELECT max(d) AS lastd FROM ud),
      ch AS (SELECT d + 1 AS day, CAST(count(*) AS BIGINT) AS n_churned
             FROM f CROSS JOIN lastd
             WHERE (next IS NULL OR next > d + 1) AND d + 1 <= lastd
             GROUP BY 1)
      SELECT strftime(COALESCE(act.day, ch.day), '%Y-%m-%d') AS day,
             COALESCE(n_active, 0) AS n_active,
             COALESCE(n_new, 0) AS n_new,
             COALESCE(n_retained, 0) AS n_retained,
             COALESCE(n_resurrected, 0) AS n_resurrected,
             COALESCE(n_churned, 0) AS n_churned
      FROM act FULL OUTER JOIN ch ON act.day = ch.day"""))

  private val AttrWindowSec = 86400L

  /** Last-touch attribution: purchases credited to the user's most
    * recent view/click within 24 h, else "direct". */
  private val q144 = QueryDef(
    "q144_last_touch_attribution",
    (s, d) => EventOps.lastTouchAttribution(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_id"), col("event_type"),
      touchTypes = Seq("view", "click"), convType = "purchase",
      valueCol = col("value"), windowSec = AttrWindowSec),
    Some(s"""
      WITH e AS (SELECT user_id, event_id, event_type, value,
              epoch_us(ts) AS us,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isconv
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')),
      wd AS (SELECT *,
              last_value(CASE WHEN isconv = 0 THEN event_type END
                IGNORE NULLS) OVER (PARTITION BY user_id
                ORDER BY us, isconv, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS touch_ty,
              last_value(CASE WHEN isconv = 0 THEN us END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY us, isconv, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS touch_us
            FROM e)
      SELECT CASE WHEN touch_us IS NOT NULL
                   AND us - touch_us <= ${AttrWindowSec * 1000000L}
                  THEN touch_ty ELSE 'direct' END AS channel,
             CAST(count(*) AS BIGINT) AS n_conversions,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS attributed_value
      FROM wd WHERE isconv = 1 GROUP BY 1"""))

  private val PathSteps = 5
  private val PathK = 20

  /** Top-20 session journeys: first 5 event types per 30-min session. */
  private val q145 = QueryDef(
    "q145_top_paths",
    (s, d) => EventOps.topPaths(Tables.events(s, d), col("user_id"),
      col("ts"), col("event_id"), col("event_type"), gapSec = 1800,
      maxSteps = PathSteps, k = PathK),
    Some(s"""
      WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
            FROM events),
      l AS (SELECT *, lag(us) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS prev FROM e),
      f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                           THEN 1 ELSE 0 END AS flag FROM l),
      sess AS (SELECT *, SUM(flag) OVER (PARTITION BY user_id
                 ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                 AS session_id FROM f),
      st AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
               ORDER BY us, event_id) AS step FROM sess),
      p AS (SELECT user_id, session_id,
              string_agg(event_type, '>' ORDER BY us, event_id) AS path
            FROM st WHERE step <= $PathSteps GROUP BY 1, 2),
      c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM p GROUP BY 1),
      r AS (SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path)
              AS rank FROM c)
      SELECT path, n_sessions, CAST(rank AS INT) AS rank
      FROM r WHERE rank <= $PathK"""))

  private val SlopeDays = 7

  /** Trailing 7-day revenue trend slope per order priority — the exact-
    * arithmetic OLS window (see Windows.trailingSlope). */
  private val q146 = QueryDef(
    "q146_trend_slope",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull)
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).as("rev"))
      Windows.trailingSlope(daily, Seq("priority"), "day", "rev",
          windowDays = SlopeDays)
        .select(col("priority"), dstr(col("day")).as("day"),
          col("rev").cast("double").as("daily_rev"), col("slope"))
    },
    Some(s"""
      WITH daily AS (SELECT o_orderpriority AS priority,
              CAST(o_orderdate AS DATE) AS day,
              sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
      x AS (SELECT *, datediff('day', DATE '1970-01-01', day) AS x
            FROM daily),
      w AS (SELECT priority, day, rev,
              count(*) OVER win AS n,
              sum(x) OVER win AS sx,
              sum(x * x) OVER win AS sx2,
              sum(rev) OVER win AS sy,
              sum(rev * CAST(x AS DECIMAL(18,0))) OVER win AS sxy
            FROM x
            WINDOW win AS (PARTITION BY priority ORDER BY x
              RANGE BETWEEN ${SlopeDays - 1} PRECEDING AND CURRENT ROW))
      SELECT priority, strftime(day, '%Y-%m-%d') AS day,
             CAST(rev AS DOUBLE) AS daily_rev,
             CASE WHEN n * sx2 - sx * sx > 0 THEN
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / CAST(n * sx2 - sx * sx AS DOUBLE) END AS slope
      FROM w"""))

  val all: Seq[QueryDef] =
    Seq(q140, q141, q142, q143, q144, q145, q146)
}
