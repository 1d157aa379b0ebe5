package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{AsOf, Corpus, EventOps, Windows}

/** Round-4 wave 7: pipeline monitoring (daily-volume anomalies),
  * cross-source score calibration, per-source vocabulary drift, and the
  * staleness-bounded as-of join. */
object R4fQueries {

  private val ZThresh = 2.0

  /** Daily event-volume z-scores per type (exact-moment discipline over
    * the per-day counts; dates emitted as ISO strings). */
  private val q120 = QueryDef(
    "q120_daily_anomaly",
    (s, d) => EventOps.dailyVolumeAnomaly(Tables.events(s, d), "ts",
        "event_type", zThreshold = ZThresh)
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("mean_daily"), col("stddev_daily"),
        col("z"), col("is_anomaly")),
    Some(s"""
      WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(count(*) AS BIGINT) AS n_events
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              SUM(CAST(n_events AS DECIMAL(18,0))) AS sc,
              SUM(CAST(n_events AS DECIMAL(18,0)) *
                  CAST(n_events AS DECIMAL(18,0))) AS scc
            FROM d GROUP BY 1),
      f AS (SELECT event_type, CAST(n AS DOUBLE) AS nd,
              CAST(sc AS DOUBLE) AS scd, CAST(scc AS DOUBLE) AS sccd
            FROM st)
      SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
             (scd / nd) AS mean_daily,
             sqrt((nd * sccd - scd * scd) / nullif(nd * (nd - 1.0), 0.0))
               AS stddev_daily,
             ((CAST(d.n_events AS DOUBLE) - (scd / nd)) /
              nullif(sqrt((nd * sccd - scd * scd) /
                nullif(nd * (nd - 1.0), 0.0)), 0.0)) AS z,
             (abs((CAST(d.n_events AS DOUBLE) - (scd / nd)) /
              nullif(sqrt((nd * sccd - scd * scd) /
                nullif(nd * (nd - 1.0), 0.0)), 0.0)) >
              CAST($ZThresh AS DOUBLE)) AS is_anomaly
      FROM d JOIN f USING (event_type)"""))

  /** Cross-source score calibration: percentile-rank each document's
    * length score WITHIN its source (rank-based normalization — the
    * per-source quantile mapping that makes quality thresholds comparable
    * across heterogeneous sources). Composition of Windows.rankSuite. */
  private val q121 = QueryDef(
    "q121_score_calibration",
    (s, d) => Windows.rankSuite(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        col("n_chars")),
      partition = Seq(col("source")),
      ordering = Seq(col("n_chars"), col("doc_id")),
      buckets = 4)
      .withColumn("keep", col("pct_rank") >= 0.5)
      .select(col("doc_id"), col("source"), col("n_chars"), col("bucket"),
        col("pct_rank"), col("keep")),
    Some("""
      SELECT doc_id, source, n_chars,
             CAST(ntile(4) OVER w AS INT) AS bucket,
             percent_rank() OVER w AS pct_rank,
             (percent_rank() OVER w >= CAST(0.5 AS DOUBLE)) AS keep
      FROM documents
      WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)"""))

  private val TopTermsK = 5

  /** Per-source top-k vocabulary (drift signal; WindowGroupLimit keeps the
    * rank cap below the exchange). */
  private val q122 = QueryDef(
    "q122_top_terms_per_source",
    (s, d) => Corpus.topTermsPerGroup(Tables.documents(s, d), "text",
        "source", k = TopTermsK)
      .withColumnRenamed("group", "source"),
    Some(s"""
      WITH t AS (SELECT source, unnest(${ExtQueries.oToks("text")}) AS token
                 FROM documents),
      c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM t GROUP BY 1, 2)
      SELECT source, token, n_occurrences,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n_occurrences DESC, token) AS INT) AS rank
      FROM c
      QUALIFY rank <= $TopTermsK"""))

  private val StaleSec = 600L

  /** Staleness-bounded as-of join: each click sees the user's most recent
    * view, but only if it is at most 10 minutes old — the
    * point-in-time-correct feature join with a freshness contract. */
  private val q123 = QueryDef(
    "q123_asof_tolerance",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      AsOf.join(clicks, views, Seq("user_id"),
          leftTs = col("ts"), rightTs = col("ts"),
          tiebreak = col("event_id"),
          payload = Seq("event_id", "value"),
          strict = false, maxStalenessSec = Some(StaleSec))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
          col("asof_event_id").as("view_event_id"),
          col("asof_value").as("view_value"))
    },
    Some(s"""
      SELECT c.event_id, c.user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
             (SELECT (max(struct_pack(ts := v.ts, tb := v.event_id,
                                      v := v.event_id))).v
              FROM events v
              WHERE v.user_id = c.user_id AND v.event_type = 'view'
                AND v.ts <= c.ts
                AND epoch_us(c.ts) - epoch_us(v.ts) <= $StaleSec * 1000000)
               AS view_event_id,
             (SELECT (max(struct_pack(ts := v.ts, tb := v.event_id,
                                      v := v.value))).v
              FROM events v
              WHERE v.user_id = c.user_id AND v.event_type = 'view'
                AND v.ts <= c.ts
                AND epoch_us(c.ts) - epoch_us(v.ts) <= $StaleSec * 1000000)
               AS view_value
      FROM events c WHERE c.event_type = 'click'"""))

  val all: Seq[QueryDef] = Seq(q120, q121, q122, q123)
}
