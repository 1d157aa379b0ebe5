package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{EventOps, Retrieval, Scale}

/** Round-6 wave 11: bitemporal restatement audit, position-based
  * attribution, PMI collocations.
  *
  * q211 answers "how much will yesterday's report restate once the
  * late 20% lands" — the bitemporal discipline the reference's audit
  * columns (load_ts) exist for; q212 fills the attribution spectrum
  * between last-touch (q144) and linear with the adtech-standard
  * U-shape; q213 mines collocations with the q57 raw-ratio (no-ln)
  * exactness convention.
  */
object R6iQueries {

  private def money(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  /** Report restatement audit: daily totals as known at the 80%
    * arrival cutoff (arrival = hash order, the q198 convention) vs
    * final, with the restated share. */
  private val q211 = QueryDef(
    "q211_restatement_audit",
    (s, d) => {
      val e = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("event_id"), col("ts"), col("value"),
          conv(substring(md5(col("event_id").cast("string")), 1, 12),
            16, 10).cast("long").as("__arr"))
      val ranked = Scale.globalRowNumber(e, "__arr", "event_id")
      val n = ranked.agg(count(lit(1)).as("__n"))
      val flagged = ranked.crossJoin(broadcast(n))
        .withColumn("__known", col("global_rn") <= expr("(__n * 8) div 10"))
      flagged.groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd")
          .as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(!col("__known"), 1L).otherwise(0L)).as("n_late"),
          sum(money(col("value"))).as("__tot"),
          sum(when(col("__known"), money(col("value")))).as("__ks"))
        .select(col("day"), col("n_events"), col("n_late"),
          col("__tot").cast("double").as("final_value"),
          coalesce(col("__ks"), lit(0).cast(DecimalType(18, 2)))
            .cast("double").as("known_value"),
          (col("__tot") - coalesce(col("__ks"),
            lit(0).cast(DecimalType(18, 2)))).cast("double")
            .as("restated_value"),
          when(col("__tot") === 0, lit(null).cast("double"))
            .otherwise((col("__tot") - coalesce(col("__ks"),
              lit(0).cast(DecimalType(18, 2)))).cast("double") /
              col("__tot").cast("double")).as("restated_share"))
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(event_id AS " +
          s"VARCHAR)), $j, 1)) - 1)"
      val hash48 = (0 until 12)
        .map(k => s"${BigInt(16).pow(11 - k)}*${nib(k + 1)}")
        .mkString(" + ")
      s"""
      WITH e AS (SELECT event_id, ts, value,
              CAST($hash48 AS BIGINT) AS arr
            FROM events WHERE ts IS NOT NULL),
      r AS (SELECT *, row_number() OVER (ORDER BY arr, event_id) AS rn,
              COUNT(*) OVER () AS n
            FROM e),
      f AS (SELECT *, rn <= (n * 8) // 10 AS known FROM r),
      g AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CASE WHEN NOT known THEN 1 ELSE 0 END) AS BIGINT)
                AS n_late,
              SUM(CAST(value AS DECIMAL(18,2))) AS tot,
              COALESCE(SUM(CASE WHEN known
                THEN CAST(value AS DECIMAL(18,2)) END),
                CAST(0 AS DECIMAL(18,2))) AS ks
            FROM f GROUP BY 1)
      SELECT day, n_events, n_late,
        CAST(tot AS DOUBLE) AS final_value,
        CAST(ks AS DOUBLE) AS known_value,
        CAST(tot - ks AS DOUBLE) AS restated_value,
        CASE WHEN tot = 0 THEN NULL
          ELSE CAST(tot - ks AS DOUBLE) / CAST(tot AS DOUBLE) END
          AS restated_share
      FROM g"""
    })

  private val AttrWindowSec = 86400L

  /** U-shaped multi-touch attribution over view/click touches before
    * each purchase (EventOps.positionBasedAttribution; exact 2^30-
    * scaled credits). */
  private val q212 = QueryDef(
    "q212_position_attribution",
    (s, d) => EventOps.positionBasedAttribution(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_id"), col("event_type"),
      touchTypes = Seq("view", "click"), convType = "purchase",
      windowSec = AttrWindowSec),
    Some(s"""
      WITH base AS (SELECT user_id AS u, event_id AS eid,
              event_type AS etype, epoch_us(ts) AS us
            FROM events),
      convs AS (SELECT u, eid AS conv_id, us AS conv_us
            FROM base WHERE etype = 'purchase'),
      t AS (SELECT b.etype, b.us, b.eid, c.conv_id
            FROM base b JOIN convs c ON b.u = c.u
            WHERE b.etype IN ('view', 'click')
              AND b.us < c.conv_us
              AND b.us >= c.conv_us - ${AttrWindowSec}000000),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY conv_id
                ORDER BY us, eid) AS r,
              COUNT(*) OVER (PARTITION BY conv_id) AS n
            FROM t),
      cr AS (SELECT etype, conv_id, CASE
              WHEN n = 1 THEN 1073741824
              WHEN n = 2 THEN 536870912
              WHEN r = 1 OR r = n THEN 429496729
              ELSE (1073741824 - 2 * 429496729) // (n - 2) END AS credit
            FROM r)
      SELECT etype AS channel,
        CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
        CAST(COUNT(*) AS BIGINT) AS n_touches,
        CAST(SUM(credit) AS DOUBLE) / 1073741824 AS credit
      FROM cr GROUP BY 1"""))

  /** Top-100 PMI collocations over adjacent token bigrams
    * (Retrieval.pmiCollocations; raw-ratio convention). */
  private val q213 = QueryDef(
    "q213_pmi_collocations",
    (s, d) => Retrieval.pmiCollocations(Tables.documents(s, d),
      "doc_id", "text", minTermLen = 3, minPair = 5, k = 100),
    Some(s"""
      WITH toks AS (SELECT ${ExtQueries.oToks("text")} AS w
            FROM documents),
      uni AS (SELECT term AS w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(w) AS term FROM toks)
            WHERE length(term) >= 3 GROUP BY 1),
      bg AS (SELECT s[1] AS w1, s[2] AS w2 FROM (
              SELECT string_split(unnest(${ExtQueries.oShingles("w", 2)}),
                ' ') AS s
              FROM toks)),
      fp AS (SELECT w1, w2 FROM bg
            WHERE length(w1) >= 3 AND length(w2) >= 3),
      ap AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_pair
            FROM fp GROUP BY 1, 2),
      nn AS (SELECT CAST(SUM(c_pair) AS BIGINT) AS n FROM ap),
      p AS (SELECT * FROM ap WHERE c_pair >= 5),
      sc AS (SELECT p.w1, p.w2, p.c_pair, u1.c AS c_w1, u2.c AS c_w2,
              CAST(nn.n * p.c_pair AS DOUBLE)
                / CAST(u1.c * u2.c AS DOUBLE) AS pmi_ratio
            FROM p JOIN uni u1 ON u1.w = p.w1
                   JOIN uni u2 ON u2.w = p.w2
                   CROSS JOIN nn)
      SELECT w1, w2, c_pair, c_w1, c_w2, pmi_ratio,
        CAST(row_number() OVER (ORDER BY pmi_ratio DESC, w1, w2) AS INT)
          AS rank
      FROM sc QUALIFY rank <= 100"""))

  val all: Seq[QueryDef] = Seq(q211, q212, q213)
}
