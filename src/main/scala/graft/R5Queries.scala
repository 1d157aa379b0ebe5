package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Cdc, Corpus, EventOps, NearDup, Quality, Scale, Sketches}

/** Round-5 wave 1: mergeable distinct sketches, trailing-window distinct
  * counts, a distributed sweep-line, and change-log compaction — the
  * profiling / incremental-maintenance layer a 100 TB warehouse runs
  * between loads.
  */
object R5Queries {

  private def dstr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")

  private val KmvK = 64

  /** KMV distinct-user sketch per event type, with the exact count
    * alongside for error measurement. The oracle replays the sketch —
    * kth-smallest md5 and the (k-1)/frac estimator — in DuckDB, nibble-
    * decoding the 48-bit hash prefix, so the approximation itself is
    * differentially verified, not just the exact path. */
  private val q132 = QueryDef(
    "q132_kmv_distinct",
    (s, d) => Sketches.kmvDistinct(
      Tables.events(s, d).filter(col("event_type").isNotNull),
      Seq("event_type"), "user_id", KmvK),
    Some {
      // frac(kth) from the first 12 hex nibbles: exact BIGINT, < 2^48
      val v = (1 to 12).map { i =>
        val w = BigInt(16).pow(12 - i)
        s"(strpos('0123456789abcdef', substr(kth_hash, $i, 1)) - 1) * $w"
      }.mkString("\n               + ")
      s"""
      WITH h AS (SELECT DISTINCT event_type,
              md5(CAST(user_id AS VARCHAR)) AS h
            FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      r AS (SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
              count(*) OVER (PARTITION BY event_type) AS nd
            FROM h),
      k AS (SELECT event_type,
              CAST(max(nd) AS BIGINT) AS n_distinct_exact,
              max(CASE WHEN rn = $KmvK THEN h END) AS kth_hash
            FROM r WHERE rn <= $KmvK GROUP BY event_type)
      SELECT event_type, n_distinct_exact, kth_hash,
             CASE WHEN kth_hash IS NULL
                  THEN CAST(n_distinct_exact AS DOUBLE)
                  ELSE CAST(${KmvK - 1} AS DOUBLE) /
                       (CAST($v AS DOUBLE) / 281474976710656.0)
             END AS approx_distinct
      FROM k"""
    })

  /** 7-day trailing distinct active customers per market segment (orders
    * joined to the broadcast customer dim). */
  private val q133 = QueryDef(
    "q133_rolling_distinct",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      EventOps.rollingDistinct(joined, Seq("c_mktsegment"),
          "o_custkey", "o_orderdate", windowDays = 7)
        .select(col("c_mktsegment").as("segment"), dstr(col("day")).as("day"),
          col("distinct_entities").as("distinct_customers"))
    },
    Some("""
      WITH a AS (SELECT DISTINCT c_mktsegment AS segment,
              o_custkey AS ent, CAST(o_orderdate AS DATE) AS d
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
      cov AS (SELECT DISTINCT segment, ent, d + CAST(i AS INT) AS day
            FROM a CROSS JOIN range(0, 7) t(i))
      SELECT segment, strftime(day, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS distinct_customers
      FROM cov GROUP BY segment, day"""))

  /** Daily peak concurrency of synthetic event spans (start = ts, length
    * = 1 + (floor(value*10) mod 7200) seconds — floor, not cast, because
    * double→int CASTs round in DuckDB but truncate in Spark). */
  private val q134 = QueryDef(
    "q134_peak_concurrency",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("value").isNotNull)
      val dur = lit(1) + pmod(floor(col("value") * lit(10.0)).cast("long"),
        lit(7200L))
      val spans = ev.select(col("event_id"), col("ts"),
        (col("ts") + make_dt_interval(lit(0), lit(0), lit(0), dur))
          .as("ts_end"))
      EventOps.peakConcurrencyDaily(spans, "ts", "ts_end", "event_id")
        .select(dstr(col("day")).as("day"), col("peak_concurrency"),
          col("n_boundaries"))
    },
    Some("""
      WITH sp AS (SELECT event_id, ts,
              ts + to_seconds(1 + ((CAST(floor(value * 10) AS BIGINT) % 7200)
                + 7200) % 7200) AS te
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      d AS (SELECT ts AS t, 1 AS delta, event_id AS tb FROM sp
            UNION ALL
            SELECT te AS t, -1 AS delta, event_id AS tb FROM sp),
      r AS (SELECT t, sum(delta) OVER (ORDER BY t, delta, tb
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
            FROM d)
      SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS day,
             CAST(max(c) AS BIGINT) AS peak_concurrency,
             CAST(count(*) AS BIGINT) AS n_boundaries
      FROM r GROUP BY 1"""))

  /** Change-log compaction: events replayed as a CDC stream on user_id
    * (every 11th event_id a delete), collapsed to the net final state. */
  private val q135 = QueryDef(
    "q135_cdc_compact",
    (s, d) => {
      val log = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .withColumn("op",
          when(pmod(col("event_id"), lit(11)) === 0, "D").otherwise("U"))
      Cdc.compactLog(log, Seq("user_id"),
          Seq(col("ts"), col("event_id")), "op", deleteOp = "D")
        .select(col("user_id"), col("event_type").as("last_event_type"),
          col("value").as("last_value"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"),
          col("n_changes"))
    },
    Some("""
      WITH lg AS (SELECT user_id, ts, event_id, event_type, value,
              CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn,
              count(*) OVER (PARTITION BY user_id) AS n_changes
            FROM lg)
      SELECT user_id, event_type AS last_event_type, value AS last_value,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
             CAST(n_changes AS BIGINT) AS n_changes
      FROM r WHERE rn = 1 AND op <> 'D'"""))

  /** Asymmetric (containment) near-dup pairs: |A∩B| / min(|A|,|B|) —
    * catches a short doc embedded in a long one, which Jaccard dilutes
    * below any usable threshold. EXACT verification form (uncapped
    * opt-in, `_exact` contract) because this oracle states the uncapped
    * semantics, like q34; the capped production twin is q321. */
  private val q136 = QueryDef(
    "q136_containment_exact",
    (s, d) => NearDup.ngramContainmentPairs(Tables.documents(s, d),
      "doc_id", "text", n = 3, threshold = 0.4, maxDf = 0,
      uncapped = true),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS MATERIALIZED (SELECT doc_id,
                list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      sh AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM ws),
      sz AS MATERIALIZED (SELECT doc_id, len(sh) AS n_sh FROM ws),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  COUNT(*) AS intersection
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, intersection,
             CAST(intersection AS DOUBLE) /
               CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
      FROM pairs
      JOIN sz sa ON a_id = sa.doc_id
      JOIN sz sb ON b_id = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) /
              CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.4"""))

  /** Rows-per-key log2 histogram of the lineitem part key — the skew
    * diagnostic run before choosing a join strategy. */
  private val q137 = QueryDef(
    "q137_skew_profile",
    (s, d) => Scale.keySkewProfile(Tables.lineitem(s, d), Seq("l_partkey")),
    Some("""
      WITH c AS (SELECT l_partkey, count(*) AS cnt
            FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1)
      SELECT CAST(length(bin(cnt)) - 1 AS INT) AS log2_bucket,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(min(cnt) AS BIGINT) AS min_rows_per_key,
             CAST(max(cnt) AS BIGINT) AS max_rows_per_key
      FROM c GROUP BY 1"""))

  /** Per-document type-token and hapax ratios (global vocabulary
    * concentration — the complement of q63's local repetition loops). */
  private val q138 = QueryDef(
    "q138_lexical_diversity",
    (s, d) => Corpus.lexicalDiversity(Tables.documents(s, d),
      "doc_id", "text"),
    Some(s"""
      WITH t AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
            FROM documents),
      c AS (SELECT doc_id, token, count(*) AS cnt FROM t GROUP BY 1, 2),
      a AS (SELECT doc_id,
              CAST(sum(cnt) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_types,
              CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT) AS n_hapax
            FROM c GROUP BY doc_id)
      SELECT doc_id, n_tokens, n_types, n_hapax,
             CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
             CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE) AS hapax_ratio
      FROM a"""))

  /** Robust account-balance outliers per market segment: nearest-rank
    * median ± 3 MAD fences (immune to the outliers themselves, unlike
    * the z-score fence of q120). The synthetic balances are uniform —
    * a distribution whose max deviation is ~2 MAD, so nothing would ever
    * flag; every 211th customer's balance is scaled ×25 to give the
    * fence something real to catch (and to demonstrate the fence is NOT
    * dragged by the planted tail, the way a stddev fence would be). */
  private val q139 = QueryDef(
    "q139_mad_outliers",
    (s, d) => Quality.madOutliers(
      Tables.customer(s, d).select(col("c_custkey"),
        col("c_mktsegment").as("segment"),
        when(pmod(col("c_custkey"), lit(211)) === 0,
          col("c_acctbal") * lit(25.0))
          .otherwise(col("c_acctbal")).as("value")),
      Seq("segment"), "value", nMads = 3.0),
    Some("""
      WITH b AS (SELECT c_custkey, c_mktsegment AS segment,
              CASE WHEN c_custkey % 211 = 0 THEN c_acctbal * 25.0
                   ELSE c_acctbal END AS v
            FROM customer WHERE c_acctbal IS NOT NULL),
      r AS (SELECT *, row_number() OVER (PARTITION BY segment ORDER BY v)
                AS rn,
              count(*) OVER (PARTITION BY segment) AS n
            FROM b),
      med AS (SELECT segment,
              max(CASE WHEN rn <= ceil(CAST(0.5 AS DOUBLE) * n
                  - CAST(1e-9 AS DOUBLE)) THEN v END) AS group_median
            FROM r GROUP BY segment),
      d AS (SELECT b.c_custkey, b.segment, b.v, med.group_median,
              abs(b.v - med.group_median) AS deviation
            FROM b JOIN med USING (segment)),
      r2 AS (SELECT *, row_number() OVER (PARTITION BY segment
                ORDER BY deviation) AS rn,
              count(*) OVER (PARTITION BY segment) AS n
            FROM d),
      mad AS (SELECT segment,
              max(CASE WHEN rn <= ceil(CAST(0.5 AS DOUBLE) * n
                  - CAST(1e-9 AS DOUBLE)) THEN deviation END) AS group_mad
            FROM r2 GROUP BY segment)
      SELECT d.c_custkey, d.segment, d.v AS value, d.group_median,
             d.deviation, mad.group_mad
      FROM d JOIN mad USING (segment)
      WHERE d.deviation > 3.0 * mad.group_mad"""))

  val all: Seq[QueryDef] =
    Seq(q132, q133, q134, q135, q136, q137, q138, q139)
}
