package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{EventOps, Quality, Similarity}

/** Round-6 wave 6: multi-probe LSH recall, concentration metrics,
  * watermark-sizing lateness profile, k-anonymity audit.
  *
  * q196 closes the single-bucket LSH blind spot (pairs straddling one
  * hyperplane) without extra tables; q197 adds the Gini/Herfindahl
  * concentration profile (source-dominance monitoring over a corpus,
  * revenue concentration over the reference's marts); q198 measures
  * the event-time lateness distribution that sizes a streaming
  * watermark; q199 is the privacy-release gate over quasi-identifiers.
  */
object R6dQueries {

  private val LshPlanes = 8

  /** Bucket-Hamming<=1 candidate pairs via one-bit-flip probing
    * (Similarity.multiProbeCandidates). */
  private val q196 = QueryDef(
    "q196_multiprobe_lsh",
    (s, d) => Similarity.multiProbeCandidates(Tables.embeddings(s, d),
      "vec_id", "embedding", LshPlanes, dim = 64),
    Some(s"""
      WITH b AS (SELECT vec_id,
              CAST(${ExtQueries.oLshBucket(LshPlanes)} AS INT) AS bucket
            FROM embeddings WHERE embedding IS NOT NULL)
      SELECT a.vec_id AS a_id, c.vec_id AS b_id,
        a.bucket AS bucket_a, c.bucket AS bucket_b,
        CAST(bit_count(xor(a.bucket, c.bucket)) AS INT) AS probe_dist
      FROM b a JOIN b c
        ON a.vec_id < c.vec_id
          AND bit_count(xor(a.bucket, c.bucket)) <= 1"""))

  /** Gini + Herfindahl concentration of customer revenue per nation
    * (Quality.concentrationProfile; exact decimal rank sums). */
  private val q197 = QueryDef(
    "q197_concentration",
    (s, d) => {
      val rev = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("__rev"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      val nat = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"))
      val joined = rev.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      Quality.concentrationProfile(joined, col("n_name"), col("o_custkey"),
          col("__rev"))
        .withColumnRenamed("grp", "n_name")
    },
    Some("""
      WITH rev AS (SELECT o_custkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                AS HUGEINT) AS u
            FROM orders GROUP BY 1),
      j AS (SELECT n.n_name, r.o_custkey AS id, r.u
            FROM rev r JOIN customer c ON c.c_custkey = r.o_custkey
                       JOIN nation n ON n.n_nationkey = c.c_nationkey),
      rk AS (SELECT n_name, id, u, row_number() OVER
              (PARTITION BY n_name ORDER BY u, id) AS i
            FROM j),
      g AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(u) AS HUGEINT) AS sx,
              CAST(SUM(u * i) AS HUGEINT) AS six,
              CAST(SUM(u * u) AS HUGEINT) AS sxx
            FROM rk GROUP BY 1)
      SELECT n_name, n, CAST(sx AS DOUBLE) / 100 AS total,
        CASE WHEN sx = 0 THEN NULL
          ELSE CAST(((2 * six - (n + 1) * sx) * 1073741824::HUGEINT)
                 // (n * sx) AS DOUBLE) / 1073741824 END AS gini,
        CASE WHEN sx = 0 THEN NULL
          ELSE CAST((sxx * 1073741824::HUGEINT) // (sx * sx) AS DOUBLE)
            / 1073741824 END AS hhi
      FROM g"""))

  /** Event-time lateness tiers per arrival order against per-user
    * high-water marks (EventOps.latenessProfile) — the watermark-delay
    * sizing measurement. The synthetic events table is generated in
    * event-time order, so a hash of the event id stands in as the
    * arrival sequence (simulated out-of-order ingestion); on real data
    * the ingestion offset/sequence goes here. */
  private val q198 = QueryDef(
    "q198_lateness_profile",
    (s, d) => EventOps.latenessProfile(Tables.events(s, d),
      col("user_id"), col("ts"), md5(col("event_id").cast("string"))),
    Some("""
      WITH e AS (SELECT user_id,
              md5(CAST(event_id AS VARCHAR)) AS arr, epoch_us(ts) AS us
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      m AS (SELECT us, MAX(us) OVER (PARTITION BY user_id ORDER BY arr
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hi
            FROM e),
      l AS (SELECT greatest(COALESCE(hi - us, 0), 0) AS late FROM m),
      bk AS (SELECT late, CASE
              WHEN late = 0 THEN 'on_time'
              WHEN late <= 1000000 THEN 'within_1s'
              WHEN late <= 10000000 THEN 'within_10s'
              WHEN late <= 60000000 THEN 'within_1m'
              WHEN late <= 600000000 THEN 'within_10m'
              WHEN late <= 3600000000 THEN 'within_1h'
              ELSE 'over_1h' END AS bucket
            FROM l),
      c AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(MAX(late) AS BIGINT) AS max_late_us
            FROM bk GROUP BY 1),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM bk)
      SELECT bucket, n_events, max_late_us,
        CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE) AS share
      FROM c CROSS JOIN t"""))

  /** k-anonymity audit of customers over (nation, segment, balance
    * band) quasi-identifiers at k=5 (Quality.kAnonymityAudit). */
  private val q199 = QueryDef(
    "q199_kanonymity_audit",
    (s, d) => Quality.kAnonymityAudit(Tables.customer(s, d), Seq(
      ("nation_key", col("c_nationkey")),
      ("segment", col("c_mktsegment")),
      ("balance_band", floor(col("c_acctbal") / 1000).cast("long"))),
      k = 5),
    Some("""
      SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
        CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
        CAST(COUNT(*) AS BIGINT) AS n, COUNT(*) < 5 AS at_risk
      FROM customer GROUP BY 1, 2, 3"""))

  val all: Seq[QueryDef] = Seq(q196, q197, q198, q199)
}
