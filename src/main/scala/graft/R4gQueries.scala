package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Baskets, EventOps, Quality}

/** Round-4 wave 8: snapshot reconciliation (the post-reload drift report),
  * time-weighted averages over irregularly-sampled event values, and
  * market-basket co-occurrence. */
object R4gQueries {

  /** Snapshot diff between the customer table and a deterministically
    * perturbed copy: removals (custkey % 97 = 0), segment changes
    * (% 31 = 0), and synthetic additions (% 53 = 0, offset keys). String
    * perturbation only — arithmetic on doubles would make the hashed
    * string form engine-sensitive. */
  private val q124 = QueryDef(
    "q124_snapshot_diff",
    (s, d) => {
      val old = Tables.customer(s, d)
      val changed = old
        .filter(pmod(col("c_custkey"), lit(97)) =!= 0)
        .withColumn("c_mktsegment",
          when(pmod(col("c_custkey"), lit(31)) === 0, lit("CHANGED"))
            .otherwise(col("c_mktsegment")))
      val added = old.filter(pmod(col("c_custkey"), lit(53)) === 0)
        .withColumn("c_custkey", col("c_custkey") + lit(10000000L))
      Quality.snapshotDiff(old, changed.unionByName(added),
        keys = Seq("c_custkey"),
        compareCols = Seq("c_name", "c_mktsegment", "c_acctbal"))
    },
    Some("""
      WITH oldv AS (SELECT c_custkey,
              sha256(concat_ws('|',
                upper(coalesce(CAST(c_name AS VARCHAR), '')),
                upper(coalesce(CAST(c_mktsegment AS VARCHAR), '')),
                upper(coalesce(CAST(c_acctbal AS VARCHAR), ''))))
                AS old_hash
            FROM customer),
      pert AS (SELECT c_custkey, c_name,
              CASE WHEN c_custkey % 31 = 0 THEN 'CHANGED'
                   ELSE c_mktsegment END AS c_mktsegment, c_acctbal
            FROM customer WHERE c_custkey % 97 <> 0
            UNION ALL
            SELECT c_custkey + 10000000, c_name, c_mktsegment, c_acctbal
            FROM customer WHERE c_custkey % 53 = 0),
      newv AS (SELECT c_custkey,
              sha256(concat_ws('|',
                upper(coalesce(CAST(c_name AS VARCHAR), '')),
                upper(coalesce(CAST(c_mktsegment AS VARCHAR), '')),
                upper(coalesce(CAST(c_acctbal AS VARCHAR), ''))))
                AS new_hash
            FROM pert)
      SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.old_hash IS NULL THEN 'added'
                  WHEN n.new_hash IS NULL THEN 'removed'
                  WHEN o.old_hash = n.new_hash THEN 'unchanged'
                  ELSE 'changed' END AS change_type,
             o.old_hash, n.new_hash
      FROM oldv o FULL OUTER JOIN newv n ON o.c_custkey = n.c_custkey"""))

  /** Time-weighted mean of the view-event gauge per user (micros-exact
    * durations, decimal-exact weighted sum, one final division). */
  private val q125 = QueryDef(
    "q125_time_weighted_avg",
    (s, d) => EventOps.timeWeightedAvg(
      Tables.events(s, d).filter(col("event_type") === "view"),
      keyCol = "user_id", tsCol = "ts", valCol = "value",
      tiebreak = "event_id"),
    Some("""
      WITH spans AS (SELECT user_id, value,
              epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id)) - epoch_us(ts) AS dur
            FROM events WHERE event_type = 'view' AND ts IS NOT NULL),
      agg AS (SELECT user_id,
              CAST(count(*) AS BIGINT) AS n_intervals,
              CAST(sum(dur) AS BIGINT) AS total_dur_us,
              SUM(CAST(value AS DECIMAL(18,2)) * dur) AS wsum
            FROM spans WHERE dur IS NOT NULL GROUP BY user_id)
      SELECT user_id, n_intervals, total_dur_us,
             CAST(CAST(wsum AS VARCHAR) AS DOUBLE) /
               CAST(nullif(total_dur_us, 0) AS DOUBLE) AS twa
      FROM agg"""))

  private val BasketCap = 20
  private val BasketK = 25

  /** Brand co-occurrence across orders (lineitem joined to the part dim
    * for a low-cardinality item space; the group cap bounds the pair
    * join — see Baskets scaladoc). */
  private val q126 = QueryDef(
    "q126_basket_pairs",
    (s, d) => {
      val branded = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      Baskets.coOccurrence(branded, "l_orderkey", "p_brand",
        maxItemsPerGroup = BasketCap, topK = BasketK)
    },
    Some(s"""
      WITH items AS (SELECT DISTINCT l.l_orderkey AS g, p.p_brand AS item
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand IS NOT NULL),
      sized AS (SELECT g, item FROM (
              SELECT g, item, count(*) OVER (PARTITION BY g) AS n
              FROM items) WHERE n <= $BasketCap),
      pairs AS (SELECT a.item AS item_a, b.item AS item_b,
              CAST(count(*) AS BIGINT) AS n_groups
            FROM sized a JOIN sized b
              ON a.g = b.g AND a.item < b.item
            GROUP BY 1, 2)
      SELECT item_a, item_b, n_groups,
             CAST(row_number() OVER (
               ORDER BY n_groups DESC, item_a, item_b) AS INT) AS rank
      FROM pairs
      QUALIFY rank <= $BasketK"""))

  /** Exact per-source length percentiles (nearest-rank; see
    * Quality.exactPercentiles for why sketches can't be oracle-checked). */
  private val q127 = QueryDef(
    "q127_group_percentiles",
    (s, d) => Quality.exactPercentiles(Tables.documents(s, d),
      Seq("source"), "n_chars", Seq(0.5, 0.9, 0.99)),
    Some("""
      WITH r AS (SELECT source, n_chars,
              row_number() OVER (PARTITION BY source ORDER BY n_chars)
                AS rn,
              count(*) OVER (PARTITION BY source) AS n
            FROM documents WHERE n_chars IS NOT NULL)
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             max(CASE WHEN rn <= ceil(CAST(0.5 AS DOUBLE) * n
                 - CAST(1e-9 AS DOUBLE)) THEN n_chars END) AS p50,
             max(CASE WHEN rn <= ceil(CAST(0.9 AS DOUBLE) * n
                 - CAST(1e-9 AS DOUBLE)) THEN n_chars END) AS p90,
             max(CASE WHEN rn <= ceil(CAST(0.99 AS DOUBLE) * n
                 - CAST(1e-9 AS DOUBLE)) THEN n_chars END) AS p99
      FROM r GROUP BY source"""))

  /** Deterministic mode of the order-priority per order status. */
  private val q128 = QueryDef(
    "q128_grouped_mode",
    (s, d) => Quality.groupedMode(Tables.orders(s, d),
      Seq("o_orderstatus"), "o_orderpriority"),
    Some("""
      WITH c AS (SELECT o_orderstatus, o_orderpriority AS mode_value,
              CAST(count(*) AS BIGINT) AS n_occurrences
            FROM orders WHERE o_orderpriority IS NOT NULL
            GROUP BY 1, 2)
      SELECT o_orderstatus, mode_value, n_occurrences
      FROM c
      QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        ORDER BY n_occurrences DESC, mode_value) = 1"""))

  /** Pairwise distinct-user overlap between event types. */
  private val q129 = QueryDef(
    "q129_audience_overlap",
    (s, d) => EventOps.audienceOverlap(Tables.events(s, d),
      "event_type", "user_id"),
    Some("""
      WITH a AS (SELECT DISTINCT event_type AS t, user_id AS u
                 FROM events
                 WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      sz AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY t),
      b AS (SELECT x.t AS type_a, y.t AS type_b,
              CAST(count(*) AS BIGINT) AS n_both
            FROM a x JOIN a y ON x.u = y.u AND x.t < y.t
            GROUP BY 1, 2)
      SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b,
             CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) AS jaccard
      FROM b
      JOIN sz sa ON sa.t = b.type_a
      JOIN sz sb ON sb.t = b.type_b"""))

  /** First-order clickstream transition matrix (Markov counts). */
  private val q130 = QueryDef(
    "q130_transition_matrix",
    (s, d) => EventOps.transitionMatrix(Tables.events(s, d),
      "user_id", "ts", "event_type", "event_id"),
    Some("""
      WITH seq AS (SELECT event_type,
              lead(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS next_type
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL)
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n_transitions
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2"""))

  /** Unpivot (melt): the inverse of the serving-layer pivot (A7/q26) —
    * wide measure columns back to tall (measure, value) rows, the shape
    * every generic metrics store ingests. Uses Spark's native unpivot
    * (codegen'd Expand, one pass, no joins). */
  private val q131 = QueryDef(
    "q131_unpivot",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount")),
        variableColumnName = "measure",
        valueColumnName = "value"),
    Some("""
      SELECT l_orderkey, l_linenumber, l_partkey,
             'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_partkey,
             'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, l_partkey,
             'l_discount', l_discount FROM lineitem"""))

  val all: Seq[QueryDef] =
    Seq(q124, q125, q126, q127, q128, q129, q130, q131)
}
