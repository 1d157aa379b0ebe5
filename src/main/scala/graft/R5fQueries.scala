package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{EventOps, Quality, Scale}

/** Round-5 wave 6: interval-union coverage, star-schema FK conformance,
  * and the leaderboard-plus-other serving pattern.
  */
object R5fQueries {

  private def dstr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")

  /** Per-user busy time from overlapping synthetic spans (the q134 span
    * derivation): union length vs naive span sum, overlap counted once. */
  private val q155 = QueryDef(
    "q155_interval_coverage",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("value").isNotNull &&
          col("user_id").isNotNull)
      val dur = lit(1) + pmod(floor(col("value") * lit(10.0)).cast("long"),
        lit(7200L))
      val spans = ev.select(col("user_id"), col("ts"),
        (col("ts") + make_dt_interval(lit(0), lit(0), lit(0), dur))
          .as("ts_end"))
      EventOps.intervalCoverage(spans, Seq("user_id"), "ts", "ts_end")
    },
    Some("""
      WITH sp AS (SELECT user_id, epoch_us(ts) AS su,
              epoch_us(ts + to_seconds(1 +
                ((CAST(floor(value * 10) AS BIGINT) % 7200) + 7200) % 7200))
                AS eu
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL
              AND user_id IS NOT NULL),
      w AS (SELECT *, max(eu) OVER (PARTITION BY user_id
              ORDER BY su, eu
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS prev_max
            FROM sp)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
             CAST(sum(greatest(0, eu - greatest(su,
               COALESCE(prev_max, su)))) AS BIGINT) AS covered_us,
             CAST(sum(greatest(0, eu - su)) AS BIGINT) AS span_us_sum
      FROM w GROUP BY user_id"""))

  /** Referential integrity across the TPC-H-ish star: orphan and
    * NULL-FK counts for all five fact→dim / dim→dim relations. */
  private val q156 = QueryDef(
    "q156_fk_conformance",
    (s, d) => Quality.fkConformance(Seq(
      Quality.FkRelation("lineitem.orderkey->orders",
        Tables.lineitem(s, d), "l_orderkey", Tables.orders(s, d),
        "o_orderkey"),
      Quality.FkRelation("lineitem.partkey->part",
        Tables.lineitem(s, d), "l_partkey", Tables.part(s, d), "p_partkey"),
      Quality.FkRelation("orders.custkey->customer",
        Tables.orders(s, d), "o_custkey", Tables.customer(s, d),
        "c_custkey"),
      Quality.FkRelation("customer.nationkey->nation",
        Tables.customer(s, d), "c_nationkey", Tables.nation(s, d),
        "n_nationkey"),
      Quality.FkRelation("nation.regionkey->region",
        Tables.nation(s, d), "n_regionkey", Tables.region(s, d),
        "r_regionkey"))),
    Some("""
      SELECT 'lineitem.orderkey->orders' AS relation,
             (SELECT count(*) FROM lineitem) AS n_child_rows,
             (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
               AS n_null_fk,
             (SELECT count(*) FROM lineitem l WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
      UNION ALL
      SELECT 'lineitem.partkey->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
             (SELECT count(*) FROM lineitem l WHERE l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p
                WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'orders.custkey->customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
             (SELECT count(*) FROM orders o WHERE o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'customer.nationkey->nation',
             (SELECT count(*) FROM customer),
             (SELECT count(*) FROM customer WHERE c_nationkey IS NULL),
             (SELECT count(*) FROM customer c WHERE c_nationkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nation n
                WHERE n.n_nationkey = c.c_nationkey))
      UNION ALL
      SELECT 'nation.regionkey->region',
             (SELECT count(*) FROM nation),
             (SELECT count(*) FROM nation WHERE n_regionkey IS NULL),
             (SELECT count(*) FROM nation n WHERE n_regionkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM region r
                WHERE r.r_regionkey = n.n_regionkey))"""))

  private val TopN = 5

  /** Daily spend of the global top-5 users with everyone else rolled
    * into "other" — the bounded-axis dashboard serving pattern. */
  private val q157 = QueryDef(
    "q157_topn_other",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      Scale.topNOther(ev, "user_id", "value", TopN)
        .groupBy(dstr(col("day")).as("day"), col("entity_label"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
    },
    Some(s"""
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      tot AS (SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS t
              FROM ev GROUP BY 1),
      top AS (SELECT user_id FROM tot
              ORDER BY t DESC, user_id ASC LIMIT $TopN),
      lab AS (SELECT ev.*, CASE WHEN top.user_id IS NOT NULL
                THEN CAST(ev.user_id AS VARCHAR) ELSE 'other' END
                AS entity_label
              FROM ev LEFT JOIN top USING (user_id))
      SELECT strftime(day, '%Y-%m-%d') AS day, entity_label,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM lab GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q155, q156, q157)
}
