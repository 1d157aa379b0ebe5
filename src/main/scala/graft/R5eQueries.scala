package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Quality

/** Round-5 wave 5: weighted percentiles (rational-threshold exact form)
  * and the pre-aggregated-grain percentile pattern on a fact-fact join.
  */
object R5eQueries {

  /** Quantity-weighted price percentiles per return flag: the weighted
    * median/p90 where each line weighs its quantity — rational-threshold
    * crossing in exact decimal (see Quality.weightedPercentiles). */
  private val q153 = QueryDef(
    "q153_weighted_percentiles",
    (s, d) => Quality.weightedPercentiles(
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_quantity")),
      Seq("l_returnflag"), "l_extendedprice", "l_quantity",
      Seq(("wp50", 1, 2), ("wp90", 9, 10))),
    Some("""
      WITH t AS (SELECT l_returnflag, l_extendedprice AS v,
              CAST(l_quantity AS DECIMAL(18,2)) AS w
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
      r AS (SELECT *,
              sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                ROWS UNBOUNDED PRECEDING) AS cumw,
              sum(w) OVER (PARTITION BY l_returnflag) AS totw
            FROM t)
      SELECT l_returnflag, CAST(max(totw) AS DOUBLE) AS total_weight,
             min(CASE WHEN cumw * 2 >= totw * 1 THEN v END) AS wp50,
             min(CASE WHEN cumw * 10 >= totw * 9 THEN v END) AS wp90
      FROM r GROUP BY 1"""))

  /** Order→ship latency percentiles per order month. The 100 TB shape:
    * the fact-fact join collapses to (month, delay-days) COUNTS first,
    * then the percentile runs weighted over that bounded grain — the
    * per-month window sorts at most ~hundreds of distinct delays, never
    * raw line items (the trick that keeps a low-cardinality-partition
    * percentile window skew-proof). */
  private val q154 = QueryDef(
    "q154_ship_latency",
    (s, d) => {
      val j = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate").isNotNull && col("l_shipdate").isNotNull)
        .select(date_format(to_date(col("o_orderdate")), "yyyy-MM")
            .as("month"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("delay_days"))
      val grain = j.groupBy(col("month"), col("delay_days"))
        .agg(count(lit(1)).as("n_lines"))
      Quality.weightedPercentiles(grain, Seq("month"), "delay_days",
        "n_lines", Seq(("p50_days", 1, 2), ("p90_days", 9, 10)))
    },
    Some("""
      WITH g AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                AS month,
              datediff('day', CAST(o_orderdate AS DATE),
                CAST(l_shipdate AS DATE)) AS delay_days,
              CAST(count(*) AS DECIMAL(18,2)) AS w
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
            GROUP BY 1, 2),
      r AS (SELECT *,
              sum(w) OVER (PARTITION BY month ORDER BY delay_days
                ROWS UNBOUNDED PRECEDING) AS cumw,
              sum(w) OVER (PARTITION BY month) AS totw
            FROM g)
      SELECT month, CAST(max(totw) AS DOUBLE) AS total_weight,
             min(CASE WHEN cumw * 2 >= totw * 1 THEN delay_days END)
               AS p50_days,
             min(CASE WHEN cumw * 10 >= totw * 9 THEN delay_days END)
               AS p90_days
      FROM r GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q153, q154)
}
