package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType => DT}

import graft.Queries.QueryDef

/** Round-4 wave 6: classic multi-join analytic compositions over the star
  * schema — the shapes a warehouse user actually runs all day. These are
  * deliberately compositions of existing operators (broadcast dim joins,
  * decimal-exact aggregation, partial top-k, window lag), registered as
  * plan-audit anchors for join ordering and broadcast selection at bench
  * scale. */
object R4eQueries {

  private val D2 = DT(18, 2)
  private val D4 = DT(9, 4)
  private def money(c: org.apache.spark.sql.Column) = c.cast(D2)

  private val Q3Cut = "1995-03-15"

  /** TPC-H Q3 shape: top-10 highest-revenue orders from one market
    * segment, ordered before the cutoff but (partly) shipped after it.
    * Plan wants: broadcast the filtered customer dim, partial agg on
    * l_orderkey before the exchange, TakeOrderedAndProject for the
    * top-10. */
  private val q117 = QueryDef(
    "q117_unshipped_topk",
    (s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .filter(to_date(col("o_orderdate")) < lit(Q3Cut))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables.lineitem(s, d)
        .filter(to_date(col("l_shipdate")) > lit(Q3Cut))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(sum(money(col("l_extendedprice")) *
          (lit(1) - col("l_discount").cast(D4))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l.l_orderkey AS o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l.l_discount AS DECIMAL(9,4)))) AS DOUBLE)
               AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'MACHINERY'
        AND CAST(o.o_orderdate AS DATE) < DATE '$Q3Cut'
        AND CAST(l.l_shipdate AS DATE) > DATE '$Q3Cut'
      GROUP BY 1, 2
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10"""))

  /** TPC-H Q5 shape: local-supplier revenue per nation inside one region
    * and year. Five joins; every dim side (region, nation, customer,
    * supplier) is broadcast-sized, only orders⋈lineitem shuffles. */
  private val q118 = QueryDef(
    "q118_region_revenue",
    (s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.customer(s, d)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val o = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(money(col("l_extendedprice")) *
          (lit(1) - col("l_discount").cast(D4))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""
      SELECT n.n_name,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l.l_discount AS DECIMAL(9,4)))) AS DOUBLE)
               AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     AND s.s_nationkey = c.c_nationkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1995
      GROUP BY n.n_name"""))

  /** Month-over-month revenue growth: monthly rollup + window lag + one
    * exact division. The monthly aggregate is decimal-exact; the growth
    * ratio is a single double division both engines compute identically. */
  private val q119 = QueryDef(
    "q119_mom_growth",
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM-dd").as("month"))
        .agg(sum(money(col("o_totalprice"))).cast("double").as("revenue"))
      val w = Window.orderBy(col("month"))
      monthly
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("mom_pct",
          (col("revenue") - col("prev_revenue")) / col("prev_revenue"))
    },
    Some("""
      WITH m AS (SELECT strftime(date_trunc('month', o_orderdate),
                   '%Y-%m-%d') AS month,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
               FROM orders GROUP BY 1)
      SELECT month, revenue,
             lag(revenue, 1) OVER (ORDER BY month) AS prev_revenue,
             (revenue - lag(revenue, 1) OVER (ORDER BY month)) /
               lag(revenue, 1) OVER (ORDER BY month) AS mom_pct
      FROM m"""))

  val all: Seq[QueryDef] = Seq(q117, q118, q119)
}
