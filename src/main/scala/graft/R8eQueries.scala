package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Windows

/** Round-8 wave 5: operational readout over the clamped balance.
  *
  * q296 summarizes each supplier's q267 stock trajectory into the
  * numbers an ops dashboard shows: how often the floor was hit
  * (stockouts), the peak, the mean level, and the closing balance —
  * exact integers end to end, one division for the mean.
  */
object R8eQueries {

  private val q296 = QueryDef(
    "q296_stockout_profile",
    (s, d) => {
      val flows = Tables.lineitem(s, d)
        .filter(col("l_suppkey") % 10 === 0 && col("l_shipdate").isNotNull)
        .groupBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .agg(sum(when(col("l_returnflag") === "R",
          -col("l_quantity").cast("long"))
          .otherwise(col("l_quantity").cast("long"))).as("delta"))
      val bal = Windows.clampedRunningBalance(flows, Seq("l_suppkey"),
        Seq(col("ship_day"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey")),
        col("delta"))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("ship_day"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"))
      bal
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.partitionBy(col("l_suppkey"))))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_moves"),
          sum(when(col("balance") === 0, 1L).otherwise(0L))
            .as("n_stockouts"),
          max(col("balance")).as("peak_balance"),
          max(when(col("__rn") === col("__n"), col("balance")))
            .as("closing_balance"),
          (sum(col("balance")).cast("double")
            / count(lit(1)).cast("double")).as("mean_balance"))
    },
    Some("""
      WITH f AS (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
               CAST(sum(CASE WHEN l_returnflag = 'R'
                    THEN -CAST(l_quantity AS BIGINT)
                    ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT)
                 AS delta
        FROM lineitem
        WHERE l_suppkey % 10 = 0 AND l_shipdate IS NOT NULL
        GROUP BY 1, 2, 3, 4, 5),
      pf AS (
        SELECT l_suppkey, ship_day, l_orderkey, l_linenumber, l_partkey,
               delta,
               CAST(sum(delta) OVER w AS BIGINT) AS p,
               row_number() OVER (PARTITION BY l_suppkey
                 ORDER BY ship_day, l_orderkey, l_linenumber, l_partkey)
                 AS rn,
               CAST(count(*) OVER (PARTITION BY l_suppkey) AS BIGINT)
                 AS n
        FROM f
        WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY ship_day, l_orderkey, l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      pm AS (
        SELECT *, CAST(min(p) OVER (PARTITION BY l_suppkey
                 ORDER BY ship_day, l_orderkey, l_linenumber, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS m
        FROM pf),
      b AS (SELECT l_suppkey, rn, n, p - LEAST(m, 0) AS balance FROM pm)
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n_moves,
             CAST(sum(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stockouts,
             CAST(max(balance) AS BIGINT) AS peak_balance,
             CAST(max(CASE WHEN rn = n THEN balance END) AS BIGINT)
               AS closing_balance,
             CAST(sum(balance) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_balance
      FROM b GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q296)
}
