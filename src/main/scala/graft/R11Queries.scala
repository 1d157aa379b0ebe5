package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.Bucketing

/** Round-11 wave: physical-layout co-location.
  *
  * q329 is the bucketed fact-to-fact join — the one join shape where
  * "let Catalyst pick" is not enough at 100 TB, because the win comes
  * from a WRITE-time layout decision (hash-bucket both facts on the
  * join key) that no optimizer can retrofit onto an unbucketed scan.
  * The query writes lineitem and orders as bucketed managed tables,
  * joins + per-key aggregates them, `require`s the physical plan has
  * ZERO shuffle exchanges (the co-location proof, enforced on every
  * Verify/Bench run, not only in the spec), then rolls the per-order
  * rows up to priority level. The oracle is pure join+agg SQL — layout
  * must never change results.
  */
object R11Queries {

  private val D2 = DecimalType(18, 2)
  private val Buckets = 16

  private val q329 = QueryDef(
    "q329_bucketed_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Bucketing.writeBucketed(li, "graft_li_bucketed", "l_orderkey",
        Buckets, Seq("l_orderkey"))
      Bucketing.writeBucketed(ord, "graft_ord_bucketed", "o_orderkey",
        Buckets, Seq("o_orderkey"))
      // both sides of a fact-to-fact join are huge at 100 TB: disable the
      // broadcast fallback so the zero-exchange require proves
      // CO-LOCATION (BroadcastHashJoin would also show zero SHUFFLE
      // exchanges); materialize inside the conf window (q323 pattern)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val perOrder = s.table("graft_li_bucketed")
          .join(s.table("graft_ord_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast(D2)).as("rev"),
            count(lit(1)).as("n_lines"))
        val exchanges = Bucketing.shuffleExchangeCount(perOrder)
        require(exchanges == 0,
          s"bucketed join+agg must plan zero shuffle exchanges, saw $exchanges")
        perOrder.groupBy(col("o_orderpriority"))
          .agg(sum(col("rev")).cast("double").as("revenue"),
            sum(col("n_lines")).as("n_lines"),
            count(lit(1)).as("n_orders"))
          .localCheckpoint()
      } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    },
    Some("""
      WITH per_order AS (
        SELECT l_orderkey, o_orderpriority,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev,
               COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2)
      SELECT o_orderpriority,
             CAST(SUM(rev) AS DOUBLE) AS revenue,
             CAST(SUM(n_lines) AS BIGINT) AS n_lines,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM per_order GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q329)
}
