package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-7 wave 22: relational division and quantile mapping.
  *
  * q283 is the classic relational-division operator the surface still
  * lacked — "customers who ordered at EVERY priority level", with the
  * divisor set taken from the data (division by a dynamic set, not a
  * literal); q284 maps variant-B spends onto variant-A's distribution
  * by exact nearest-rank percentile lookup — quantile-mapping
  * calibration, the constructive sibling of the q226/q175 drift tests.
  */
object R7vQueries {

  private val q283 = QueryDef(
    "q283_relational_division",
    (s, d) => {
      val orders = Tables.orders(s, d)
        .filter(col("o_custkey").isNotNull && col("o_orderpriority").isNotNull)
      val divisor = orders.select(col("o_orderpriority")).distinct()
        .agg(count(lit(1)).as("__target"))
      orders.groupBy(col("o_custkey"))
        .agg(countDistinct(col("o_orderpriority")).as("n_priorities"),
          count(lit(1)).as("n_orders"))
        .crossJoin(broadcast(divisor))
        .filter(col("n_priorities") === col("__target"))
        .select(col("o_custkey"), col("n_priorities"), col("n_orders"))
    },
    Some("""
      WITH t AS (SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                   AS target
                 FROM orders WHERE o_orderpriority IS NOT NULL),
      cov AS (SELECT o_custkey,
                CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                  AS n_priorities,
                CAST(count(*) AS BIGINT) AS n_orders
              FROM orders
              WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
              GROUP BY 1)
      SELECT o_custkey, n_priorities, n_orders
      FROM cov CROSS JOIN t WHERE n_priorities = t.target"""))

  private val q284 = QueryDef(
    "q284_quantile_mapping",
    (s, d) => {
      val bucket = conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      val spend = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
        .withColumn("variant", when(bucket < 50, "A").otherwise("B"))
      val a = spend.filter(col("variant") === "A")
        .withColumn("__rk", row_number().over(
          Window.orderBy(col("cents"), col("user_id"))))
        .withColumn("__na", count(lit(1)).over(Window.partitionBy(lit(1))))
      val b = spend.filter(col("variant") === "B")
        .withColumn("__rk_b", row_number().over(
          Window.orderBy(col("cents"), col("user_id"))))
        .withColumn("__nb", count(lit(1)).over(Window.partitionBy(lit(1))))
      // target rank: ceil(rk_b * n_a / n_b), exact integers
      val bT = b.crossJoin(broadcast(a.select(max(col("__na")).as("__na"))))
        .withColumn("__tgt",
          (((col("__rk_b") * col("__na") + col("__nb") - 1)
            - pmod(col("__rk_b") * col("__na") + col("__nb") - 1,
              col("__nb"))) / col("__nb")).cast("long"))
      bT.join(a.select(col("__rk").cast("long").as("__tgt"),
          col("cents").as("mapped_cents")), Seq("__tgt"))
        .select(col("user_id"), col("cents"), col("mapped_cents"))
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
      WITH spend AS (
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents,
               CASE WHEN $bucket < 50 THEN 'A' ELSE 'B' END AS variant
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id),
      a AS (SELECT cents,
              row_number() OVER (ORDER BY cents, user_id) AS rk
            FROM spend WHERE variant = 'A'),
      na AS (SELECT CAST(count(*) AS BIGINT) AS na FROM a),
      b AS (SELECT user_id, cents,
              row_number() OVER (ORDER BY cents, user_id) AS rk,
              CAST(count(*) OVER () AS BIGINT) AS nb
            FROM spend WHERE variant = 'B'),
      bt AS (SELECT b.user_id, b.cents,
               (b.rk * na.na + b.nb - 1) // b.nb AS tgt
             FROM b CROSS JOIN na)
      SELECT bt.user_id, bt.cents, a.cents AS mapped_cents
      FROM bt JOIN a ON a.rk = bt.tgt"""
    })

  val all: Seq[QueryDef] = Seq(q283, q284)
}
