package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.Stats

/** Round-7 wave 14: sampling-plan design.
  *
  * q269 computes the Neyman-optimal split of a sampling budget across
  * order-priority strata (∝ N_h·σ_h, the minimum-variance design)
  * beside the naive proportional split — the plan a curation pipeline
  * fixes BEFORE drawing q64/q170 samples. Both integerizations are
  * largest-remainder on a 2^20 integer weight grid, so the allocations
  * are exact, sum to the budget, and reproduce across engines.
  */
object R7nQueries {

  private val Budget = 1000L

  private val q269 = QueryDef(
    "q269_neyman_allocation",
    (s, d) => Stats.neymanAllocation(
      Tables.orders(s, d).filter(col("o_orderpriority").isNotNull),
      "o_orderpriority",
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"),
      Budget),
    Some(s"""
      WITH g AS (
        SELECT o_orderpriority AS stratum,
               CAST(count(*) AS BIGINT) AS n_pop,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS HUGEINT)
                 * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                 AS HUGEINT)) AS HUGEINT) AS syy
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1),
      v AS (
        SELECT stratum, n_pop,
               CAST(n_pop AS HUGEINT) * syy - sy * sy AS varnum
        FROM g),
      w AS (
        SELECT stratum, n_pop,
               sqrt(CAST(varnum AS DOUBLE)) / CAST(n_pop AS DOUBLE)
                 AS sigma,
               CAST(floor(sqrt(CAST(varnum AS DOUBLE)) * 1048576.0)
                 AS HUGEINT) AS wq
        FROM v),
      ney AS (
        SELECT stratum, n_pop, sigma, wq,
               (wq * $Budget) // (SELECT sum(wq) FROM w) AS fl,
               (wq * $Budget) % (SELECT sum(wq) FROM w) AS rem
        FROM w),
      ney2 AS (
        SELECT *,
               row_number() OVER (ORDER BY rem DESC, stratum) AS rk,
               $Budget - (SELECT sum(fl) FROM ney) AS leftover
        FROM ney),
      prop AS (
        SELECT stratum,
               (CAST(n_pop AS HUGEINT) * $Budget)
                 // (SELECT sum(n_pop) FROM g) AS fl,
               (CAST(n_pop AS HUGEINT) * $Budget)
                 % (SELECT sum(n_pop) FROM g) AS rem
        FROM g),
      prop2 AS (
        SELECT *,
               row_number() OVER (ORDER BY rem DESC, stratum) AS rk,
               $Budget - (SELECT sum(fl) FROM prop) AS leftover
        FROM prop)
      SELECT n.stratum, n.n_pop, n.sigma,
             CAST(n.fl + CASE WHEN n.rk <= n.leftover THEN 1 ELSE 0 END
               AS BIGINT) AS alloc_neyman,
             CAST(p.fl + CASE WHEN p.rk <= p.leftover THEN 1 ELSE 0 END
               AS BIGINT) AS alloc_proportional
      FROM ney2 n JOIN prop2 p USING (stratum)"""))

  val all: Seq[QueryDef] = Seq(q269)
}
