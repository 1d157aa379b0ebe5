package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.Hierarchy

/** Round-7 wave 13: recursion-free hierarchy rollup.
  *
  * q268 rolls customer revenue up a digit-encoded org tree
  * (parent = key div 10) with subtree totals and percent-of-parent.
  * The point is the PLAN: ancestor chains have a closed form under the
  * encoding, so the whole rollup is one explode + one groupBy — no
  * recursive CTE, no depth × self-joins; the oracle replays the same
  * closed form with generate_series powers.
  */
object R7mQueries {

  private val MaxDepth = 12

  private val q268 = QueryDef(
    "q268_tree_rollup",
    (s, d) => {
      val leaves = Tables.orders(s, d)
        .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(col("o_custkey"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
      Hierarchy.subtreeRollup(leaves, col("o_custkey"), col("cents"),
        fanout = 10L, maxDepth = MaxDepth)
    },
    Some(s"""
      WITH leaves AS (
        SELECT o_custkey AS k,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                 AS BIGINT) AS cents
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1),
      anc AS (
        SELECT DISTINCT l.k, l.cents,
               l.k // CAST(power(10, j.j) AS BIGINT) AS node
        FROM leaves l,
             (SELECT unnest(generate_series(0, $MaxDepth)) AS j) j),
      sub AS (
        SELECT node, CAST(sum(cents) AS BIGINT) AS subtree_cents
        FROM anc GROUP BY 1),
      wp AS (
        SELECT node,
               CASE WHEN node > 0 THEN node // 10 END AS parent,
               subtree_cents
        FROM sub)
      SELECT c.node, c.parent, c.subtree_cents,
             CAST(c.subtree_cents AS DOUBLE)
               / CAST(p.subtree_cents AS DOUBLE) AS pct_of_parent
      FROM wp c LEFT JOIN wp p ON p.node = c.parent"""))

  val all: Seq[QueryDef] = Seq(q268)
}
