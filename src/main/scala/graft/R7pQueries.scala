package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Quality, Windows}

/** Round-7 wave 16: dependency profiling and row-pattern detection.
  *
  * q272 audits whether part → supplier is a reliable lookup key and
  * ranks the determinants where the dependency breaks worst (the
  * profiling step before anyone builds a dimension off a column pair);
  * q273 finds strict V-bottoms in daily revenue series — the
  * MATCH_RECOGNIZE-shaped dip/recovery pattern, expressed as lag/lead
  * bands in one keyed window.
  */
object R7pQueries {

  private val FdTopK = 100

  private val q272 = QueryDef(
    "q272_fd_violations",
    (s, d) => Quality.fdViolations(Tables.lineitem(s, d),
      "l_partkey", "l_suppkey", topK = FdTopK),
    Some(s"""
      WITH pair AS (
        SELECT l_partkey AS determinant, l_suppkey AS dep,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem WHERE l_partkey IS NOT NULL
        GROUP BY 1, 2),
      per AS (
        SELECT determinant, CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_dependents,
               CAST(max(n) AS BIGINT) AS maxn
        FROM pair GROUP BY 1
        HAVING count(*) > 1),
      ranked AS (
        SELECT determinant, n_rows, n_dependents,
               CAST(maxn AS DOUBLE) / CAST(n_rows AS DOUBLE)
                 AS majority_confidence,
               CAST(row_number() OVER (ORDER BY n_dependents DESC,
                 n_rows DESC, determinant) AS INT) AS rank
        FROM per)
      SELECT determinant, n_rows, n_dependents, majority_confidence, rank
      FROM ranked WHERE rank <= $FdTopK"""))

  private val q273 = QueryDef(
    "q273_v_bottoms",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
      Windows.vBottoms(daily, Seq("prio"), col("day"), col("cents"))
        .select(col("prio"), col("day").cast("string").as("day"),
          col("bottom_value"), col("depth"))
    },
    Some("""
      WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                 AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1, 2),
      lagged AS (
        SELECT prio, day, cents,
               lag(cents, 2) OVER w AS l2, lag(cents, 1) OVER w AS l1,
               lead(cents, 1) OVER w AS n1, lead(cents, 2) OVER w AS n2
        FROM daily
        WINDOW w AS (PARTITION BY prio ORDER BY day))
      SELECT prio, strftime(day, '%Y-%m-%d') AS day,
             cents AS bottom_value,
             LEAST(l2, n2) - cents AS depth
      FROM lagged
      WHERE l2 > l1 AND l1 > cents AND cents < n1 AND n1 < n2"""))

  val all: Seq[QueryDef] = Seq(q272, q273)
}
