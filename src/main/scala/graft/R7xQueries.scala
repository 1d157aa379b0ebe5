package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Eval, Stats}

/** Round-7 wave 24: model-free feature screening and targeting curves.
  *
  * q286 ranks candidate features by the scatter gain of their best
  * single split — what a GBDT's first stump would learn, computed as a
  * one-pass melt + weighted prefix windows; q287 is the cumulative
  * gains/lift table for "does event count predict conversion",
  * the targeting-efficiency curve ROC-AUC (q229) summarizes away.
  */
object R7xQueries {

  private val q286 = QueryDef(
    "q286_stump_screen",
    (s, d) => Stats.stumpScreen(
      Tables.lineitem(s, d),
      Seq(
        "discount_bp" ->
          (col("l_discount").cast(DecimalType(4, 2)) * 100).cast("long"),
        "quantity" -> col("l_quantity").cast("long"),
        "partkey_bucket" -> pmod(col("l_partkey"), lit(16L))),
      (col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast("long")),
    Some("""
      WITH m AS (
        SELECT f.feature, f.v, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(y) AS HUGEINT) AS s
        FROM (
          SELECT unnest([
              {'feature': 'discount_bp',
               'v': CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)},
              {'feature': 'quantity', 'v': CAST(l_quantity AS BIGINT)},
              {'feature': 'partkey_bucket', 'v': l_partkey % 16}]) AS f,
            CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
              AS y
          FROM lineitem WHERE l_extendedprice IS NOT NULL) t
        WHERE f.v IS NOT NULL
        GROUP BY 1, 2),
      pre AS (
        SELECT feature, v, c, s,
               sum(c) OVER w AS cl, sum(s) OVER w AS sl,
               sum(c) OVER p AS n, sum(s) OVER p AS st,
               CAST(count(*) OVER p AS BIGINT) AS nv,
               row_number() OVER (PARTITION BY feature ORDER BY v) AS rk
        FROM m
        WINDOW w AS (PARTITION BY feature ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               p AS (PARTITION BY feature)),
      cand AS (
        SELECT feature, v, nv, cl, sl, n - cl AS cr, st - sl AS sr,
               CAST(sl * sl AS DOUBLE) / CAST(cl AS DOUBLE)
                 + CAST((st - sl) * (st - sl) AS DOUBLE)
                   / CAST(n - cl AS DOUBLE)
                 - CAST(st * st AS DOUBLE) / CAST(n AS DOUBLE) AS gain
        FROM pre WHERE rk < nv),
      best AS (
        SELECT feature, nv AS n_values, v AS split_value,
               CAST(sl AS DOUBLE) / CAST(cl * 100 AS DOUBLE) AS left_mean,
               CAST(sr AS DOUBLE) / CAST(cr * 100 AS DOUBLE) AS right_mean,
               gain,
               row_number() OVER (PARTITION BY feature
                 ORDER BY gain DESC, v) AS brk
        FROM cand)
      SELECT feature, n_values, split_value, left_mean, right_mean, gain,
             CAST(row_number() OVER (ORDER BY gain DESC, feature) AS INT)
               AS rank
      FROM best WHERE brk = 1"""))

  private val q287 = QueryDef(
    "q287_gains_chart",
    (s, d) => {
      val users = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("score"),
          (max(when(col("event_type") === "purchase", 1).otherwise(0))
            === 1).as("label"))
      Eval.gainsChart(users, "user_id", col("score"), col("label"))
    },
    Some("""
      WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS score,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS pos
        FROM events WHERE user_id IS NOT NULL
        GROUP BY 1),
      t AS (SELECT user_id, pos,
              ntile(10) OVER (ORDER BY score DESC, user_id) AS tile
            FROM u),
      pt AS (SELECT tile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pos) AS BIGINT) AS pos
             FROM t GROUP BY 1),
      c AS (SELECT tile, n, pos,
              CAST(sum(n) OVER w AS BIGINT) AS cn,
              CAST(sum(pos) OVER w AS BIGINT) AS cp,
              CAST(sum(n) OVER () AS BIGINT) AS tn,
              CAST(sum(pos) OVER () AS BIGINT) AS tp
            FROM pt
            WINDOW w AS (ORDER BY tile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT tile, n, pos,
             CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE) AS cum_capture,
             CAST(cp * tn AS DOUBLE) / CAST(cn * tp AS DOUBLE) AS lift
      FROM c"""))

  val all: Seq[QueryDef] = Seq(q286, q287)
}
