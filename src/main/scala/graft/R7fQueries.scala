package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.Eval

/** Round-7 wave 6: split-conformal prediction intervals.
  *
  * q255 wraps the per-priority mean price predictor in distribution-free
  * intervals with the finite-sample guarantee (the k = ⌈0.9(n+1)⌉
  * calibration quantile) and reports realized test coverage — the
  * honest-uncertainty layer the q202 bootstrap CIs (for the MEAN) and
  * q217 power analysis don't provide: these are intervals for
  * INDIVIDUAL outcomes.
  */
object R7fQueries {

  private val q255 = QueryDef(
    "q255_conformal_intervals",
    (s, d) => Eval.conformalIntervals(
      Tables.orders(s, d)
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull),
      Seq("o_orderpriority"), "o_orderkey",
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"),
      trainPct = 60, calibPct = 20, alphaPct = 10),
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
      WITH base AS (
        SELECT o_orderpriority AS g, o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS y,
               $bucket AS b
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL),
      tr AS (SELECT g, CAST(count(*) AS BIGINT) AS n_train,
                    CAST(sum(y) AS BIGINT) AS s
             FROM base WHERE b < 60 GROUP BY 1),
      rest AS (SELECT base.g, base.k, base.b,
                      abs(tr.n_train * base.y - tr.s) AS r,
                      tr.n_train, tr.s
               FROM base JOIN tr USING (g) WHERE base.b >= 60),
      cal AS (SELECT g, r,
                row_number() OVER (PARTITION BY g ORDER BY r, k) AS rn,
                CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n_calib
              FROM rest WHERE b < 80),
      qh AS (SELECT g, n_calib, r AS q
             FROM cal
             WHERE rn = LEAST(n_calib, (90 * (n_calib + 1) + 99) // 100)),
      cov AS (SELECT rest.g, CAST(count(*) AS BIGINT) AS n_test,
                CAST(sum(CASE WHEN rest.r <= qh.q THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
              FROM rest JOIN qh USING (g) WHERE rest.b >= 80
              GROUP BY 1)
      SELECT tr.g AS o_orderpriority, tr.n_train, qh.n_calib, cov.n_test,
             CAST(tr.s AS DOUBLE) / CAST(tr.n_train * 100 AS DOUBLE)
               AS center,
             CAST(qh.q AS DOUBLE) / CAST(tr.n_train * 100 AS DOUBLE)
               AS q_hat,
             CAST(cov.covered AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
               AS coverage
      FROM tr JOIN qh ON qh.g = tr.g JOIN cov ON cov.g = tr.g"""
    })

  val all: Seq[QueryDef] = Seq(q255)
}
