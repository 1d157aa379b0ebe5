package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Stats

/** Round-6 wave 16: nonparametric drift auditing — the unbinned
  * complement to q175's PSI and the rank-based complement to q217's
  * parametric planner.
  *
  * q226 reads distribution drift straight off two empirical CDFs
  * (Kolmogorov–Smirnov, no bin grid to pre-commit); q227 answers
  * "did the middle of this distribution move" robustly to outliers
  * (Mann–Whitney rank-sum); q228 scores every corpus-source pair by
  * unigram-distribution divergence (Jensen–Shannon, in bits) — the
  * number a mixture designer reads next to the q141 overlap sketch.
  */
object R6nQueries {

  private val DriftCut = "1998-01-01"

  // DuckDB replay of the shared CDF substrate (ExtQueries.oCdfFrom);
  // `aExpr` marks sample A.
  private def oCdf(fromWhere: String, vExpr: String, aExpr: String) =
    ExtQueries.oCdfFrom(
      s"SELECT CAST($vExpr AS DOUBLE) AS v, ($aExpr) AS a $fromWhere")

  /** Two-sample KS drift test: order totals before vs after the cut
    * date. Eight-term Kolmogorov series, left-to-right (shared shape
    * with Stats.ksTest). */
  private val q226 = QueryDef(
    "q226_ks_drift",
    (s, d) => Stats.ksTest(Tables.orders(s, d),
      col("o_totalprice"),
      col("o_orderdate") < lit(DriftCut).cast("timestamp")),
    Some {
      val series = (1 to 8).map { k =>
        val sign = if (k % 2 == 1) "1.0" else "-1.0"
        s"$sign * exp(CAST(${-2 * k * k} AS DOUBLE) * lambda * lambda)"
      }.mkString(" + ")
      s"""
      WITH ${oCdf(
        s"""FROM orders
           WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL""",
        "o_totalprice",
        s"o_orderdate < TIMESTAMP '$DriftCut'")},
      s AS (SELECT v, na, nb,
              abs(CAST(cum_a AS DOUBLE) / CAST(na AS DOUBLE)
                - CAST(cum_b AS DOUBLE) / CAST(nb AS DOUBLE)) AS d
            FROM c CROSS JOIN t WHERE na > 0 AND nb > 0),
      top AS (SELECT * FROM s
              QUALIFY row_number() OVER (ORDER BY d DESC, v) = 1),
      l AS (SELECT *, d * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
              / CAST(na + nb AS DOUBLE)) AS lambda
            FROM top)
      SELECT na AS n_a, nb AS n_b, d AS ks_d, v AS ks_at_value, lambda,
        CASE WHEN lambda < CAST(0.3 AS DOUBLE) THEN CAST(1 AS DOUBLE)
          ELSE least(CAST(1 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
            CAST(2 AS DOUBLE) * ($series))) END AS p_value
      FROM l"""
    })

  /** Mann–Whitney rank-sum: urgent vs low-priority order totals, exact
    * HUGEINT rank sums (2·R_A clears the tie half-integers), tie-
    * corrected z. */
  private val q227 = QueryDef(
    "q227_mann_whitney",
    (s, d) => Stats.mannWhitney(
      Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW")),
      col("o_totalprice"),
      col("o_orderpriority") === "1-URGENT"),
    Some(s"""
      WITH ${oCdf(
        s"""FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
             AND o_totalprice IS NOT NULL""",
        "o_totalprice",
        "o_orderpriority = '1-URGENT'")},
      ${ExtQueries.oMannWhitneyAgg}
      SELECT na AS n_a, nb AS n_b,
        CAST(two_ua AS DOUBLE) / CAST(2 AS DOUBLE) AS u_a,
        CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
          - CAST(two_ua AS DOUBLE) / CAST(2 AS DOUBLE) AS u_b,
        CASE WHEN sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                 / CAST(12 AS DOUBLE))
               * ((CAST(na + nb AS DOUBLE) + CAST(1 AS DOUBLE))
                  - CAST(ties AS DOUBLE)
                    / (CAST(na + nb AS DOUBLE)
                       * (CAST(na + nb AS DOUBLE)
                          - CAST(1 AS DOUBLE))))) > CAST(0 AS DOUBLE)
          THEN (CAST(two_ua AS DOUBLE)
               - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
            / (CAST(2 AS DOUBLE)
               * sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                   / CAST(12 AS DOUBLE))
                 * ((CAST(na + nb AS DOUBLE) + CAST(1 AS DOUBLE))
                    - CAST(ties AS DOUBLE)
                      / (CAST(na + nb AS DOUBLE)
                         * (CAST(na + nb AS DOUBLE)
                            - CAST(1 AS DOUBLE))))))
          ELSE NULL END AS z
      FROM z"""))

  /** Pairwise source-distribution JS divergence over document unigrams
    * (bits; floor(·2^30) grid for the cross-engine sum). */
  private val q228 = QueryDef(
    "q228_js_divergence",
    (s, d) => Stats.jsDivergence(Tables.documents(s, d), "text", "source"),
    Some {
      val pa = "(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))"
      val qb = "(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))"
      val term =
        s"""$pa * ln(CAST(2 AS DOUBLE) * $pa / ($pa + $qb))
            + $qb * ln(CAST(2 AS DOUBLE) * $qb / ($pa + $qb))"""
      s"""
      WITH tok AS (SELECT source AS g, unnest(${ExtQueries.oToks("text")})
                AS token
             FROM documents WHERE source IS NOT NULL),
      cnt AS (SELECT g, token, CAST(count(*) AS BIGINT) AS c
              FROM tok GROUP BY 1, 2),
      tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS total
              FROM cnt GROUP BY 1),
      d AS (SELECT cnt.g, token, c, total FROM cnt JOIN tot USING (g)),
      j AS (SELECT a.g AS ga, b.g AS gb, a.c AS ca, a.total AS na,
              b.c AS cb, b.total AS nb
            FROM d a JOIN d b ON a.token = b.token AND a.g < b.g),
      sc AS (SELECT ga, gb, ca, cb,
               CAST(floor(($term) * 1073741824.0) AS BIGINT) AS scaled
             FROM j),
      g2 AS (SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_shared_terms,
               CAST(sum(scaled) AS BIGINT) AS common,
               CAST(sum(ca) AS BIGINT) AS ma, CAST(sum(cb) AS BIGINT) AS mb
             FROM sc GROUP BY 1, 2),
      ap AS (SELECT a.g AS ga, a.total AS na, b.g AS gb, b.total AS nb
             FROM tot a JOIN tot b ON a.g < b.g)
      SELECT ap.ga AS group_a, ap.gb AS group_b,
        ap.na AS n_tokens_a, ap.nb AS n_tokens_b,
        COALESCE(g2.n_shared_terms, 0) AS n_shared_terms,
        ((0.5 * (CAST(COALESCE(g2.common, 0) AS DOUBLE) / 1073741824.0)
          + 0.5 * 0.6931471805599453
            * ((CAST(1 AS DOUBLE) - CAST(COALESCE(g2.ma, 0) AS DOUBLE)
                  / CAST(ap.na AS DOUBLE))
               + (CAST(1 AS DOUBLE) - CAST(COALESCE(g2.mb, 0) AS DOUBLE)
                  / CAST(ap.nb AS DOUBLE))))
         / 0.6931471805599453) AS jsd_bits
      FROM ap LEFT JOIN g2 ON g2.ga = ap.ga AND g2.gb = ap.gb"""
    })

  val all: Seq[QueryDef] = Seq(q226, q227, q228)
}
