package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.Stats

/** Round-6 wave 17: score/feature diagnostics — threshold-free ranking
  * quality (ROC AUC), risk-style feature screening (WOE / information
  * value), and categorical-dependence auditing (mutual information).
  *
  * q229 asks "does the stopword-ratio score actually order English
  * docs above the rest" (the threshold-free complement of q179's
  * argmax confusion report); q230 profiles order value against
  * high-priority outcomes bin by bin the way a risk model screens a
  * feature; q231 measures how far the corpus's language × source grid
  * is from independence — per-source language skew a mixture design
  * must correct for.
  */
object R6oQueries {

  /** ROC AUC of the English-stopword-ratio score for lang = 'en', via
    * the rank identity AUC = U⁺/(n⁺·n⁻) (exact ties handling). */
  private val q229 = QueryDef(
    "q229_roc_auc",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Stats.rocAuc(docs,
        TextFunctions.stopwordRatio(TextFunctions.tokens(col("text"))),
        col("lang") === "en")
    },
    Some(s"""
      WITH d0 AS (SELECT
              CAST(len(list_filter(w, x -> x IN (${ExtQueries.stopList})))
                AS DOUBLE) / CAST(NULLIF(len(w), 0) AS DOUBLE) AS v,
              (lang = 'en') AS a
            FROM (SELECT lang, ${ExtQueries.oToks("text")} AS w
                  FROM documents)),
      ${ExtQueries.oCdfFrom(
        "SELECT v, a FROM d0 WHERE v IS NOT NULL AND a IS NOT NULL")},
      ${ExtQueries.oMannWhitneyAgg}
      SELECT n_pos, n_neg, auc,
        CAST(2 AS DOUBLE) * auc - CAST(1 AS DOUBLE) AS gini
      FROM (SELECT na AS n_pos, nb AS n_neg,
              (CAST(two_ua AS DOUBLE) / CAST(2 AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS auc
            FROM z)"""))

  private val WoeBins = 10

  /** WOE / IV of order value against a high-priority outcome on 10
    * equal-width bins (one-sided bins get NULL WOE, excluded from IV —
    * the standard treatment). */
  private val q230 = QueryDef(
    "q230_woe_iv",
    (s, d) => Stats.woeIv(Tables.orders(s, d),
      col("o_totalprice"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
      bins = WoeBins),
    Some(s"""
      WITH base AS (SELECT CAST(o_totalprice AS DOUBLE) AS v,
              (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS g
            FROM orders
            WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
      bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM base),
      binned AS (SELECT
              CASE WHEN hi = lo THEN 0
                ELSE least(${WoeBins - 1},
                  CAST(floor((v - lo) / ((hi - lo) / ${WoeBins}.0)) AS INT))
                END AS bin,
              g, lo, hi
            FROM base CROSS JOIN bounds),
      cells AS (SELECT bin, min(lo) AS lo, min(hi) AS hi,
              CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
              CAST(sum(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n_bad
            FROM binned GROUP BY 1),
      tot AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg,
              CAST(sum(n_bad) AS BIGINT) AS tb FROM cells),
      scored AS (SELECT bin,
              lo + CAST(bin AS DOUBLE) * ((hi - lo) / ${WoeBins}.0)
                AS bin_lo,
              CASE WHEN bin = ${WoeBins - 1} THEN hi
                ELSE lo + CAST(bin + 1 AS DOUBLE) * ((hi - lo) / ${WoeBins}.0)
                END AS bin_hi,
              n_good, n_bad,
              CASE WHEN n_good > 0 AND n_bad > 0
                THEN ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))
                  / (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))) END AS woe,
              CASE WHEN n_good > 0 AND n_bad > 0
                THEN (CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE)
                    - CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))
                  * ln((CAST(n_good AS DOUBLE) / CAST(tg AS DOUBLE))
                    / (CAST(n_bad AS DOUBLE) / CAST(tb AS DOUBLE))) END
                AS iv_term
            FROM cells CROSS JOIN tot)
      SELECT bin, bin_lo, bin_hi, n_good, n_bad, woe, iv_term,
        sum(COALESCE(iv_term, CAST(0 AS DOUBLE))) OVER (ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS iv_total
      FROM scored"""))

  /** Mutual information (bits) + √-normalized NMI between document
    * language and source (floor(·2^30) grid for every summed term). */
  private val q231 = QueryDef(
    "q231_mutual_info",
    (s, d) => Stats.mutualInfo(Tables.documents(s, d),
      col("lang"), col("source")),
    Some("""
      WITH base AS (SELECT CAST(lang AS VARCHAR) AS x,
              CAST(source AS VARCHAR) AS y
            FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
      cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2),
      mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY 1),
      my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY 1),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
      mi AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
              max(nn) AS n_rows,
              CAST(sum(CAST(floor(((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
                  * ln((CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
                    / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))))
                * 1073741824.0) AS BIGINT)) AS BIGINT) AS mi_s
            FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN n),
      hx AS (SELECT CAST(sum(CAST(floor(
                (-((CAST(cx AS DOUBLE) / CAST(nn AS DOUBLE))
                  * ln(CAST(cx AS DOUBLE) / CAST(nn AS DOUBLE))))
                * 1073741824.0) AS BIGINT)) AS BIGINT) AS hx_s
            FROM mx CROSS JOIN n),
      hy AS (SELECT CAST(sum(CAST(floor(
                (-((CAST(cy AS DOUBLE) / CAST(nn AS DOUBLE))
                  * ln(CAST(cy AS DOUBLE) / CAST(nn AS DOUBLE))))
                * 1073741824.0) AS BIGINT)) AS BIGINT) AS hy_s
            FROM my CROSS JOIN n)
      SELECT n_rows, n_cells,
        (CAST(mi_s AS DOUBLE) / 1073741824.0) / 0.6931471805599453
          AS mi_bits,
        (CAST(hx_s AS DOUBLE) / 1073741824.0) / 0.6931471805599453
          AS h_x_bits,
        (CAST(hy_s AS DOUBLE) / 1073741824.0) / 0.6931471805599453
          AS h_y_bits,
        CASE WHEN (CAST(hx_s AS DOUBLE) / 1073741824.0) > CAST(0 AS DOUBLE)
              AND (CAST(hy_s AS DOUBLE) / 1073741824.0) > CAST(0 AS DOUBLE)
          THEN (CAST(mi_s AS DOUBLE) / 1073741824.0)
            / sqrt((CAST(hx_s AS DOUBLE) / 1073741824.0)
              * (CAST(hy_s AS DOUBLE) / 1073741824.0)) END AS nmi
      FROM mi CROSS JOIN hx CROSS JOIN hy"""))

  val all: Seq[QueryDef] = Seq(q229, q230, q231)
}
