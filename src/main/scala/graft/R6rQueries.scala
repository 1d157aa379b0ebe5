package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{EventOps, Quality, Windows}

/** Round-6 wave 20: data-driven attribution, exponential smoothing, and
  * FDR-controlled drift screening.
  *
  * q238 credits channels by removal effect on an absorbing Markov chain
  * (what last-touch/position rules hard-code, measured instead); q239
  * smooths daily revenue with a truncated EWMA (the windowed form of
  * the sequential recurrence); q240 answers "which sources' language
  * mix drifted" with chi-square tests under Benjamini–Hochberg FDR
  * control — the multiple-testing-safe screen.
  */
object R6rQueries {

  private val Channels = Seq("click", "error", "signup", "view")
  private val ConvType = "purchase"
  private val MarkovIters = 50

  /** Markov removal-effect attribution over event journeys. */
  private val q238 = QueryDef(
    "q238_markov_attribution",
    (s, d) => EventOps.markovAttribution(Tables.events(s, d),
      "user_id", "ts", "event_type", "event_id", ConvType, Channels,
      MarkovIters),
    Some {
      val typesIn = (ConvType +: Channels).map(c => s"'$c'").mkString(", ")
      val variants = ("'__none'" +: Channels.map(c => s"'$c'"))
        .map(v => s"($v)").mkString(", ")
      val snap = (x: String) =>
        s"CAST(floor(($x) * 1073741824.0) AS BIGINT) / 1073741824.0"
      val mk = (1 until MarkovIters).map { i =>
        s"""m$i AS MATERIALIZED (SELECT t.removed, t.to_s AS state,
             ${snap(s"sum(m.mass * t.p)")} AS mass
           FROM m${i - 1} m JOIN tv t ON t.removed = m.removed
             AND t.fr = m.state
           WHERE t.to_s NOT IN ('__conv', '__null')
           GROUP BY 1, 2)"""
      }.mkString(",\n      ")
      val allm = (0 until MarkovIters).map(i => s"SELECT * FROM m$i")
        .mkString("\n        UNION ALL ")
      s"""
      WITH evs AS (SELECT user_id, ts, event_id, event_type,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS rn
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
              AND event_type IN ($typesIn)),
      crn AS (SELECT user_id, min(rn) AS crn FROM evs
              WHERE event_type = '$ConvType' GROUP BY 1),
      j AS (SELECT e.*, crn.crn FROM evs e LEFT JOIN crn USING (user_id)
            WHERE crn.crn IS NULL OR e.rn <= crn.crn),
      st AS (SELECT j.*, lead(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS nxt,
              max(rn) OVER (PARTITION BY user_id) AS maxrn
            FROM j),
      tr AS (
        SELECT '__start' AS fr,
          CASE WHEN event_type = '$ConvType' THEN '__conv'
            ELSE event_type END AS to_s
        FROM st WHERE rn = 1
        UNION ALL
        SELECT event_type,
          CASE WHEN nxt = '$ConvType' THEN '__conv' ELSE nxt END
        FROM st WHERE nxt IS NOT NULL
        UNION ALL
        SELECT event_type, '__null' FROM st
        WHERE crn IS NULL AND rn = maxrn),
      cnt AS (SELECT fr, to_s, CAST(count(*) AS BIGINT) AS n
              FROM tr GROUP BY 1, 2),
      rs AS (SELECT fr, CAST(sum(n) AS HUGEINT) AS tot
             FROM cnt GROUP BY 1),
      tp AS (SELECT fr, to_s,
               CAST((CAST(n AS HUGEINT) * 1048576) // tot AS DOUBLE)
                 / 1048576.0 AS p
             FROM cnt JOIN rs USING (fr)),
      vr AS (SELECT * FROM (VALUES $variants) v(removed)),
      tv AS MATERIALIZED (SELECT vr.removed, tp.fr, tp.to_s, tp.p
             FROM tp CROSS JOIN vr
             WHERE tp.fr <> vr.removed AND tp.to_s <> vr.removed),
      m0 AS MATERIALIZED (SELECT removed, '__start' AS state,
             CAST(1 AS DOUBLE) AS mass
             FROM vr),
      $mk,
      allm AS ($allm),
      conv AS (SELECT m.removed, sum(m.mass * t.p) AS pconv
               FROM allm m JOIN tv t ON t.removed = m.removed
                 AND t.fr = m.state AND t.to_s = '__conv'
               GROUP BY 1),
      pfull AS (SELECT pconv FROM conv WHERE removed = '__none'),
      res AS (SELECT v.removed AS channel, f.pconv AS p_full,
                COALESCE(c.pconv, CAST(0 AS DOUBLE)) AS p_removed
              FROM vr v CROSS JOIN pfull f
              LEFT JOIN conv c ON c.removed = v.removed
              WHERE v.removed <> '__none'),
      re AS (SELECT channel, p_full, p_removed,
               CASE WHEN p_full > 0 THEN (p_full - p_removed) / p_full
                 ELSE CAST(0 AS DOUBLE) END AS removal_effect
             FROM res),
      sc AS (SELECT *,
               CAST(floor(removal_effect * 1073741824.0) AS BIGINT) AS re_s
             FROM re),
      tot2 AS (SELECT CAST(sum(re_s) AS BIGINT) AS s FROM sc)
      SELECT channel, p_full, p_removed, removal_effect,
        CASE WHEN s > 0
          THEN floor(removal_effect * 1073741824.0) / CAST(s AS DOUBLE)
          ELSE CAST(0 AS DOUBLE) END AS attribution_share
      FROM sc CROSS JOIN tot2"""
    })

  private val EwmaNum = 1
  private val EwmaDen = 5 // alpha = 1/5
  private val EwmaSpan = 30

  /** Truncated EWMA of daily revenue per order priority (exact integer
    * weights; output cent-quantized by the operator's contract). */
  private val q239 = QueryDef(
    "q239_ewma_daily",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .as("revenue"))
      Windows.truncatedEwma(daily, Seq("prio"), "day", "revenue",
        EwmaNum, EwmaDen, EwmaSpan)
        .select(col("prio"), col("day"),
          col("revenue").cast("double").as("revenue"), col("ewma"))
    },
    Some {
      val terms = (0 until EwmaSpan).map { j =>
        val coeff = BigInt(EwmaDen - EwmaNum).pow(j) *
          BigInt(EwmaDen).pow(EwmaSpan - 1 - j)
        val c = s"CAST('$coeff' AS HUGEINT)"
        val x = if (j == 0) "u"
        else s"lag(u, $j) OVER (PARTITION BY prio ORDER BY day)"
        (s"CASE WHEN $x IS NOT NULL THEN $c * $x " +
          s"ELSE CAST(0 AS HUGEINT) END",
          s"CASE WHEN $x IS NOT NULL THEN $c ELSE CAST(0 AS HUGEINT) END")
      }
      val num = terms.map(_._1).mkString(" + ")
      val den = terms.map(_._2).mkString(" + ")
      s"""
      WITH daily AS (SELECT o_orderpriority AS prio,
              CAST(o_orderdate AS DATE) AS day,
              sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS rev,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) * 100
                AS HUGEINT) AS u
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
            GROUP BY 1, 2)
      SELECT prio, day, CAST(rev AS DOUBLE) AS revenue,
        CAST(($num) // ($den) AS DOUBLE) / 100.0 AS ewma
      FROM daily"""
    })

  private val DriftCats = Seq("en", "fr", "de", "es", "zh")
  private val FdrQ = 0.10

  /** BH-FDR language-mix drift screen across sources. */
  private val q240 = QueryDef(
    "q240_fdr_drift",
    (s, d) => Quality.bhDriftScreen(Tables.documents(s, d),
      "source", "lang", DriftCats, FdrQ),
    Some {
      val catsIn = DriftCats.map(c => s"'$c'").mkString(", ")
      val nCols = DriftCats.map(c0 =>
        s"CAST(sum(CASE WHEN c = '$c0' THEN 1 ELSE 0 END) AS BIGINT) " +
          s"AS n_$c0").mkString(", ")
      val tCols = DriftCats.map(c0 =>
        s"CAST(sum(n_$c0) AS BIGINT) AS t_$c0").mkString(", ")
      val chi2 = DriftCats.map { c0 =>
        val e = s"(CAST(n AS DOUBLE) * CAST(t_$c0 AS DOUBLE)) " +
          s"/ CAST(nn AS DOUBLE)"
        s"""CASE WHEN t_$c0 > 0
             THEN (CAST(n_$c0 AS DOUBLE) - $e)
               * (CAST(n_$c0 AS DOUBLE) - $e) / ($e)
             ELSE 0.0 END"""
      }.mkString(" + ")
      s"""
      WITH base AS (SELECT source AS g, lang AS c FROM documents
            WHERE source IS NOT NULL AND lang IN ($catsIn)),
      pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n, $nCols
             FROM base GROUP BY 1),
      tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn, $tCols FROM pg),
      x AS (SELECT g, n, ($chi2) AS chi2 FROM pg CROSS JOIN tt),
      p AS (SELECT g, n, chi2,
              CAST(CAST(floor((exp(0.0 - chi2 / 2.0)
                  * (1.0 * 1.0 + 1.0 * (chi2 / 2.0) * 1.0))
                * 1073741824.0) AS BIGINT) AS DOUBLE) / 1073741824.0
                AS p_value
            FROM x),
      r AS (SELECT *,
              CAST(row_number() OVER (ORDER BY p_value, g) AS INT)
                AS p_rank,
              CAST(count(*) OVER () AS BIGINT) AS m
            FROM p),
      cut AS (SELECT max(CASE WHEN p_value <=
                (CAST(p_rank AS DOUBLE) / CAST(m AS DOUBLE)) * $FdrQ
                THEN p_rank END) AS cutr
              FROM r)
      SELECT g AS "group", n, chi2, p_value, p_rank,
        COALESCE(p_rank <= cutr, false) AS drifted
      FROM r CROSS JOIN cut"""
    })

  val all: Seq[QueryDef] = Seq(q238, q239, q240)
}
