package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{EventOps, Quality}

/** Round-6 wave 14: survival analysis, financial forensics, and causal
  * effect estimation.
  *
  * q220 answers "how long after signup does conversion happen, with
  * censoring handled honestly" (the Kaplan-Meier curve product teams
  * read instead of naive conversion averages); q221 screens the order
  * amounts against Benford's law before anyone trusts the revenue facts;
  * q222 estimates a treatment effect with a pre/post control correction
  * (difference-in-differences), the step beyond q217's raw A/B compare.
  */
object R6lQueries {

  /** Kaplan-Meier survival: first 'signup' opens each user's clock, the
    * first 'purchase' at/after it is the event, censoring at the global
    * last observed day. Scaled-integer cumulative product (2^30 grid)
    * replayed by a recursive-CTE oracle. */
  private val q220 = QueryDef(
    "q220_kaplan_meier",
    (s, d) => EventOps.kaplanMeier(Tables.events(s, d),
      col("user_id"), col("ts"), col("event_type"), "signup", "purchase"),
    Some("""
      WITH RECURSIVE e AS (
        SELECT user_id AS u, CAST(ts AS DATE) AS day, event_type AS t
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      h AS (SELECT max(day) AS h FROM e),
      st AS (SELECT u, min(day) AS start_day FROM e
             WHERE t = 'signup' GROUP BY 1),
      fd AS (SELECT e.u, min(e.day) AS death_day
             FROM e JOIN st ON e.u = st.u
             WHERE e.t = 'purchase' AND e.day >= st.start_day
             GROUP BY 1),
      subj AS (SELECT
                 CAST(CASE WHEN fd.death_day IS NOT NULL
                      THEN date_diff('day', st.start_day, fd.death_day)
                      ELSE date_diff('day', st.start_day, h.h)
                      END AS INT) AS t_days,
                 CASE WHEN fd.death_day IS NOT NULL THEN 1 ELSE 0 END AS ev
               FROM st LEFT JOIN fd ON st.u = fd.u CROSS JOIN h),
      steps AS (SELECT t_days, CAST(count(*) AS BIGINT) AS leave_n,
                  CAST(sum(ev) AS BIGINT) AS d
                FROM subj GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM subj),
      risked AS (SELECT t_days,
                   n - COALESCE(CAST(sum(leave_n) OVER (ORDER BY t_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS BIGINT), 0) AS n_risk,
                   d, leave_n - d AS c,
                   row_number() OVER (ORDER BY t_days) AS rn
                 FROM steps CROSS JOIN tot),
      rec AS (
        SELECT rn, t_days, n_risk, d, c,
               (1073741824 * (n_risk - d)) // n_risk AS s
        FROM risked WHERE rn = 1
        UNION ALL
        SELECT r.rn, r.t_days, r.n_risk, r.d, r.c,
               (rec.s * (r.n_risk - r.d)) // r.n_risk
        FROM risked r JOIN rec ON r.rn = rec.rn + 1)
      SELECT t_days, n_risk, d AS n_events, c AS n_censored,
             CAST(s AS DOUBLE) / 1073741824.0 AS survival
      FROM rec"""))

  /** Benford first-digit screen over order amounts. The chi-square is a
    * fixed-order nine-term expression over exact integer counts; the
    * expected shares are identical shortest-repr literals in both
    * engines. */
  private val q221 = QueryDef(
    "q221_benford_audit",
    (s, d) => Quality.benfordAudit(Tables.orders(s, d),
      col("o_totalprice")),
    Some {
      val p = Array("0.3010299956639812", "0.17609125905568124",
        "0.12493873660829992", "0.09691001300805642",
        "0.07918124604762482", "0.06694678963061322",
        "0.05799194697768673", "0.05115252244738129",
        "0.04575749056067514")
      val obsCols = (1 to 9).map(dg =>
        s"""CAST(sum(CASE WHEN substr(CAST(cents AS VARCHAR), 1, 1)
            = '$dg' THEN 1 ELSE 0 END) AS BIGINT) AS o$dg""")
        .mkString(",\n             ")
      val chi2 = (1 to 9).map { dg =>
        val e = s"(CAST(n AS DOUBLE) * ${p(dg - 1)})"
        s"(CAST(o$dg AS DOUBLE) - $e) * (CAST(o$dg AS DOUBLE) - $e) / $e"
      }.mkString("\n          + ")
      val obsCase = (1 to 9).map(dg => s"WHEN $dg THEN o$dg")
        .mkString(" ")
      val shareCase = (1 to 9)
        .map(dg => s"WHEN $dg THEN CAST(${p(dg - 1)} AS DOUBLE)")
        .mkString(" ")
      s"""
      WITH v AS (SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   * 100 AS DECIMAL(20,0)) AS BIGINT) AS cents
                 FROM orders),
      o AS (SELECT CAST(count(*) AS BIGINT) AS n,
             $obsCols
            FROM v WHERE cents > 0),
      c AS (SELECT o.*, $chi2 AS chi2 FROM o),
      dg AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS digit)
      SELECT dg.digit,
             CASE dg.digit $obsCase END AS observed,
             CASE dg.digit $shareCase END AS expected_share,
             CAST(n AS DOUBLE) * (CASE dg.digit $shareCase END)
               AS expected_n,
             n AS n_total, chi2
      FROM dg CROSS JOIN c"""
    })

  /** Difference-in-differences: treated = deterministic md5 bucket of the
    * customer key, post = orders from 1998-07-01 on. Four exact-moment
    * cells from one scan; DiD, pooled SE and t-stat as fixed-order row
    * math (the q217 determinism discipline). */
  private val q222 = QueryDef(
    "q222_did_estimator",
    (s, d) => {
      val bucket = conv(substring(md5(col("o_custkey").cast("string")),
        1, 4), 16, 10).cast("int") % 100
      Quality.didEstimator(Tables.orders(s, d),
        bucket < 50,
        col("o_orderdate") >= lit("1998-07-01").cast("timestamp"),
        col("o_totalprice").cast(DecimalType(18, 2)))
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(o_custkey AS " +
          s"VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} " +
          s"AS INT) % 100"
      val cellPred = Map(
        "t1" -> "tr AND po", "t0" -> "tr AND NOT po",
        "c1" -> "NOT tr AND po", "c0" -> "NOT tr AND NOT po")
      val cells = Seq("t1", "t0", "c1", "c0")
      val aggCols = cells.map { k =>
        s"""CAST(sum(CASE WHEN ${cellPred(k)} THEN 1 ELSE 0 END) AS BIGINT)
              AS n_$k,
            CAST(sum(CASE WHEN ${cellPred(k)} THEN u ELSE 0 END)
              AS HUGEINT) AS s_$k,
            CAST(sum(CASE WHEN ${cellPred(k)} THEN u * u ELSE 0 END)
              AS HUGEINT) AS q_$k"""
      }.mkString(",\n            ")
      def mean(k: String) =
        s"(CAST(s_$k AS DOUBLE) / CAST(n_$k * 100 AS DOUBLE))"
      def se2(k: String) =
        s"(CAST((n_$k * q_$k - s_$k * s_$k) // (n_$k * (n_$k - 1)) " +
          s"AS DOUBLE) / 10000.0 / CAST(n_$k AS DOUBLE))"
      s"""
      WITH b AS (SELECT ($bucket) < 50 AS tr,
              o_orderdate >= TIMESTAMP '1998-07-01' AS po,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
                AS u
            FROM orders),
      g AS (SELECT
            $aggCols
            FROM b),
      f AS (SELECT g.*,
              ((${mean("t1")} - ${mean("t0")})
                - (${mean("c1")} - ${mean("c0")})) AS did,
              sqrt(${se2("t1")} + ${se2("t0")} + ${se2("c1")}
                + ${se2("c0")}) AS se_did
            FROM g)
      SELECT n_t1 + n_t0 + n_c1 + n_c0 AS n_total,
             n_t1, n_t0, n_c1, n_c0,
             ${mean("t1")} AS mean_t1, ${mean("t0")} AS mean_t0,
             ${mean("c1")} AS mean_c1, ${mean("c0")} AS mean_c0,
             did, se_did, did / se_did AS t_stat
      FROM f"""
    })

  val all: Seq[QueryDef] = Seq(q220, q221, q222)
}
