package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{NearDup, Quality, Windows}

/** Round-6 wave 13: experiment power planning, dedup threshold
  * calibration, and periodicity detection.
  *
  * q217 answers "how long must this A/B run" from pilot variance; q218
  * draws the pair/doc-count curve a corpus owner reads before fixing
  * the near-dup threshold; q219 finds the seasonal grain (weekly cycle
  * peaks at lag 7) that q209's index then profiles.
  */
object R6kQueries {

  /** MDE at alpha 0.05 / power 0.8 per experiment arm from order-value
    * variance (Quality.powerAnalysis; exact integer moments). */
  private val q217 = QueryDef(
    "q217_power_analysis",
    (s, d) => {
      val bucket = conv(substring(md5(col("o_custkey").cast("string")),
        1, 4), 16, 10).cast("int") % 100
      Quality.powerAnalysis(
        Tables.orders(s, d).select(
          when(bucket < 50, "A").otherwise("B").as("arm"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("v")),
        col("arm"), col("v"))
        .withColumnRenamed("grp", "arm")
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(o_custkey AS " +
          s"VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} " +
          s"AS INT) % 100"
      s"""
      WITH o AS (SELECT CASE WHEN $bucket < 50 THEN 'A' ELSE 'B' END
              AS arm,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)
                AS u
            FROM orders),
      g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(u) AS HUGEINT) AS s,
              CAST(SUM(u * u) AS HUGEINT) AS q
            FROM o GROUP BY 1 HAVING COUNT(*) >= 2),
      v AS (SELECT arm, n, s,
              (n * q - s * s) // (n * (n - 1)) AS v2
            FROM g)
      SELECT arm, n,
        CAST(s AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean,
        CAST(v2 AS DOUBLE) / 10000 AS variance,
        2.8015852181129683
          * sqrt(2.0 * (CAST(v2 AS DOUBLE) / 10000) / CAST(n AS DOUBLE))
          AS mde_abs,
        (2.8015852181129683
          * sqrt(2.0 * (CAST(v2 AS DOUBLE) / 10000) / CAST(n AS DOUBLE)))
          / (CAST(s AS DOUBLE) / CAST(n * 100 AS DOUBLE)) AS mde_rel
      FROM v"""
    })

  private val CapDf = 25
  private val SweepThresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  /** Dedup threshold sweep: capped n-gram Jaccard pairs (the q68
    * engine) counted at each candidate threshold, with the distinct
    * documents each threshold would touch. */
  private val q218 = QueryDef(
    "q218_dedup_threshold_sweep",
    (s, d) => {
      import s.implicits._
      val pairs = NearDup.ngramJaccardPairs(Tables.documents(s, d),
          "doc_id", "text", n = 3, threshold = SweepThresholds.min,
          maxDf = CapDf)
        .select(col("a_id"), col("b_id"), col("jaccard"))
      val sweep = pairs
        .select(explode(array(SweepThresholds.map(lit): _*))
          .as("threshold"), col("a_id"), col("b_id"), col("jaccard"))
        .filter(col("jaccard") >= col("threshold"))
      val nPairs = sweep.groupBy(col("threshold"))
        .agg(count(lit(1)).as("n_pairs"))
      val nDocs = sweep
        .select(col("threshold"),
          explode(array(col("a_id"), col("b_id"))).as("doc"))
        .distinct()
        .groupBy(col("threshold")).agg(count(lit(1)).as("n_docs_affected"))
      SweepThresholds.toDF("threshold")
        .join(nPairs, Seq("threshold"), "left")
        .join(nDocs, Seq("threshold"), "left")
        .select(col("threshold"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs_affected"), lit(0L)).as("n_docs_affected"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS (SELECT doc_id,
              list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
            FROM t WHERE len(w) >= 3),
      posting AS (SELECT doc_id, unnest(sh) AS s FROM ws),
      df AS (SELECT s, COUNT(*) AS c FROM posting GROUP BY s),
      capped AS (SELECT p.doc_id, p.s FROM posting p JOIN df USING (s)
            WHERE c <= $CapDf),
      sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              COUNT(*) AS i
            FROM capped a JOIN capped b
              ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      jac AS (SELECT a_id, b_id,
              CAST(i AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i AS DOUBLE)
                AS jaccard
            FROM pairs JOIN sz sa ON a_id = sa.doc_id
                       JOIN sz sb ON b_id = sb.doc_id),
      th AS (SELECT unnest([${SweepThresholds.mkString(", ")}])
              AS threshold),
      sw AS (SELECT th.threshold, j.a_id, j.b_id
            FROM jac j CROSS JOIN th WHERE j.jaccard >= th.threshold),
      np AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM sw GROUP BY 1),
      nd AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_docs_affected
            FROM (SELECT DISTINCT threshold, doc FROM (
              SELECT threshold, a_id AS doc FROM sw
              UNION ALL SELECT threshold, b_id FROM sw))
            GROUP BY 1)
      SELECT th.threshold, COALESCE(np.n_pairs, 0) AS n_pairs,
        COALESCE(nd.n_docs_affected, 0) AS n_docs_affected
      FROM th LEFT JOIN np USING (threshold)
              LEFT JOIN nd USING (threshold)"""))

  private val AcfMaxLag = 14

  /** Autocorrelation of daily revenue per priority at lags 1..14
    * (Windows.autocorrelation; the weekly cycle shows at lag 7). */
  private val q219 = QueryDef(
    "q219_autocorrelation",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull)
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
        .withColumn("idx",
          datediff(col("day"), lit("1970-01-01").cast("date")))
      Windows.autocorrelation(daily, Seq("priority"), "idx", "rev",
        maxLag = AcfMaxLag)
    },
    Some(s"""
      WITH d0 AS (SELECT o_orderpriority AS priority,
              CAST(o_orderdate AS DATE) AS day,
              SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
      d AS (SELECT priority,
              CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
                AS i,
              CAST(y * 100 AS HUGEINT) AS u
            FROM d0),
      st AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(u) AS HUGEINT) AS s,
              CAST(SUM(u * u) AS HUGEINT) AS q
            FROM d GROUP BY 1),
      lg AS (SELECT unnest(generate_series(1, $AcfMaxLag)) AS lag),
      pr AS (SELECT a.priority, lg.lag,
              CAST(COUNT(*) AS BIGINT) AS ck,
              CAST(SUM(a.u * b.u) AS HUGEINT) AS sxy,
              CAST(SUM(a.u) AS HUGEINT) AS sx,
              CAST(SUM(b.u) AS HUGEINT) AS sy
            FROM d a CROSS JOIN lg
            JOIN d b ON b.priority = a.priority AND b.i = a.i + lg.lag
            GROUP BY 1, 2),
      f AS (SELECT pr.priority, pr.lag, pr.ck,
              pr.sxy, pr.sx, pr.sy, st.n, st.s, st.q,
              st.n * st.n * pr.sxy - st.n * st.s * (pr.sx + pr.sy)
                + pr.ck * st.s * st.s AS num,
              st.n * (st.n * st.q - st.s * st.s) AS den
            FROM pr JOIN st USING (priority))
      SELECT priority, CAST(lag AS INT) AS lag, ck AS n_pairs,
        CASE WHEN den > 0
          THEN CAST((num * 1073741824) // den AS DOUBLE) / 1073741824
          END AS autocorr
      FROM f"""))

  val all: Seq[QueryDef] = Seq(q217, q218, q219)
}
