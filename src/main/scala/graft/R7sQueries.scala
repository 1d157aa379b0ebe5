package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.Stats

/** Round-7 wave 19: optimal summary structures.
  *
  * q277 builds the V-OPTIMAL histogram of order totals — the
  * 8-bucket partition minimizing within-bucket SSE, which equi-width
  * (q116) and equi-depth (q29) histograms only approximate. One
  * distributed pass bins values into 64 integer pre-bins; the
  * O(preBins²·buckets) dynamic program runs on that collected MODEL,
  * and the oracle replays the full DP (including argmin tie-breaks) as
  * unrolled CTE levels.
  */
object R7sQueries {

  private val PreBins = 64
  private val Buckets = 8

  private val q277 = QueryDef(
    "q277_voptimal_hist",
    (s, d) => Stats.vOptimalHistogram(
      Tables.orders(s, d),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long"),
      preBins = PreBins, buckets = Buckets),
    Some {
      def sse(a: String, b: String) =
        s"""CASE WHEN $b.pc - $a.pc = 0 THEN 0.0
             ELSE CAST($b.pq - $a.pq AS DOUBLE)
               - CAST(($b.ps - $a.ps) * ($b.ps - $a.ps) AS DOUBLE)
                 / CAST($b.pc - $a.pc AS DOUBLE) END"""
      val levels = (2 to Buckets).map { b =>
        val cost = s"p.e + ${sse("A", "B")}"
        s"""
      e$b AS MATERIALIZED (
        SELECT 0 AS i, 0.0 AS e, 0 AS j
        UNION ALL
        SELECT i, e, j FROM (
          SELECT B.i AS i, A.i AS j, $cost AS e,
                 row_number() OVER (PARTITION BY B.i
                   ORDER BY $cost, A.i) AS rn
          FROM pref B JOIN pref A ON A.i < B.i
          JOIN e${b - 1} p ON p.i = A.i
          WHERE B.i >= 1) WHERE rn = 1)"""
      }.mkString(",")
      val back = (Buckets to 1 by -1).map { b =>
        if (b == Buckets)
          s"""
      h$b AS (SELECT $PreBins AS hi),
      s$b AS (SELECT e$b.j AS lo FROM e$b, h$b WHERE e$b.i = h$b.hi)"""
        else s"""
      h$b AS (SELECT lo AS hi FROM s${b + 1}),
      s$b AS (SELECT e$b.j AS lo FROM e$b, h$b WHERE e$b.i = h$b.hi)"""
      }.mkString(",")
      val outs = (1 to Buckets).map { b =>
        val hPrev = if (b == 1) "h0" else s"h${b - 1}"
        s"""SELECT $b AS bucket, CAST(A.i + 1 AS INT) AS lo_bin,
             CAST(B.i AS INT) AS hi_bin,
             CAST(B.pc - A.pc AS BIGINT) AS n,
             CASE WHEN B.pc - A.pc = 0 THEN NULL
                  ELSE CAST(B.ps - A.ps AS DOUBLE)
                    / CAST(B.pc - A.pc AS DOUBLE) END AS mean,
             ${sse("A", "B")} AS sse
      FROM pref A, pref B, $hPrev ha, h$b hb
      WHERE A.i = ha.hi AND B.i = hb.hi"""
      }.mkString("\n      UNION ALL ")
      s"""
      WITH vals AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          AS v
        FROM orders WHERE o_totalprice IS NOT NULL),
      bd AS (SELECT min(v) AS lo, max(v) AS hi,
               max(v) - min(v) + 1 AS span FROM vals),
      binned AS (
        SELECT ((v - lo) * $PreBins) // span + 1 AS b, v
        FROM vals CROSS JOIN bd),
      pb AS (SELECT b, CAST(count(*) AS BIGINT) AS c,
               CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS s,
               CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
             FROM binned GROUP BY 1),
      idx AS (SELECT unnest(generate_series(0, $PreBins)) AS i),
      pref AS MATERIALIZED (
        SELECT i.i,
          COALESCE((SELECT CAST(sum(c) AS BIGINT) FROM pb
                    WHERE pb.b <= i.i), 0) AS pc,
          COALESCE((SELECT sum(s) FROM pb WHERE pb.b <= i.i),
                   0::HUGEINT) AS ps,
          COALESCE((SELECT sum(q) FROM pb WHERE pb.b <= i.i),
                   0::HUGEINT) AS pq
        FROM idx i),
      e1 AS MATERIALIZED (
        SELECT 0 AS i, 0.0 AS e, 0 AS j
        UNION ALL
        SELECT B.i, ${sse("A", "B")} AS e, 0 AS j
        FROM pref B JOIN pref A ON A.i = 0 WHERE B.i >= 1),
      $levels,
      h0 AS (SELECT 0 AS hi),
      $back
      $outs"""
    })

  val all: Seq[QueryDef] = Seq(q277)
}
