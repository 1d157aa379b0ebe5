package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-8 wave 7: data-outage detection.
  *
  * q298 reports contiguous runs of MISSING days per priority series —
  * spine-minus-observed, collapsed to (start, end, length) islands.
  * Freshness checks say "data arrived today"; this says exactly which
  * windows never arrived at all, the first question when a backfill is
  * scoped.
  */
object R8gQueries {

  private val MinGapDays = 2

  private val q298 = QueryDef(
    "q298_coverage_gaps",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull)
        .select(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .distinct()
      val spine = daily.groupBy(col("prio"))
        .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
        .select(col("prio"),
          explode(sequence(col("__lo"), col("__hi"))).as("day"))
      val missing = spine.join(daily, Seq("prio", "day"), "left_anti")
      val w = Window.partitionBy(col("prio")).orderBy(col("day"))
      missing
        .withColumn("__anchor",
          datediff(col("day"), lit("1970-01-01")) - row_number().over(w))
        .groupBy(col("prio"), col("__anchor"))
        .agg(min(col("day")).cast("string").as("gap_start"),
          max(col("day")).cast("string").as("gap_end"),
          count(lit(1)).as("gap_days"))
        .filter(col("gap_days") >= MinGapDays)
        .drop("__anchor")
    },
    Some(s"""
      WITH daily AS (
        SELECT DISTINCT o_orderpriority AS prio,
               CAST(o_orderdate AS DATE) AS day
        FROM orders WHERE o_orderdate IS NOT NULL),
      spine AS (
        SELECT prio, CAST(unnest(generate_series(min(day), max(day),
                 INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily GROUP BY prio),
      missing AS (
        SELECT s.prio, s.day FROM spine s
        WHERE NOT EXISTS (SELECT 1 FROM daily d
                          WHERE d.prio = s.prio AND d.day = s.day)),
      isl AS (
        SELECT prio, day,
               datediff('day', DATE '1970-01-01', day)
                 - row_number() OVER (PARTITION BY prio ORDER BY day)
                 AS anchor
        FROM missing)
      SELECT prio, strftime(min(day), '%Y-%m-%d') AS gap_start,
             strftime(max(day), '%Y-%m-%d') AS gap_end,
             CAST(count(*) AS BIGINT) AS gap_days
      FROM isl GROUP BY prio, anchor
      HAVING count(*) >= $MinGapDays"""))

  val all: Seq[QueryDef] = Seq(q298)
}
