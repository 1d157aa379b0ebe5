package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2.5 W2-W5, §2.6 T1-T2).
  *
  * Reference semantics preserved exactly:
  *  - rolling sums are ROWS-based (`ROWS BETWEEN n-1 PRECEDING AND CURRENT
  *    ROW`, SQLproject1.sql:628-638), i.e. last-n-rows, not last-n-days;
  *  - top-N per group uses RANK (ties all kept, :689-699), not ROW_NUMBER;
  *  - share-of-total divides by a whole-partition sum guarded with
  *    NULLIF(...,0) (:693-694).
  *
  * Scale: each helper costs exactly one shuffle on its partition keys.
  * Low-cardinality partition keys (e.g. region) are a skew risk at 100 TB —
  * callers should pre-aggregate to the window grain first (as the reference
  * views do), which both shrinks the data and bounds per-partition row
  * counts before the sort.
  */
object Windows {

  /** W2/T1: deterministic line numbering within a group. */
  def lineNumber(df: DataFrame, partition: Seq[Column], ordering: Seq[Column],
                 as: String = "line_no"): DataFrame =
    df.withColumn(as,
      row_number().over(Window.partitionBy(partition: _*).orderBy(ordering: _*)))

  /** T1: latest row per key (`TOP(1) ... ORDER BY ... DESC` per group). */
  def latestPerKey(df: DataFrame, keys: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W3: rolling sum over the previous `n` rows (inclusive), ROWS-framed. */
  def rollingSum(df: DataFrame, partition: Seq[Column], ordering: Seq[Column],
                 measure: Column, n: Int, as: String): DataFrame =
    df.withColumn(as, sum(measure).over(
      Window.partitionBy(partition: _*).orderBy(ordering: _*)
        .rowsBetween(-(n - 1), Window.currentRow)))

  /** W4/T2: top-N per group by RANK (ties kept). */
  def topNPerGroup(df: DataFrame, partition: Seq[Column], score: Column,
                   n: Int, rankCol: String = "rnk"): DataFrame =
    df.withColumn(rankCol,
        rank().over(Window.partitionBy(partition: _*).orderBy(score.desc)))
      .filter(col(rankCol) <= n)

  /** W5: share of the whole-partition total, NULL when the total is 0. */
  def shareOfTotal(measure: Column, partition: Seq[Column]): Column =
    measure / nullif(sum(measure).over(Window.partitionBy(partition: _*)), lit(0))

  /** Gaps-and-islands: maximal runs of CONSECUTIVE days per key. The
    * classic anchor trick — `date - row_number() days` is constant within
    * a consecutive run — turns island detection into a plain groupBy.
    * Emits (key, streak_start, streak_end, n_days), one row per island.
    *
    * Scale: the distinct-date prep, the window, and the island groupBy all
    * hash on `keyCol`, so Spark plans ONE exchange and reuses it; islands
    * per key are bounded by dates per key, never materialized as lists. */
  def gapsAndIslands(df: DataFrame, keyCol: String, dateCol: String): DataFrame = {
    val days = df
      .select(col(keyCol).as("k"), to_date(col(dateCol)).as("d"))
      .filter(col("d").isNotNull).distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
    days
      .withColumn("__anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("k"), col("__anchor"))
      .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
        count(lit(1)).as("n_days"))
      .drop("__anchor")
      .withColumnRenamed("k", keyCol)
  }

  /** T3/T4 distribution-rank suite in one window pass: ntile quartile,
    * percent_rank, cume_dist, dense_rank over `ordering` within
    * `partition`. The ordering should be a TOTAL order (include tiebreak
    * key columns in both `ordering` and the emitted projection): ntile
    * splits ties across buckets, so rows identical under the ordering must
    * also be identical in the output for the result to be well-defined. */
  def rankSuite(df: DataFrame, partition: Seq[Column],
                ordering: Seq[Column], buckets: Int): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(ordering: _*)
    df.withColumn("bucket", ntile(buckets).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
      .withColumn("dense_rank", dense_rank().over(w))
  }
}
