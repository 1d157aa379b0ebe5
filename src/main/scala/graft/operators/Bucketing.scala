package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Hash-bucketed table layout: the shuffle-free fact-to-fact join.
  *
  * A `groupBy`/`join` on an unbucketed 100 TB fact pays a full shuffle of
  * the fact EVERY query. Spark's Hive-style bucketing moves that cost to
  * write time, once: `bucketBy(n, key)` routes each row to
  * `pmod(murmur3(key), n)` within every write task, and the catalog
  * records the layout, so a later scan reports `HashPartitioning(key, n)`
  * and Catalyst drops the Exchange under any equi-join or aggregation
  * keyed on `key` between tables bucketed the same way (same count, same
  * key). `sortBy` additionally pre-sorts rows inside each bucket file so
  * sort-merge join skips its per-side Sort too — the scan-to-join path is
  * a pure streaming merge.
  *
  * This is the layout decision the reference's warehouse makes implicitly
  * by clustering its fact on the order key (SQLproject1.sql:288-340 loads
  * FactSales keyed on (OrderID, ProductID)); at Spark scale it becomes an
  * explicit bucketed write. [[writeBucketed]] + [[shuffleExchangeCount]]
  * make the contract testable: q329 asserts the joined-and-aggregated
  * plan contains ZERO shuffle exchanges.
  *
  * Scale notes:
  *  - bucket count is a cluster-lifetime constant per table family; both
  *    join sides MUST agree (Spark joins mismatched counts by disabling
  *    one side's bucketed scan, reintroducing the exchange).
  *  - each write task emits up to `buckets` files; at 100 TB pair the
  *    bucketed write with a `repartition(buckets, key)` upstream so each
  *    task writes exactly one bucket file (done here), avoiding the
  *    tasks x buckets small-file explosion.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and in-bucket
    * sorted) on `key`. Idempotent across JVMs: drops the catalog entry
    * and deletes any stale physical location first — the in-memory
    * catalog forgets tables between runs but the warehouse directory
    * survives, and Spark (correctly) refuses to create a managed table
    * over a non-empty leftover location. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    deleteManagedLocation(spark, table)
    // one file per bucket: co-locate each bucket's rows into one write
    // task (see scale notes above)
    val w = df.repartition(buckets, df.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** The default managed location `<warehouse>/<table>` (lowercased, the
    * catalog's normalization), removed if present. */
  private def deleteManagedLocation(spark: SparkSession,
      table: String): Unit = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Number of shuffle exchanges the physical plan would execute —
    * the co-location proof (0 for a correctly bucketed join+agg).
    * Descends into AQE's initial plan, where exchanges live before
    * runtime re-optimization. */
  def shuffleExchangeCount(df: DataFrame): Int = {
    def count(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
        case other => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }
}
