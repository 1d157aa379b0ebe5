package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication (SURVEY §2.5 W1; reference SQLproject1.sql:198-211).
  *
  * Reference semantics: `ROW_NUMBER() OVER (PARTITION BY key ORDER BY
  * <preference DESC>)` then delete `rn > 1` — i.e. keep exactly one row per
  * key, chosen by an explicit deterministic ordering (NOT `dropDuplicates`,
  * whose survivor is partition-order-dependent).
  *
  * Scale: one shuffle on the dedup key. Keys here (order/line ids) are
  * high-cardinality, so the shuffle partitions evenly; at 100 TB this is the
  * canonical hash-partitioned window and AQE handles residual skew.
  */
object Dedup {

  /** Keep exactly one row per `keys`, preferring the first row under
    * `ordering` (pass `desc(...)` columns for keep-latest). */
  def keepFirst(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-duplicate groups by a content hash: returns one row per distinct
    * content with the surviving (minimum) id and the duplicate count. */
  def exactGroups(df: DataFrame, idCol: String, contentHash: Column): DataFrame =
    df.groupBy(contentHash.as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
}
