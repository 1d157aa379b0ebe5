package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: which items appear together in the same
  * group (order, session, document)?
  *
  * The pair self-join's work is Σ per-group |items|², so ONE pathological
  * group (a crawler session with 10⁵ items) would dominate the whole
  * job. `maxItemsPerGroup` bounds that: groups with more distinct items
  * are DROPPED ENTIRELY (documented semantics — a cap-to-first-k would
  * silently bias pair counts toward the kept items, while dropping the
  * group keeps every reported count exact over the retained groups). The
  * surviving join is bounded by groups × cap².
  */
object Baskets {

  /** Top-k co-occurring item pairs across groups. Emits
    * (item_a, item_b, n_groups, rank), item_a < item_b, rank by
    * (n_groups desc, item_a, item_b). */
  def coOccurrence(df: DataFrame, groupCol: String, itemCol: String,
                   maxItemsPerGroup: Int, topK: Int): DataFrame = {
    require(maxItemsPerGroup >= 2,
      s"maxItemsPerGroup must be >= 2, got $maxItemsPerGroup")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val items = df
      .select(col(groupCol).as("g"), col(itemCol).as("item"))
      .filter(col("item").isNotNull)
      .distinct()
    val sized = items
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("__n") <= maxItemsPerGroup)
      .select(col("g"), col("item"))
    val pairs = sized.as("a")
      .join(sized.as("b"),
        col("a.g") === col("b.g") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_groups"))
    // top-k as orderBy + limit (TakeOrderedAndProject: per-partition
    // partial top-k, k-row driver merge), NOT a global row_number window
    // — with a high-cardinality item column the pair aggregate is
    // items²-sized and a single-task window sort over it is the exact
    // hazard the group cap exists to avoid; the rank window then runs
    // over only the k surviving rows
    pairs
      .orderBy(col("n_groups").desc, col("item_a"), col("item_b"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_groups").desc, col("item_a"), col("item_b")))
        .cast("int"))
  }
}
