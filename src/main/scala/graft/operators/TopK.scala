package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graftshim.PlanInjection

import graft.plans.{GroupedTopKFilterPushdown, GroupedTopKNode, GroupedTopKStrategy, WindowTopKRewrite}

/** Grouped top-k via the custom physical operator
  * ([[graft.plans.GroupedTopKExec]]): per-group bounded heaps with a
  * map-side partial pass, instead of the window plan's full
  * shuffle+sort+filter. Same answer as
  * `Windows.topNPerGroup`-with-row_number when `order` is a total order;
  * see the node's Scaladoc for the memory/scale contract.
  */
object TopK {

  /** Keep the k first rows of each group under `order` (ascending unless
    * the caller passes `.desc` columns — i.e. ROW_NUMBER() <= k
    * semantics). `order` should be total (append unique tiebreakers) for
    * a deterministic answer at the k boundary.
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
               k: Int): DataFrame =
    build(df, groupCols, orderCols, k, withTies = false)

  /** RANK() <= k semantics — the reference top-N view's actual window
    * (SQLproject1.sql:689-699): every row tying the k-th best order
    * value is kept, so groups can emit more than k rows. The retained
    * set is deterministic without tiebreakers (it is exactly
    * `{row : order value ≤ k-th smallest}`); boundary tie width is
    * bounded by `spark.graft.topk.maxTieRowsPerGroup`. */
  def perGroupWithTies(df: DataFrame, groupCols: Seq[Column],
                       orderCols: Seq[Column], k: Int): DataFrame =
    build(df, groupCols, orderCols, k, withTies = true)

  private def build(df: DataFrame, groupCols: Seq[Column],
                    orderCols: Seq[Column], k: Int,
                    withTies: Boolean): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val order = orderCols.map(PlanInjection.expr(spark, _)).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    PlanInjection.ofRows(spark,
      GroupedTopKNode(groupCols.map(PlanInjection.expr(spark, _)), order, k,
        PlanInjection.analyzedPlan(df), withTies = withTies))
  }

  /** Make the planner able to place [[GroupedTopKNode]] on this session
    * and enable group-key filter pushdown through it, plus the opt-in
    * window rewrite (conf-gated, inert unless
    * `spark.graft.topk.rewriteWindow=true`). No-op when
    * `GraftExtensions` already injected them. */
  def ensureRegistered(spark: SparkSession): Unit = {
    PlanInjection.ensureStrategy(spark, GroupedTopKStrategy)
    PlanInjection.ensureOptimization(spark, GroupedTopKFilterPushdown)
    PlanInjection.ensureOptimization(spark, WindowTopKRewrite)
  }
}
