package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into the `private[sql]` Dataset constructor so graft can
  * wrap its own logical operators (e.g. `graft.plans.GroupedTopKNode`) in a
  * DataFrame. Living under `org.apache.spark.sql` for access scope is the
  * standard technique Spark-native open-source libraries use for exactly
  * this purpose; nothing here touches non-public Spark behavior beyond the
  * constructor's visibility.
  */
object PlanInjection {

  /** Wrap a (possibly unresolved) logical plan as a DataFrame; the
    * analyzer resolves it like any query. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame, for use as a child of a
    * custom logical node. */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** The Catalyst expression behind a Column, converted EAGERLY via the
    * session's ColumnNode converter (Spark 4 wraps a ColumnNode; the lazy
    * `ExpressionUtils.expression` wrapper is not serializable and a
    * `.desc` column would hide its SortOrder inside the node). */
  def expr(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Idempotently append a planner strategy to the session (the runtime
    * equivalent of `SparkSessionExtensions.injectPlannerStrategy`, for
    * sessions built without `spark.sql.extensions`). */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val ex = spark.asInstanceOf[classic.SparkSession].experimental
    ex.synchronized {
      if (!ex.extraStrategies.contains(strategy)) {
        ex.extraStrategies = ex.extraStrategies :+ strategy
      }
    }
  }

  /** Idempotently append an optimizer rule (runtime equivalent of
    * `SparkSessionExtensions.injectOptimizerRule`). */
  def ensureOptimization(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val ex = spark.asInstanceOf[classic.SparkSession].experimental
    ex.synchronized {
      if (!ex.extraOptimizations.contains(rule)) {
        ex.extraOptimizations = ex.extraOptimizations :+ rule
      }
    }
  }
}
