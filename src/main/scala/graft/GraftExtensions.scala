package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.FloatVecCosine

/** Session extensions: registers the library's native expressions as SQL
  * functions so both `spark.sql("vec_cosine(a, b)")` and
  * `call_function("vec_cosine", ...)` resolve.
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or inject programmatically via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "vec_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_cosine expects (array<float>, array<float>)")
        FloatVecCosine(args.head, args(1))
      }))

  /** Imperative registration for sessions built without the extension. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
