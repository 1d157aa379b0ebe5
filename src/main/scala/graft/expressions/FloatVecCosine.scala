package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two float-vector columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * Similarity.cosine) is semantically identical but its lambdas evaluate
  * interpreted, allocate an intermediate product array per row, and walk
  * the vectors three times. This expression is a single fused pass with a
  * tight codegen'd loop — the (b)-tier of SURVEY §7.3's preference order
  * (custom Catalyst Expression with doGenCode, above any UDF).
  *
  * Accumulation order is strict left-to-right in double precision, exactly
  * matching the HOF fold, so results are bit-identical to both the HOF
  * version and the differential oracle's unrolled SQL.
  *
  * NULL if either input is NULL, and NULL when either vector has zero norm
  * (empty or all-zero): cosine is undefined there, and the naive 0/0 = NaN
  * would rank FIRST under `DESC` ordering (Spark orders NaN above every
  * double), silently displacing genuine neighbors from a top-k. DuckDB's
  * float division yields NULL on /0, so NULL also keeps the differential
  * oracle aligned. Inputs of different lengths compare over the common
  * prefix (callers validate dimensions upstream).
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects (array<float>, array<float>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // zero-norm inputs yield NULL
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xi = (double) $a.getFloat($i);
        |  double $yi = (double) $b.getFloat($i);
        |  $dot += $xi * $yi;
        |  $nx += $xi * $xi;
        |  $ny += $yi * $yi;
        |}
        |if ($nx == 0.0 || $ny == 0.0) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
}
