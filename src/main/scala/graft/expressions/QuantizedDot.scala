package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native dot product over int8-quantized code arrays, in the two forms
  * the quantized-similarity paths use:
  *
  *  - `(array<bigint>, array<double>) -> double` — code ⋅ centroid, a
  *    strict left-to-right double fold (k-means assignment scoring);
  *  - `(array<bigint>, array<bigint>) -> bigint` — code ⋅ code, an EXACT
  *    integer sum (quantized top-k, norms).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order folds on these
  * hot paths: HOF lambdas evaluate interpreted, allocate an intermediate
  * product array per row, and walk both arrays twice; this is one fused
  * codegen'd loop. Results are bit-identical to the HOF formulations and
  * the differential oracle's unrolled SQL (same accumulation order and
  * widths). Inputs of different lengths multiply over the common prefix
  * (callers validate dimensions upstream, matching vec_cosine's
  * contract).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def centroidMode: Boolean = right.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) => true
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"q8_dot expects (array<bigint>, array<double|bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType =
    if (centroidMode) DoubleType else LongType
  override def prettyName: String = "q8_dot"

  // a NULL ELEMENT poisons the whole product, matching the HOF fold
  // (x*y = NULL propagates through the aggregate) — reading a null slot
  // as 0 would return a wrong non-NULL dot for containsNull inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    i = 0
    if (centroidMode) {
      var acc = 0.0
      while (i < n) {
        acc += x.getLong(i).toDouble * y.getDouble(i)
        i += 1
      }
      acc
    } else {
      var acc = 0L
      while (i < n) {
        acc += x.getLong(i) * y.getLong(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val (decl, add) =
        if (centroidMode)
          (s"double $acc = 0.0;",
            s"$acc += ((double) $a.getLong($i)) * $b.getDouble($i);")
        else
          (s"long $acc = 0L;", s"$acc += $a.getLong($i) * $b.getLong($i);")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |$decl
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |  $add
        |}
        |if (!${ev.isNull}) {
        |  ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}
