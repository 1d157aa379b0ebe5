package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `sorted_common(a, b)`: the number of elements two SORTED-ascending,
  * duplicate-free `array<bigint>` columns share — i.e.
  * `size(array_intersect(a, b))`, computed by a single merge walk instead
  * of a per-row hash-set build.
  *
  * Why it exists: exact set-similarity verification (the prefix-filter
  * join) evaluates an intersection size per CANDIDATE PAIR, and Catalyst
  * inlines the expression into join conditions and projections where it
  * can be evaluated several times per row. `array_intersect` allocates
  * and fills a hash set each evaluation (~35 µs/row measured on 23-token
  * docs); this merge is two pointer walks over primitive longs (~50
  * comparisons at that size), cheap enough that re-evaluation is free.
  * Sorting is hoisted to the per-DOCUMENT tokenization (one `array_sort`
  * per doc), not paid per pair.
  *
  * Contract: both arrays sorted ascending with distinct elements (the
  * producer uses `array_sort(transform(array_distinct(...), xxhash64))`).
  * NULL ARRAY → NULL. Null ELEMENTS sort last under `array_sort` and
  * match iff both sides contain one, mirroring `array_intersect`'s
  * null-as-a-value semantics on distinct inputs.
  */
case class SortedCommonCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_common expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_common"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var cnt = 0L
    var i = 0
    var j = 0
    var nullSide = 0 // 1 = left hit a null element, 2 = right
    while (nullSide == 0 && i < na && j < nb) {
      if (x.isNullAt(i)) nullSide = 1
      else if (y.isNullAt(j)) nullSide = 2
      else {
        val u = x.getLong(i)
        val v = y.getLong(j)
        if (u == v) { cnt += 1; i += 1; j += 1 }
        else if (u < v) i += 1
        else j += 1
      }
    }
    // null elements sort last: one common null iff the other side has one
    if (nullSide == 1) {
      while (j < nb && !y.isNullAt(j)) j += 1
      if (j < nb) cnt += 1
    } else if (nullSide == 2) {
      while (i < na && !x.isNullAt(i)) i += 1
      if (i < na) cnt += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ns = ctx.freshName("nullSide")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
        |int $na = $a.numElements();
        |int $nb = $b.numElements();
        |long $cnt = 0L;
        |int $i = 0;
        |int $j = 0;
        |int $ns = 0;
        |while ($ns == 0 && $i < $na && $j < $nb) {
        |  if ($a.isNullAt($i)) { $ns = 1; }
        |  else if ($b.isNullAt($j)) { $ns = 2; }
        |  else {
        |    long $u = $a.getLong($i);
        |    long $v = $b.getLong($j);
        |    if ($u == $v) { $cnt++; $i++; $j++; }
        |    else if ($u < $v) { $i++; }
        |    else { $j++; }
        |  }
        |}
        |if ($ns == 1) {
        |  while ($j < $nb && !$b.isNullAt($j)) { $j++; }
        |  if ($j < $nb) { $cnt++; }
        |} else if ($ns == 2) {
        |  while ($i < $na && !$a.isNullAt($i)) { $i++; }
        |  if ($i < $na) { $cnt++; }
        |}
        |${ev.value} = $cnt;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCommonCount =
    copy(left = newLeft, right = newRight)
}
