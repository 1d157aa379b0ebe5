package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler_ppm(a, b)`: Jaro–Winkler similarity as an EXACT integer
  * in parts-per-million (0..1,000,000).
  *
  * Why integer ppm instead of a double: the float formula's low bits
  * depend on evaluation order, so a float score can never be
  * hash-compared across engines, and threshold predicates
  * (`jw >= 0.9`) flip on values that land exactly on the boundary. Here
  * the Jaro fraction is kept as an integer numerator/denominator
  * (common denominator `6·|a|·|b|·m`, transpositions counted ×2 to stay
  * integral), the Winkler prefix boost (p = 0.1, prefix capped at 4,
  * applied unconditionally — no 0.7 "boost threshold") folds in as
  * another exact rational, and the result is one floor division. Any
  * engine replaying the algorithm gets the identical integer — the
  * DuckDB oracle does, via a recursive-CTE greedy matcher.
  *
  * Semantics: empty or NULL on either side → 0 / NULL respectively;
  * inputs are truncated to 2048 chars (keeps every intermediate inside
  * int64; the standard use is name/title linkage, far below the cap).
  * Matching is the classic greedy window scan: `a[i]` pairs with the
  * smallest unused `j` with `b[j] = a[i]` and `|i−j| ≤ max(⌊max(|a|,|b|)/2⌋−1, 0)`.
  */
case class JaroWinklerPpm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_ppm expects (string, string), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler_ppm"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerPpm.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinklerPpm$$.MODULE$$.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerPpm =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerPpm {

  /** Cap that keeps `10·num·10^6` inside int64 (see scaladoc). */
  val MaxLen = 2048

  def compute(ua: UTF8String, ub: UTF8String): Long = {
    var a = ua.toString
    var b = ub.toString
    if (a.length > MaxLen) a = a.substring(0, MaxLen)
    if (b.length > MaxLen) b = b.substring(0, MaxLen)
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0L
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + w)
      var j = math.max(0, i - w)
      var matched = false
      while (!matched && j <= hi) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    var l = 0
    while (l < 4 && l < la && l < lb && a.charAt(l) == b.charAt(l)) l += 1
    val lm = m.toLong
    val num = 2L * lm * lm * (la + lb) + (2L * lm - t) * la.toLong * lb
    val den = 6L * la * lb * lm
    val jwNum = 10L * num + l * (den - num)
    jwNum * 1000000L / (10L * den) // all positive: truncation == floor
  }
}
