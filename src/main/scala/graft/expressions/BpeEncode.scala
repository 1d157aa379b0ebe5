package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(token, merges)`: apply a learned BPE merge inventory to a
  * whitespace-free token, returning the space-joined symbol sequence.
  *
  * Encoding loop (the classic byte-pair scheme, fully deterministic):
  * start from single characters; at each step, of all adjacent symbol
  * pairs whose concatenation is in the merge inventory, merge the one
  * with the LOWEST merge rank (leftmost occurrence on ties); stop when
  * no adjacent pair is mergeable. The merge inventory is rank-ordered
  * (index 0 = highest-priority merge) and compiled into the expression
  * as a literal — the centroid/hyperplane-literal pattern: a few dozen
  * strings, never a data-sized structure.
  *
  * Output symbols are joined with a single space — safe because tokens
  * come from whitespace splitting, so no symbol can contain a space.
  * NULL in → NULL out. Characters are UTF-16 units (BMP contract, same
  * as the oracle's codepoint `substr`).
  */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects a string token, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: Array[String] = merges.toArray

  override protected def nullSafeEval(t: Any): Any =
    BpeEncode.encode(t.asInstanceOf[UTF8String], mergeArr)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.expressions.BpeEncode$$.MODULE$$.encode($t, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  def encode(tok: UTF8String, merges: Array[String]): UTF8String = {
    val s = tok.toString
    if (s.isEmpty) return UTF8String.fromString("")
    val rank = new java.util.HashMap[String, Integer](merges.length * 2)
    var r = 0
    while (r < merges.length) {
      if (!rank.containsKey(merges(r))) rank.put(merges(r), r)
      r += 1
    }
    val syms = new java.util.ArrayList[String](s.length)
    var c = 0
    while (c < s.length) { syms.add(String.valueOf(s.charAt(c))); c += 1 }
    var done = false
    while (!done) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.size - 1) {
        val rr = rank.get(syms.get(i) + syms.get(i + 1))
        if (rr != null && rr < bestRank) { bestRank = rr; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        syms.set(bestI, syms.get(bestI) + syms.get(bestI + 1))
        syms.remove(bestI + 1)
      }
    }
    UTF8String.fromString(String.join(" ", syms))
  }
}
