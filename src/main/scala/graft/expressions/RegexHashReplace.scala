package graft.expressions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Replace every regex match with a STABLE pseudonym derived from the
  * matched text: `prefix` + the first 8 md5 hex digits of the match.
  *
  * This is the operation `regexp_replace` cannot express — its replacement
  * is a template over capture groups, not a FUNCTION of the match — and
  * the difference is what makes pseudonymization useful: the same email
  * maps to the same token everywhere (joins, group-bys, and cross-document
  * linkage still work on the pseudonymized corpus), while redaction-style
  * scrubbing (`Corpus.scrubPii`) collapses all matches to one literal and
  * destroys linkage. Distinct values collide with probability 2^-32 per
  * pair (8 hex digits) — fine for analytics linkage, not for security
  * tokens.
  *
  * NULL text → NULL. Zero matches returns the input unchanged (no copy).
  * The pattern is compiled once per expression instance and shipped to
  * codegen as a reference object, so per-row work is one matcher pass —
  * scalar, shuffle-free, whole-stage-codegen friendly.
  */
case class RegexHashReplace(child: Expression, pattern: String,
                            prefix: String)
    extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"regex_hash_replace expects a string column, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "regex_hash_replace"

  override protected def nullSafeEval(s: Any): Any =
    RegexHashReplace.replace(s.asInstanceOf[UTF8String], compiled, prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pat = ctx.addReferenceObj("pattern", compiled,
      classOf[Pattern].getName)
    val pre = ctx.addReferenceObj("prefix", prefix, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.RegexHashReplace.replace($c, $pat, $pre)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RegexHashReplace = copy(child = newChild)
}

object RegexHashReplace {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".toCharArray

  /** First 8 md5 hex digits of the UTF-8 bytes of `s`. */
  private def token(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](8)
    var i = 0
    while (i < 4) {
      out(2 * i) = hex((d(i) >> 4) & 0xF)
      out(2 * i + 1) = hex(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  def replace(s: UTF8String, p: Pattern, prefix: String): UTF8String = {
    val str = s.toString
    val m = p.matcher(str)
    if (!m.find()) return s
    val md = digests.get()
    val sb = new java.lang.StringBuilder(str.length)
    var last = 0
    do {
      sb.append(str, last, m.start())
      sb.append(prefix).append(token(md, m.group()))
      last = m.end()
    } while (m.find())
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }
}
