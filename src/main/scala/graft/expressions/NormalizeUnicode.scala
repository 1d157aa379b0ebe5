package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — Spark ships no normalization function, yet corpus text
  * arrives in mixed composed/decomposed form ("é" as U+00E9 or as
  * e+U+0301), which silently breaks exact dedup, paragraph hashing and
  * equality joins on text keys.
  *
  * `java.text.Normalizer` implements the Unicode standard's canonical
  * algorithm, so results agree with any conformant engine (DuckDB's
  * `nfc_normalize`, Python's `unicodedata.normalize`) — which is what
  * makes the differential oracle possible.
  *
  * The form is a compile-time constant (one enum lookup at plan time,
  * not per row); the per-row fast path is `Normalizer.isNormalized`,
  * which for already-NFC ASCII/Latin text is a single scan with no
  * allocation.
  */
case class NormalizeUnicode(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string column, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, form)) input
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val formRef = s"java.text.Normalizer.Form.${form.name()}"
      s"""
        |java.lang.String $s = $in.toString();
        |${ev.value} = java.text.Normalizer.isNormalized($s, $formRef)
        |  ? $in
        |  : org.apache.spark.unsafe.types.UTF8String.fromString(
        |      java.text.Normalizer.normalize($s, $formRef));
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUnicode {
  /** Parse a form name ("NFC", "NFD", "NFKC", "NFKD"), as the SQL
    * registration receives it. */
  def forName(name: String): Normalizer.Form =
    Normalizer.Form.valueOf(name.trim.toUpperCase)
}
