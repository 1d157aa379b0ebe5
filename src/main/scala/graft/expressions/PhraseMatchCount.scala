package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of ALL occurrences (overlapping included) of any of a fixed
  * phrase list in a text column, via one Aho-Corasick automaton pass —
  * the blocklist/contamination-marker gate a corpus filter runs over
  * every crawled document.
  *
  * Why an automaton and not `sum(contains(text, p))` over phrases: the
  * naive form scans the text once PER PHRASE — a 10k-entry blocklist
  * means 10k passes per document. Aho-Corasick is one pass total,
  * independent of phrase count (the FlashText observation, Singh 2017;
  * the automaton is Aho & Corasick 1975). Matching is plain substring
  * (no word-boundary logic) over UTF-16 code units; duplicate phrases
  * in the list count once each per occurrence.
  *
  * The automaton builds once per expression instance on the driver and
  * ships to executors as a codegen reference object — per-row work is
  * one state walk, scalar and whole-stage-codegen friendly. NULL text →
  * NULL.
  */
case class PhraseMatchCount(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty, "phrase_count needs at least one phrase")
  require(phrases.forall(p => p != null && p.nonEmpty),
    "phrase_count phrases must be non-null and non-empty")

  @transient private lazy val automaton = new AcAutomaton(phrases)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_count expects a string column, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_count"

  override protected def nullSafeEval(s: Any): Any =
    automaton.countMatches(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("automaton", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ac.countMatches($c.toString())")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PhraseMatchCount = copy(child = newChild)
}

/** Classic Aho-Corasick: trie + BFS failure links with cumulative output
  * counts per state, so the scan adds `outCount(state)` per character and
  * never walks suffix chains at match time. */
final class AcAutomaton(phrases: Seq[String]) extends Serializable {

  private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outCount = mutable.ArrayBuffer(0L)

  phrases.foreach { p =>
    var s = 0
    p.foreach { c =>
      s = children(s).getOrElseUpdate(c, {
        children += mutable.HashMap.empty[Char, Int]
        outCount += 0L
        children.length - 1
      })
    }
    outCount(s) += 1L
  }

  private val fail = new Array[Int](children.length)
  locally {
    val q = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { v => fail(v) = 0; q += v }
    while (q.nonEmpty) {
      val u = q.dequeue()
      outCount(u) += outCount(fail(u))
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = children(f).getOrElse(c, 0)
        q += v
      }
    }
  }

  def countMatches(s: String): Long = {
    var st = 0
    var total = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      while (st != 0 && !children(st).contains(c)) st = fail(st)
      st = children(st).getOrElse(c, 0)
      total += outCount(st)
      i += 1
    }
    total
  }
}
