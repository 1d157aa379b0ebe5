package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite an INNER join whose only cross-side predicates
  * are a lower and an upper bound on the same point expression
  * (`pt >= lo AND pt <= hi`, any strict/non-strict mix, either operand
  * order) into the binned equi-join that
  * [[graft.operators.RangeJoin.pointInInterval]] builds by hand — Spark
  * itself plans such a join as BroadcastNestedLoopJoin / cartesian,
  * O(|left| × |right|) comparisons.
  *
  * The rewrite is transparent and semantics-preserving: the original
  * condition is kept in full as the residual join predicate, the bin
  * equality is purely an additional pruning key, and the final Project
  * restores the join's exact output. A pair matches in exactly one bin
  * (the point's), so no duplicates arise.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (a positive integer in
  * point-domain units; 0 = disabled, the default). Pick it near the
  * typical interval span — smaller explodes interval replication, larger
  * degenerates toward the nested loop. Like the operator, binning casts
  * through double: exact for |values| < 2^53.
  *
  * Safety gates: inner join only; skipped when any conjunct is already a
  * cross-side equality (Spark then plans a hash join on it and the
  * BETWEEN rides along as residual — adding bins would only add work);
  * both bound expressions must be numeric and each side's refs must sit
  * entirely on one side of the join.
  *
  * Register via `spark.sql.extensions=graft.GraftExtensions` (injected
  * as an optimizer rule) or append [[RangeJoinRule]] to
  * `spark.experimental.extraOptimizations` on a live session.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthConf = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Long = {
    val raw = conf.getConfString(BinWidthConf, "0")
    try raw.toLong
    catch {
      case _: NumberFormatException =>
        // the user explicitly opted in — silently disabling would leave
        // them on the nested-loop plan with no hint why
        logWarning(s"$BinWidthConf='$raw' is not a long; range-join " +
          "rewrite disabled")
        0L
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  /** pt compared against one bound: returns (pt, bound, boundIsLower). */
  private def asBound(e: Expression, fromPt: AttributeSet,
                      fromInt: AttributeSet): Option[(Expression, Expression, Boolean)] = {
    def sided(x: Expression, y: Expression): Boolean =
      x.references.nonEmpty && x.references.subsetOf(fromPt) &&
        y.references.nonEmpty && y.references.subsetOf(fromInt)
    e match {
      case GreaterThanOrEqual(x, y) if sided(x, y) => Some((x, y, true))
      case GreaterThan(x, y) if sided(x, y)        => Some((x, y, true))
      case LessThanOrEqual(x, y) if sided(x, y)    => Some((x, y, false))
      case LessThan(x, y) if sided(x, y)           => Some((x, y, false))
      case GreaterThanOrEqual(y, x) if sided(x, y) => Some((x, y, false))
      case GreaterThan(y, x) if sided(x, y)        => Some((x, y, false))
      case LessThanOrEqual(y, x) if sided(x, y)    => Some((x, y, true))
      case LessThan(y, x) if sided(x, y)           => Some((x, y, true))
      case _ => None
    }
  }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)
    val crossSide = conjuncts.filter(c =>
      c.references.intersect(j.left.outputSet).nonEmpty &&
        c.references.intersect(j.right.outputSet).nonEmpty)
    // an existing cross-side equality means Spark already has a hash key
    val hasEqui = crossSide.exists {
      case EqualTo(_, _) | EqualNullSafe(_, _) => true
      case _ => false
    }
    if (hasEqui || crossSide.isEmpty) return None

    // try (pt on left, interval on right), then the mirror
    val attempt = tryOrient(j, w, cond, crossSide, ptOnLeft = true)
      .orElse(tryOrient(j, w, cond, crossSide, ptOnLeft = false))
    attempt
  }

  private def tryOrient(j: Join, w: Long, cond: Expression,
                        crossSide: Seq[Expression],
                        ptOnLeft: Boolean): Option[LogicalPlan] = {
    val (ptPlan, intPlan) =
      if (ptOnLeft) (j.left, j.right) else (j.right, j.left)
    val bounds = crossSide.flatMap(asBound(_, ptPlan.outputSet, intPlan.outputSet))
    if (bounds.isEmpty) return None
    // one point expression, bounded below AND above
    val byPt = bounds.groupBy(_._1.canonicalized)
    val usable = byPt.values.find(bs =>
      bs.exists(_._3) && bs.exists(!_._3) &&
        bs.forall(b => numeric(b._1) && numeric(b._2)))
    usable.map { bs =>
      val pt = bs.head._1
      val lo = bs.find(_._3).get._2
      val hi = bs.find(!_._3).get._2

      val ptBinAlias = Alias(bin(pt, w), "__gbin_pt")()
      val ptNew = Project(ptPlan.output :+ ptBinAlias, ptPlan)

      val intBinAttr = AttributeReference("__gbin_int", LongType)()
      // sequence(lo, hi) throws on inverted bounds under ANSI — filter
      // first (NULL bounds also drop here; they can't satisfy the BETWEEN)
      val intFiltered = Filter(LessThanOrEqual(lo, hi), intPlan)
      val seq = new Sequence(bin(lo, w), bin(hi, w))
        .withTimeZone(conf.sessionLocalTimeZone)
      val intNew = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(intBinAttr), child = intFiltered)

      val binEq = EqualTo(ptBinAlias.toAttribute, intBinAttr)
      val (newLeft, newRight) =
        if (ptOnLeft) (ptNew, intNew) else (intNew, ptNew)
      val newJoin = Join(newLeft, newRight, Inner,
        Some(And(binEq, cond)), j.hint)
      Project(j.output, newJoin)
    }
  }
}
