package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the reference's window top-k shape
  * (SQLproject1.sql:689-699 — `ROW_NUMBER() OVER (PARTITION BY g ORDER
  * BY o) AS rn ... WHERE rn <= k`, rn then dropped) into
  * [[GroupedTopKNode]], so SQL users and window-API callers get the
  * bounded-heap physical operator instead of
  * `Exchange → Sort(g,o) → Window → Filter` — without calling
  * `TopK.perGroup`.
  *
  * Matched shape: `Project(p, Filter(cond, Window(rn)))` where
  *   - the Window computes exactly ONE expression: a `row_number()` OR
  *     a `rank()` (the reference's actual top-N view uses RANK with
  *     ties kept — that maps to the operator's `withTies` mode) with a
  *     non-empty PARTITION BY (a global top-k is
  *     `TakeOrderedAndProject`'s job, not ours);
  *   - at least one conjunct of `cond` bounds rn from above by an
  *     integer literal (`rn <= k`, `rn < k+1`, `rn = 1`, or the
  *     mirrored forms) with 1 ≤ k ≤ `spark.graft.topk.rewriteMaxK`
  *     (the per-group heap is k rows — a "top million" should stay a
  *     sort);
  *   - neither the remaining conjuncts nor the Project reference rn
  *     (the operator does not emit it — matching `Project` rather than
  *     bare `Filter` is exactly the "rn unused downstream" proof, and
  *     column pruning inserts that Project whenever rn is dropped);
  *   - every ORDER BY expression is deterministic.
  *
  * Tie semantics: row_number over a NON-total order is already
  * nondeterministic (sort ties break by arrival); the heap breaks the
  * same ties by retention instead, so a run may keep a different
  * boundary row than the window would have. Identical results need a
  * total `order` — the same tiebreaker discipline the reference's own
  * window queries follow. Because the rule cannot prove totality, it is
  * OPT-IN: `spark.graft.topk.rewriteWindow=true` (default false), the
  * [[RangeJoinRule]] posture. (The RANK form is actually DETERMINISTIC
  * — `RANK() <= k` keeps exactly the rows ≤ the k-th smallest order
  * value, a set the data fully determines — but it stays behind the
  * same flag: one switch for "window top-k becomes the heap operator".)
  *
  * Registered by `GraftExtensions` (injectOptimizerRule — runs in the
  * operator-optimization batch, fixed-point with column pruning, so the
  * rn-dropping Project is already in place when this fires).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val RewriteConf = "spark.graft.topk.rewriteWindow"
  val MaxKConf = "spark.graft.topk.rewriteMaxK"

  private def enabled: Boolean =
    conf.getConfString(RewriteConf, "false").toBoolean
  private def maxK: Int =
    conf.getConfString(MaxKConf, "1000").toInt

  private def lit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** rn's upper bound implied by one conjunct, if any. */
  private def bound(c: Expression, rn: Attribute): Option[Long] = {
    def isRn(e: Expression): Boolean = e.semanticEquals(rn)
    c match {
      case LessThanOrEqual(r, l) if isRn(r) => lit(l)
      case LessThan(r, l) if isRn(r) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, r) if isRn(r) => lit(l)
      case GreaterThan(l, r) if isRn(r) => lit(l).map(_ - 1)
      case EqualTo(r, l) if isRn(r) && lit(l).contains(1L) => Some(1L)
      case EqualTo(l, r) if isRn(r) && lit(l).contains(1L) => Some(1L)
      case _ => None
    }
  }

  /** True for conjuncts row_number makes vacuous (rn ≥ 1 and weaker) —
    * the analyzer expands `rn BETWEEN 1 AND k` into exactly such a
    * lower-bound conjunct, which must not block the rewrite. */
  private def vacuous(c: Expression, rn: Attribute): Boolean = {
    def isRn(e: Expression): Boolean = e.semanticEquals(rn)
    c match {
      case GreaterThanOrEqual(r, l) if isRn(r) => lit(l).exists(_ <= 1L)
      case LessThanOrEqual(l, r) if isRn(r) => lit(l).exists(_ <= 1L)
      case GreaterThan(r, l) if isRn(r) => lit(l).exists(_ <= 0L)
      case LessThan(l, r) if isRn(r) => lit(l).exists(_ <= 0L)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case p @ Project(plist,
            Filter(cond,
              Window(Seq(alias @ Alias(
                WindowExpression(ranking, _), _)),
                partitionSpec, orderSpec, wchild, _)))
          if (ranking.isInstanceOf[RowNumber] || ranking.isInstanceOf[Rank]) &&
            partitionSpec.nonEmpty && orderSpec.nonEmpty &&
            orderSpec.forall(_.deterministic) &&
            partitionSpec.forall(_.deterministic) &&
            !plist.exists(_.references.contains(alias.toAttribute)) =>
        val rn = alias.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
          .filterNot(vacuous(_, rn))
        val ks = conjuncts.flatMap(bound(_, rn))
        val rest = conjuncts.filter(bound(_, rn).isEmpty)
        if (ks.isEmpty || ks.min < 1 || ks.min > maxK ||
            rest.exists(_.references.contains(rn))) {
          // no usable bound (or rn still needed) — keep the window plan
          p
        } else {
          val node = GroupedTopKNode(partitionSpec, orderSpec,
            ks.min.toInt, wchild, withTies = ranking.isInstanceOf[Rank])
          val filtered =
            rest.reduceOption(And).map(Filter(_, node)).getOrElse(node)
          Project(plist, filtered)
        }
    }
}
