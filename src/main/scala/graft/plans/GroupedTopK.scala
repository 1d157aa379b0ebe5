package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BaseOrdering, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator grouped top-k: the `ROW_NUMBER() OVER (PARTITION BY g
  * ORDER BY o) <= k` pattern (reference T2, SQLproject1.sql:689-699) as a
  * first-class physical operator instead of a window.
  *
  * Why a custom operator: Spark plans the window form as
  * `Exchange(g) -> Sort(g, o) -> Window(row_number) -> Filter(rn <= k)` —
  * every row of every group is shuffled and fully sorted, then all but k
  * per group are thrown away. This operator keeps a size-k bounded heap
  * per group instead:
  *
  *   - a PARTIAL pass runs map-side (no required distribution), so each
  *     input partition forwards at most k rows per group it saw — the
  *     shuffle then moves O(partitions × groups × k) rows, not the corpus;
  *   - a FINAL pass runs on the `ClusteredDistribution(g)` side of the
  *     exchange (EnsureRequirements inserts the shuffle) and re-heaps the
  *     partial survivors to the exact per-group top-k.
  *
  * This is the grouped analogue of Spark's own global
  * `TakeOrderedAndProjectExec` (partial top-k per partition, merge after
  * the exchange). No sort is ever materialized: per group the heap does
  * O(n log k) comparisons, and the heap drain emits each group's rows in
  * ascending `order`.
  *
  * Memory + scale contract: the final pass holds k rows per group of one
  * shuffle partition — bounded, and scaled out by shuffle partitioning.
  * The partial pass's map of per-group heaps is bounded by
  * `spark.graft.topk.maxGroupsPerPartition` (default 100k): past the cap
  * it FLUSHES (emits the heaps it holds and starts a fresh map), which
  * degrades map-side reduction but never correctness — the final pass
  * re-heaps whatever arrives. So a high-cardinality group column (e.g.
  * top-k per document over 100 TB) degrades gracefully toward the plain
  * shuffle instead of OOMing the mapper — the same bounded-state stance
  * as a hash aggregate's partial-flush fallback.
  *
  * Determinism: like ROW_NUMBER, ties at the k boundary are broken by
  * whichever row the heap retained — callers wanting a stable answer
  * must make `order` a total order (append unique tiebreaker columns),
  * exactly as the reference queries do for their window top-Ns.
  */
case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"grouped top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Plans [[GroupedTopKNode]] as final-over-partial [[GroupedTopKExec]].
  * Registered by `GraftExtensions` (injectPlannerStrategy) and
  * self-registered by `TopK.perGroup` via `experimental.extraStrategies`.
  */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(g, o, k, child) =>
      GroupedTopKExec(g, o, k, partial = false,
        GroupedTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push a Filter through [[GroupedTopKNode]] when it only
  * constrains the GROUP KEY. A deterministic predicate over the group-key
  * attributes is constant within a group, so it selects whole groups and
  * commutes with per-group top-k — pushing it below lets the normal
  * pushdown machinery carry it all the way into the scan
  * (`PushedFilters`), so a "top-k per key WHERE key IN (...)" never reads
  * the other keys' rows at all. Only applies when every group expression
  * is a bare attribute: a predicate on a column that merely FEEDS a
  * computed group expression (e.g. grouping by `k % 2`, filtering `k`)
  * would change group membership, not select whole groups. Conjuncts
  * that touch non-group columns stay above the node.
  *
  * Registered by `GraftExtensions` (injectOptimizerRule) and
  * self-registered by `TopK.perGroup` via `experimental.
  * extraOptimizations` for plain sessions.
  */
object GroupedTopKFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, t: GroupedTopKNode)
        if t.groupExprs.forall(_.isInstanceOf[Attribute]) =>
      val groupAttrs = AttributeSet(t.groupExprs.map(_.asInstanceOf[Attribute]))
      val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.nonEmpty &&
          c.references.subsetOf(groupAttrs))
      if (push.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(push.reduce(And), t.child))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** One pass of per-group bounded heaps (see [[GroupedTopKNode]]).
  * `partial = true` runs before the exchange with the flush cap;
  * `partial = false` demands `ClusteredDistribution(groupExprs)` and is
  * exact. Runs between exchanges, outside whole-stage codegen — the
  * comparator and key projection are still codegen'd
  * (`RowOrdering.create` / `UnsafeProjection.create`).
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val flushCap =
      if (partial)
        conf.getConfString(GroupedTopKExec.MaxGroupsConf, "100000").toInt
      else Int.MaxValue
    val childOutput = child.output
    val g = groupExprs
    val o = order
    val kk = k
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions(
      iter =>
        GroupedTopKExec.topKIterator(
          iter,
          UnsafeProjection.create(g, childOutput),
          RowOrdering.create(o, childOutput),
          kk, flushCap, numOutputRows),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "GroupedTopKPartial" else "GroupedTopKFinal"
}

object GroupedTopKExec {

  /** Partial-pass flush threshold: max distinct groups held per input
    * partition before the heap map is emitted and restarted. */
  val MaxGroupsConf = "spark.graft.topk.maxGroupsPerPartition"

  /** Streams `input` through per-group size-k min-heaps (scala
    * PriorityQueue is a max-heap under `ord`, so `head` is the worst
    * retained row). At most `flushCap` groups are tracked at once; on
    * overflow the current heaps drain to the output and a fresh map
    * starts (correct under re-heaping downstream). Rows and keys are
    * copied before retention — Spark reuses the underlying row objects.
    */
  def topKIterator(
      input: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ord: BaseOrdering,
      k: Int,
      flushCap: Int,
      numOutputRows: SQLMetric): Iterator[InternalRow] = new Iterator[InternalRow] {

    // row of a group that didn't fit in the flushed map, held for the next batch
    private var pendingKey: UnsafeRow = _
    private var pendingRow: InternalRow = _
    private var out: Iterator[InternalRow] = Iterator.empty

    override def hasNext: Boolean = {
      while (!out.hasNext && (input.hasNext || pendingRow != null)) out = nextBatch()
      out.hasNext
    }

    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException("empty iterator")
      numOutputRows += 1
      out.next()
    }

    private def nextBatch(): Iterator[InternalRow] = {
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]

      def insert(key: UnsafeRow, row: InternalRow, owned: Boolean): Boolean =
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < k) h.enqueue(if (owned) row else row.copy())
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue()
              h.enqueue(if (owned) row else row.copy())
            }
            true
          case None =>
            if (heaps.size >= flushCap) false
            else {
              val h = mutable.PriorityQueue.empty[InternalRow](ord)
              h.enqueue(if (owned) row else row.copy())
              heaps.put(if (owned) key else key.copy(), h)
              true
            }
        }

      if (pendingRow != null) {
        insert(pendingKey, pendingRow, owned = true)
        pendingKey = null
        pendingRow = null
      }
      var overflowed = false
      while (!overflowed && input.hasNext) {
        val row = input.next()
        val key = keyProj(row)
        if (!insert(key, row, owned = false)) {
          pendingKey = key.copy()
          pendingRow = row.copy()
          overflowed = true
        }
      }
      // drain each heap largest-first, reverse to ascending `order`
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }
  }
}
