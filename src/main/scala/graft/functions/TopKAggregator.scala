package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the top-k (score, id) pairs per group in a
  * single pass — the §2.11 custom-aggregation surface.
  *
  * Versus the window formulation (`rank().over(...)` + filter), this
  * aggregates without sorting whole partitions: each task keeps at most k
  * entries per group (partial aggregation), and merge is k-bounded. For
  * huge groups with small k this is the shape that wins at 100 TB — state
  * is O(groups × k), never O(rows).
  *
  * Determinism: ordering is (score DESC, id ASC) — a total order, so
  * results are reproducible and tie-stable across partitionings.
  */
object TopKAggregator {

  final case class ScoredId(score: Double, id: Long)

  def topK(k: Int): Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] = {
    // k <= 0 would short-circuit into buf.last on an empty buffer at runtime
    require(k >= 1, s"topK needs k >= 1, got $k")
    new Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
      private def prune(xs: Seq[ScoredId]): Seq[ScoredId] =
        xs.sortBy(x => (-x.score, x.id)).take(k)

      override def zero: Seq[ScoredId] = Seq.empty
      override def reduce(buf: Seq[ScoredId], row: ScoredId): Seq[ScoredId] =
        // avoid resorting when the row cannot enter a full buffer
        if (buf.size == k && {
          val worst = buf.last
          row.score < worst.score ||
            (row.score == worst.score && row.id > worst.id)
        }) buf
        else prune(buf :+ row)
      override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
        prune(a ++ b)
      override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
      override def bufferEncoder: Encoder[Seq[ScoredId]] =
        ExpressionEncoder[Seq[ScoredId]]()
      override def outputEncoder: Encoder[Seq[ScoredId]] =
        ExpressionEncoder[Seq[ScoredId]]()
    }
  }
}
