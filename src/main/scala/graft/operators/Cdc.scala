package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance operators.
  *
  * The reference pipeline reloads its warehouse from full snapshots
  * (SQLproject1.sql:363-380 truncate-and-reload, plus the SCD2 merges);
  * at 100 TB the input is a change LOG instead — an append-only stream of
  * upsert/delete records per key. These operators turn such a log back
  * into snapshot semantics without ever rewriting unaffected data.
  */
object Cdc {

  /** Compact a change log to its net effect: the latest record per key
    * under `ordering` wins; keys whose latest record is a `deleteOp`
    * vanish. Emits the winning rows unchanged plus `n_changes` (how many
    * log records the key folded — the compaction ratio input).
    *
    * `ordering` must be a total order per key (e.g. commit ts, then a
    * log sequence number as tiebreak) or the "latest" row is
    * nondeterministic.
    *
    * Scale: one hash-partitioned window keyed on the (high-cardinality)
    * log key — the same shape Delta/Hudi merge-on-read compaction runs.
    * No join against the previous snapshot is needed; to also carry
    * forward untouched keys, union the snapshot in as 'U' records with
    * an ordering that sorts before every log record. */
  def compactLog(log: DataFrame, keyCols: Seq[String],
                 ordering: Seq[Column], opCol: String,
                 deleteOp: String): DataFrame = {
    require(keyCols.nonEmpty && ordering.nonEmpty,
      "compactLog needs key and ordering columns")
    val part = Window.partitionBy(keyCols.map(col): _*)
    log
      .withColumn("__rn",
        row_number().over(part.orderBy(ordering.map(_.desc): _*)))
      .withColumn("n_changes", count(lit(1)).over(part))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }

  /** Incremental aggregate maintenance (materialized-view upkeep): merge
    * a partial-aggregate state table with a new delta's partials, giving
    * the same result as re-aggregating all raw data — without touching
    * it. `sumCols` carry SUMs and COUNTs (any measure where merge = sum);
    * both inputs must already be at (keys, sumCols) partial grain, e.g.
    * from the same `groupBy(keys).agg(sum…, count…)` this feeds.
    *
    * Scale: the state table never re-scans history — each refresh
    * shuffles only |state keys| + |delta keys| partial rows. At 100 TB
    * with daily deltas that is the difference between an O(history) and
    * an O(day) nightly job. AVG-style measures must be carried as
    * (sum, count) pairs and divided at read time; MIN/MAX also merge;
    * quantiles/distincts need a mergeable sketch ([[Sketches]]). */
  def mergePartials(state: DataFrame, delta: DataFrame, keyCols: Seq[String],
                    sumCols: Seq[String]): DataFrame = {
    require(sumCols.nonEmpty, "mergePartials needs at least one measure")
    state.select((keyCols ++ sumCols).map(col): _*)
      .unionByName(delta.select((keyCols ++ sumCols).map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Incremental maintenance of a materialized inner join under
    * INSERT-ONLY deltas — the delta-rule identity
    *
    *   (F ∪ ΔF) ⋈ (D ∪ ΔD)
    *     = (F ⋈ D) ∪ (ΔF ⋈ D) ∪ (F ⋈ ΔD) ∪ (ΔF ⋈ ΔD)
    *
    * where `materialized` IS the stored F ⋈ D — the whole point is that
    * the old-fact × old-dim join (the 100 TB × dim term) is NEVER
    * recomputed; the three delta terms each involve at least one
    * (small) delta side. Inputs must be disjoint splits (F ∩ ΔF = ∅,
    * D ∩ ΔD = ∅) and `materialized` must carry exactly the columns the
    * delta joins produce, or the union mis-aligns.
    *
    * Updates/deletes need retraction records (see [[compactLog]]) —
    * out of scope for the insert-only identity.
    *
    * Scale: ΔD is broadcast in both its terms (a day's new dimension
    * members); ΔF ⋈ D is the one shuffle, keyed on the join key and
    * sized by the DELTA, not the corpus. */
  def deltaJoinMaintain(materialized: DataFrame,
                        factOld: DataFrame, factDelta: DataFrame,
                        dimOld: DataFrame, dimDelta: DataFrame,
                        joinCond: (DataFrame, DataFrame) => Column,
                        project: Seq[String]): DataFrame = {
    def j(f: DataFrame, d: DataFrame, bcastDim: Boolean): DataFrame = {
      val dim = if (bcastDim) broadcast(d) else d
      f.join(dim, joinCond(f, d)).select(project.map(col): _*)
    }
    materialized
      .unionByName(j(factDelta, dimOld, bcastDim = false))
      .unionByName(j(factOld, dimDelta, bcastDim = true))
      .unionByName(j(factDelta, dimDelta, bcastDim = true))
  }
}
