package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conformed-dimension builders (SURVEY §2.3 J7, §2.4 A1, §7.4).
  *
  * Surrogate keys use strategy §7.4(a): `row_number()` over a deterministic
  * natural-key ordering — stable, dense, reproducible (the reference's
  * IDENTITY only guarantees key *semantics*, not values). The unpartitioned
  * window funnels the dim through one task, which is correct for conformed
  * dims (ship modes, categories, geographies — small by definition). So a
  * caller can't pick the single-task plan by accident on a huge dim,
  * [[buildDim]] probes the distinct-key count and dispatches to
  * [[buildDimDistributed]] above a configurable threshold.
  */
object Dims {

  /** Backtick-quote a caller-supplied column NAME so dotted names
    * ("addr.city") resolve as one column instead of a struct-field
    * path — every `col()` over a name the caller hands us goes through
    * this. */
  private def qcol(n: String) = col(s"`$n`")

  /** Conf key: row count above which [[broadcastIfSmall]] withholds the
    * broadcast hint and lets the planner's size estimate pick the join
    * strategy (sort-merge at scale). An unconditional `broadcast(dim)`
    * bypasses Spark's size check entirely — correct at reference
    * cardinality (hundreds to thousands of rows) but an OOM at 100× with
    * a wide SCD2 dim; the guarded hint keeps the fast plan where it is
    * safe and degrades to the planner's choice where it is not. */
  val MaxBroadcastDimRowsKey = "spark.graft.dims.maxBroadcastDimRows"
  val DefaultMaxBroadcastDimRows: Long = 1000000L

  /** Broadcast hint gated by a bounded row probe — the guarded twin of a
    * bare `broadcast(dim)`: count at most cap+1 rows once, then hint the
    * dim itself under the cap and return it UN-hinted above it.
    * Output-identical either way — only the physical join strategy
    * differs. The probe deliberately does NOT persist: every mart/fact
    * build goes through here, and a cached probe returned on the common
    * small-dim path is never unpersisted, accumulating one pinned copy
    * per call for the session's lifetime. Re-computing a ≤cap-row dim
    * once at join time is cheaper than that leak. */
  def broadcastIfSmall(dim: DataFrame): DataFrame = {
    val cap = dim.sparkSession.conf
      .get(MaxBroadcastDimRowsKey, DefaultMaxBroadcastDimRows.toString).toLong
    val probe = math.min(cap + 1, Int.MaxValue.toLong).toInt
    if (dim.limit(probe).count() > cap) dim else broadcast(dim)
  }

  /** Conf key: distinct-key count above which [[buildDim]] dispatches to
    * [[buildDimDistributed]] instead of the single-task global window.
    * 1M keys through one window task is the upper edge of comfortable;
    * real conformed dims sit orders of magnitude below it. */
  val MaxSingleTaskKeysKey = "spark.graft.dims.maxSingleTaskKeys"
  val DefaultMaxSingleTaskKeys: Long = 1000000L

  /** A1: distinct natural keys + dense deterministic surrogate key.
    * Size-dispatching: the distinct-key probe short-circuits at cap+1
    * rows; above the cap the numbering routes to the partition-offset
    * machinery of [[buildDimDistributed]] (output-identical, DimsSpec). */
  def buildDim(src: DataFrame, naturalKey: Seq[String], keyCol: String): DataFrame = {
    val d = src.select(naturalKey.map(qcol): _*).distinct()
    val cap = src.sparkSession.conf
      .get(MaxSingleTaskKeysKey, DefaultMaxSingleTaskKeys.toString).toLong
    val probe = math.min(cap + 1, Int.MaxValue.toLong).toInt
    // materialize the (bounded) probe once: when the dim fits under the
    // cap the limited frame IS the complete distinct set, so the
    // single-window path numbers the cached rows instead of re-running
    // the distinct shuffle (the probe previously cost a second distinct).
    // cache (not localCheckpoint): the over-cap path must RELEASE the
    // probe rows, and an evicted re-compute is safe — under the cap the
    // limit returns the complete (deterministic) set
    val limited = d.limit(probe).cache()
    if (limited.count() > cap) {
      limited.unpersist(false)
      buildDimDistributed(src, naturalKey, keyCol)
    } else limited.withColumn(keyCol,
      row_number().over(Window.orderBy(naturalKey.map(qcol): _*)).cast("long"))
  }

  /** Dense deterministic surrogate keys WITHOUT a single-task global
    * window — the at-scale IDENTITY replacement for dims too large for
    * [[buildDim]]. Range-partition the distinct natural keys, number rows
    * within each partition, then add each partition's starting offset
    * (computed from per-partition counts — one tiny driver-side action
    * over numPartitions integers, never the data). Output is identical to
    * [[buildDim]] on the same input; only the plan shape differs. */
  def buildDimDistributed(src: DataFrame, naturalKey: Seq[String],
                          keyCol: String, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.spark_partition_id
    val n = if (partitions > 0) partitions
      else src.sparkSession.sparkContext.defaultParallelism
    val keys = naturalKey.map(qcol)
    val sorted = src.select(keys: _*).distinct()
      .repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    val numbered = sorted.withColumn("__rn", row_number().over(localW))
      .localCheckpoint() // freeze partitioning: counts + keys must agree
    val counts = numbered.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L) { (acc, p) =>
      acc + counts.getOrElse(p, 0L)
    }
    val offsetCol = (0 until n).foldLeft(lit(0L)) { (acc, p) =>
      when(col("__pid") === p, lit(offsets(p))).otherwise(acc)
    }
    numbered.withColumn(keyCol, (offsetCol + col("__rn")).cast("long"))
      .drop("__pid", "__rn")
  }

  /** J7: MERGE ... WHEN NOT MATCHED THEN INSERT (SQLproject1.sql:390-416) —
    * existing rows keep their surrogate keys; unseen natural keys are
    * appended with keys offset past max(existing).
    *
    * Fresh keys are numbered with an unpartitioned window — one task over
    * just the NEW keys, fine for conformed dims where a day's novelty is
    * small. If a single batch can introduce a huge number of new keys, use
    * [[insertOnlyMergeDistributed]] (same output, no global window). */
  def insertOnlyMerge(existing: DataFrame, incoming: DataFrame,
                      naturalKey: Seq[String], keyCol: String): DataFrame = {
    val fresh = freshKeys(existing, incoming, naturalKey)
    val keyed = fresh
      .withColumn("__rn",
        row_number().over(Window.orderBy(naturalKey.map(qcol): _*)).cast("long"))
    appendOffsetKeyed(existing, keyed, keyCol)
  }

  /** [[insertOnlyMerge]] with fresh-key numbering done by the
    * [[buildDimDistributed]] machinery instead of an unpartitioned window —
    * identical output, but new-key assignment scales past one task. */
  def insertOnlyMergeDistributed(existing: DataFrame, incoming: DataFrame,
                                 naturalKey: Seq[String], keyCol: String,
                                 partitions: Int = 0): DataFrame = {
    val fresh = freshKeys(existing, incoming, naturalKey)
    // NOT "__rn": buildDimDistributed uses that name internally and would
    // drop the output key with its own scratch column
    val keyed = buildDimDistributed(fresh, naturalKey, "__fresh_rn", partitions)
      .withColumnRenamed("__fresh_rn", "__rn")
    appendOffsetKeyed(existing, keyed, keyCol)
  }

  /** Incoming natural keys not yet in the dim, under NULL-SAFE key
    * equality: a plain anti-join never matches a key containing NULL
    * (NULL = NULL is NULL), so such a row would be re-appended with a
    * fresh surrogate key on EVERY incremental run — duplicating dim rows
    * and fanning out facts. `<=>` treats NULL as a value, matching how
    * `Hashing.hashKey` folds NULLs into one sentinel. */
  private def freshKeys(existing: DataFrame, incoming: DataFrame,
                        naturalKey: Seq[String]): DataFrame = {
    val inc = incoming.select(naturalKey.map(qcol): _*).distinct().as("inc")
    val ex = existing.select(naturalKey.map(qcol): _*).distinct().as("ex")
    val cond = naturalKey.map(k => col(s"inc.`$k`") <=> col(s"ex.`$k`"))
      .reduce(_ && _)
    inc.join(ex, cond, "left_anti")
  }

  /** Shift dense 1..n `__rn` keys past max(existing key) and append. */
  private def appendOffsetKeyed(existing: DataFrame, keyed: DataFrame,
                                keyCol: String): DataFrame = {
    val maxKey = existing.agg(coalesce(max(qcol(keyCol)), lit(0L)).as("__mx"))
    val shifted = keyed
      .crossJoin(broadcast(maxKey))
      .withColumn(keyCol, (col("__mx") + col("__rn")).cast("long"))
      .drop("__rn", "__mx")
    existing.unionByName(shifted.select(existing.columns.toIndexedSeq.map(qcol): _*))
  }
}
