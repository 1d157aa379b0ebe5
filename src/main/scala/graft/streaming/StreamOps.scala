package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Structured Streaming surface (SURVEY §2.10).
  *
  * The reference is batch-only but incremental-READY (audit columns,
  * idempotent anti-join fact loads, insert-only dim merges — SQLproject1.sql
  * :104-105, :612-615). This module is the streaming expression of that
  * design: the same windowed aggregations as the batch EventOps (identical
  * epoch-aligned grids, so batch and stream outputs are directly
  * comparable), plus watermarked state and a foreachBatch incremental-load
  * pattern that reuses the batch builders unchanged.
  *
  * Scale notes: all aggregations are keyed on (window x key) — state is
  * bounded by the watermark; sessionization state is per active user and
  * expires via timeout. No operation collects to the driver.
  */
object StreamOps {

  /** Tumbling-window aggregation with a watermark for late data. Grid is
    * identical to EventOps.tumblingStart (epoch-aligned).
    *
    * Groups by the `window(...)` STRUCT and projects `.start` only after
    * the aggregate: grouping by `.getField("start")` would strip the
    * event-time watermark metadata from the grouping key, which (a) fails
    * analysis in append mode and (b) leaves update-mode window state
    * unevictable — unbounded — despite the watermark. */
  def tumblingAgg(events: DataFrame, tsCol: String, sizeSec: Int,
                  watermark: String, keys: Seq[Column],
                  aggs: Seq[Column]): DataFrame =
    startProjected(events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), s"$sizeSec seconds").as("__w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*))

  /** Sliding-window aggregation (size/slide), watermarked; same
    * struct-grouping rule as [[tumblingAgg]]. */
  def slidingAgg(events: DataFrame, tsCol: String, sizeSec: Int,
                 slideSec: Int, watermark: String, keys: Seq[Column],
                 aggs: Seq[Column]): DataFrame =
    startProjected(events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), s"$sizeSec seconds", s"$slideSec seconds")
        .as("__w") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*))

  /** Replace the leading `__w` window struct with `window_start`, keeping
    * the (window_start, keys..., aggs...) output shape callers rely on. */
  private def startProjected(agged: DataFrame): DataFrame =
    agged.select(col("__w").getField("start").as("window_start") +:
      agged.columns.filterNot(_ == "__w").toIndexedSeq.map(col): _*)

  /** Native gap-based session windows (the streaming analogue of
    * EventOps.sessionize). */
  def sessionAgg(events: DataFrame, tsCol: String, gapSec: Int,
                 watermark: String, keys: Seq[Column],
                 aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), s"$gapSec seconds").as("session") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session.start"))
      .withColumn("session_end", col("session.end"))
      .drop("session")

  /** Watermarked stream-stream interval join: right events join left
    * events with the same key when they occur within `withinSec` AFTER the
    * left event. Both sides carry watermarks so the join state is bounded
    * — Spark drops buffered rows once they age past watermark + interval. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, watermark: String,
                   withinSec: Int): DataFrame =
    left.withWatermark(leftTs, watermark).join(
      right.withWatermark(rightTs, watermark),
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $withinSec SECONDS"))

  // ---- custom state: running per-key counters via mapGroupsWithState -----

  final case class KeyedEvent(key: String, ts: Timestamp, value: Double)
  final case class RunningStats(key: String, count: Long, sum: Double,
                                max: Double)

  /** flatMapGroupsWithState custom operator: emits updated running stats
    * per key on every micro-batch; state never expires (processing-time
    * timeout would bound it in production). */
  def runningStats(events: Dataset[KeyedEvent]): Dataset[RunningStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[RunningStats, RunningStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[RunningStats]) =>
          val prev = state.getOption.getOrElse(RunningStats(key, 0L, 0.0,
            Double.NegativeInfinity))
          val batch = rows.toSeq
          val next = RunningStats(key,
            prev.count + batch.size,
            prev.sum + batch.map(_.value).sum,
            math.max(prev.max, batch.map(_.value).foldLeft(Double.NegativeInfinity)(math.max)))
          state.update(next)
          Iterator.single(next)
      }
  }

  // ---- transformWithState (Spark 4 arbitrary-state API) ------------------

  final case class KeyedRecord(key: String, payload: String)

  /** Streaming exact dedup: emit only the FIRST record per key, tracked in
    * per-key ValueState via the transformWithState StatefulProcessor API
    * (the streaming face of the batch Dedup family). State is one boolean
    * per distinct key; bound it in production with a TTLConfig. */
  class FirstSeenProcessor
      extends StatefulProcessor[String, KeyedRecord, KeyedRecord] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedRecord],
                                 timerValues: TimerValues): Iterator[KeyedRecord] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        rows.take(1)
      }
    }
  }

  def dedupFirstSeen(records: Dataset[KeyedRecord]): Dataset[KeyedRecord] = {
    import records.sparkSession.implicits._
    records.groupByKey(_.key)
      .transformWithState(new FirstSeenProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  final case class TimedEvent(key: String, seq: String, us: Long)
  final case class LateEvent(key: String, seq: String, us: Long,
                             lateUs: Long)

  /** Streaming lateness measurement: per-key event-time high-water mark
    * in ValueState; every event is emitted with how far behind the mark
    * it arrived — the live feed of the batch
    * `EventOps.latenessPerEvent` / `latenessProfile` watermark-sizing
    * measurement (parity asserted in the spec). State is ONE long per
    * key. Within a micro-batch rows are processed in `seq` order so a
    * batch boundary never changes a lateness value — stream == batch on
    * any batch split that respects the arrival order. */
  class LatenessProcessor
      extends StatefulProcessor[String, TimedEvent, LateEvent] {
    @transient private var hwm: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hwm = getHandle.getValueState[Long]("hwm",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TimedEvent],
                                 timerValues: TimerValues): Iterator[LateEvent] = {
      val ordered = rows.toSeq.sortBy(e => (e.seq, e.us))
      val out = Seq.newBuilder[LateEvent]
      var mark = if (hwm.exists()) hwm.get() else Long.MinValue
      ordered.foreach { e =>
        val late = if (mark == Long.MinValue) 0L
          else math.max(0L, mark - e.us)
        out += LateEvent(e.key, e.seq, e.us, late)
        mark = math.max(mark, e.us)
      }
      if (mark != Long.MinValue) hwm.update(mark)
      out.result().iterator
    }
  }

  def latenessStream(events: Dataset[TimedEvent]): Dataset[LateEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new LatenessProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming burst dedup — the live twin of
    * `EventOps.burstDedup`: per key, emit only events that START a
    * burst (more than `gapUs` after the previously-seen event); events
    * inside a burst are suppressed but still EXTEND it (the chaining
    * rule, so a retry storm longer than the gap span still collapses to
    * one emission). State is ONE long (last seen event time) per key —
    * bound it with a TTL in production. Within a micro-batch rows are
    * processed in (us, seq) order, so batch boundaries on an
    * in-order feed never change which events are emitted (stream ==
    * batch, StreamOpsSpec parity). */
  class BurstStartProcessor(gapUs: Long)
      extends StatefulProcessor[String, TimedEvent, TimedEvent] {
    @transient private var lastUs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastUs = getHandle.getValueState[Long]("lastUs",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TimedEvent],
                                 timerValues: TimerValues): Iterator[TimedEvent] = {
      val ordered = rows.toSeq.sortBy(e => (e.us, e.seq))
      val out = Seq.newBuilder[TimedEvent]
      var last = if (lastUs.exists()) lastUs.get() else Long.MinValue
      ordered.foreach { e =>
        if (last == Long.MinValue || e.us - last > gapUs) out += e
        last = e.us // suppressed events still extend the burst
      }
      if (last != Long.MinValue) lastUs.update(last)
      out.result().iterator
    }
  }

  def burstDedupStream(events: Dataset[TimedEvent],
                       gapSec: Long): Dataset[TimedEvent] = {
    require(gapSec >= 1, s"gapSec must be >= 1, got $gapSec")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new BurstStartProcessor(gapSec * 1000000L),
        TimeMode.None(), OutputMode.Append())
  }

  final case class ScoredRecord(key: String, id: String, score: Double)
  final case class RankedRecord(key: String, id: String, score: Double,
                                rnk: Int, ver: Long)

  /** Streaming maintenance twin of the grouped top-k physical operator
    * (`graft.plans.GroupedTopKExec` / `TopK.perGroup`): per-key ListState
    * holds the current k best rows under (score desc, id asc) — the same
    * total order the batch operator needs for determinism. Whenever a
    * batch changes a key's top-k membership or order, the FULL new top-k
    * is re-emitted for that key, rank-numbered and tagged with a
    * monotonically increasing per-key version — in Update mode a sink's
    * max-version rows per key are that group's current top-k, and after
    * any prefix of batches they equal the batch operator run on the data
    * seen so far (spec-asserted). State per key is exactly the k
    * survivors plus one version counter — the streaming face of the batch
    * exec's bounded-heap contract; unchanged keys emit nothing. */
  class TopKProcessor(k: Int)
      extends StatefulProcessor[String, ScoredRecord, RankedRecord] {
    @transient private var state: ListState[ScoredRecord] = _
    @transient private var ver: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getListState[ScoredRecord]("topk",
        org.apache.spark.sql.Encoders.product[ScoredRecord], TTLConfig.NONE)
      ver = getHandle.getValueState[Long]("ver",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[ScoredRecord],
                                 timerValues: TimerValues): Iterator[RankedRecord] = {
      val cur = state.get().toVector
      val merged = (cur ++ rows).sortBy(r => (-r.score, r.id)).take(k)
      if (merged == cur) Iterator.empty
      else {
        state.put(merged.toArray)
        val v = (if (ver.exists()) ver.get() else 0L) + 1L
        ver.update(v)
        merged.iterator.zipWithIndex.map { case (r, i) =>
          RankedRecord(r.key, r.id, r.score, i + 1, v)
        }
      }
    }
  }

  def topKStream(records: Dataset[ScoredRecord], k: Int): Dataset[RankedRecord] = {
    require(k > 0, s"k must be positive, got $k")
    import records.sparkSession.implicits._
    records.groupByKey(_.key)
      .transformWithState(new TopKProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming exact dedup with BOUNDED state: Spark's
    * dropDuplicatesWithinWatermark keyed on `keys`. Unlike
    * [[dedupFirstSeen]] (whose per-key state lives forever without a
    * TTL), state here is evicted once a key's event time ages past the
    * watermark — the right trade for high-cardinality keys where exact
    * forever-dedup would hold one entry per key ever seen. Re-emission of
    * a key after the watermark gap is the documented, accepted
    * difference vs the all-time batch dedup. */
  def dedupWithinWatermark(records: DataFrame, tsCol: String,
                           watermark: String, keys: Seq[String]): DataFrame =
    records.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  // ---- incremental ELT: foreachBatch reusing the batch builders ----------

  /** Run `batchFn` once per micro-batch (the reference's re-runnable
    * pipeline pattern: idempotent loads keyed by batchId). With
    * `Trigger.AvailableNow` this processes a backlog of files and stops —
    * the streaming equivalent of the reference's file-drop re-runs. */
  def incrementalLoad(stream: DataFrame, checkpoint: String)
                     (batchFn: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(batchFn)
      .start()

  /** Maintain a persisted log-bucket quantile sketch
    * ([[graft.operators.Stats.logBucketSketch]]) from a file-drop
    * stream: each arriving batch is sketched and MERGED (count addition
    * on the bucket key) into the store — never re-scanning history. The
    * store stays ≤ 64·subBuckets + 1 rows per group regardless of how
    * much data has flowed through, and
    * `Stats.logBucketQuantilesFromSketch` finalizes p50/p90/p99 on it at
    * any point; exact mergeability makes the maintained sketch
    * IDENTICAL to a from-scratch batch sketch of everything ingested
    * (StreamOpsSpec). The overwrite materializes the merged frame first
    * (the store is sketch-sized) — the read-then-overwrite of the same
    * directory would otherwise race its own scan. */
  def maintainLogBucketSketch(spark: SparkSession, inputDir: String,
                              schema: org.apache.spark.sql.types.StructType,
                              sketchDir: String, checkpointDir: String,
                              groupCols: Seq[String], valCol: String,
                              subBuckets: Int = 16): Unit = {
    import graft.operators.Stats
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val q = incrementalLoad(stream, checkpointDir) { (batch, _) =>
      if (!batch.isEmpty) {
        val batchSk = Stats.logBucketSketch(batch, groupCols, valCol,
          subBuckets)
        val p = new org.apache.hadoop.fs.Path(sketchDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(p) && fs.listStatus(p).exists(_.getLen > 0))
            Stats.mergeLogBucketSketches(
              spark.read.parquet(sketchDir), batchSk, groupCols)
          else batchSk
        merged.localCheckpoint()
          .write.mode("overwrite").parquet(sketchDir)
      }
    }
    q.awaitTermination()
  }
}
