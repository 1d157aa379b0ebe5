package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators, batch form (SURVEY §2.10 extension; the
  * Structured Streaming variants live in graft.streaming.StreamOps and
  * share these semantics).
  *
  * Windows are epoch-aligned (origin 1970-01-01), matching Spark's native
  * `window()` grid, so the batch results are directly comparable to the
  * streaming output.
  */
object EventOps {

  /** Epoch-second-aligned tumbling window start. */
  def tumblingStart(ts: Column, sizeSec: Int): Column = {
    val sec = unix_timestamp(ts)
    timestamp_seconds(sec - pmod(sec, lit(sizeSec.toLong)))
  }

  /** Tumbling-window aggregation at `sizeSec` granularity. */
  def tumblingAgg(events: DataFrame, ts: Column, sizeSec: Int,
                  keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy(tumblingStart(ts, sizeSec).as("window_start") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding windows: each event lands in size/slide windows; implemented
    * by exploding the per-event window-start list (same grid as Spark's
    * `window(ts, size, slide)`). */
  def slidingStarts(ts: Column, sizeSec: Int, slideSec: Int): Column = {
    require(sizeSec % slideSec == 0, "size must be a multiple of slide")
    val sec = unix_timestamp(ts)
    val starts = (0 until sizeSec / slideSec).map { k =>
      val shifted = sec - lit(k.toLong * slideSec)
      shifted - pmod(shifted, lit(sizeSec.toLong)) + lit(k.toLong * slideSec)
    }
    array(starts.map(timestamp_seconds): _*)
  }

  def slidingAgg(events: DataFrame, ts: Column, sizeSec: Int, slideSec: Int,
                 keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events
      .withColumn("window_start", explode(slidingStarts(ts, sizeSec, slideSec)))
      .groupBy(col("window_start") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Gap-based sessionization: a new session starts when the gap from the
    * previous event (per user) exceeds `gapSec`. Returns one row per event
    * with a dense per-user session id; aggregate on (user, session_id) for
    * per-session rollups. Ordering includes a unique tiebreak column so the
    * session assignment is total and reproducible. */
  def sessionize(events: DataFrame, userCol: Column, ts: Column,
                 tiebreak: Column, gapSec: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(ts, tiebreak)
    val us = unix_micros(ts)
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > gapSec.toLong * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
