package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implemented with the union trick rather than a range join: tag both
  * sides, sort per key by (ts, side, tiebreak), and carry the most recent
  * right-side payload forward with `last(ignoreNulls)`. Cost is ONE
  * shuffle + sort over left∪right on the join key — no per-row probing, no
  * range-join explosion — the standard scalable formulation, unchanged at
  * 100 TB because the window never materializes more than a partition.
  *
  * Strict mode (`right.ts < left.ts`) orders left rows before right rows at
  * equal timestamps so same-instant right rows are not visible; non-strict
  * (`<=`) orders right first. Ties among right rows resolve to the greatest
  * `tiebreak` (a deterministic total order).
  */
object AsOf {

  /** @param payload right-side columns to carry onto each left row as
    *                `asof_<name>` (NULL when no earlier right row exists).
    * @param maxStalenessSec when set, a matched right row OLDER than this
    *                many seconds before the left timestamp is treated as
    *                no match (payload NULL) — the "tolerance" every
    *                point-in-time feature join needs so a years-stale
    *                quote is not silently joined onto today's trade.
    *                Applied AFTER the window carry, so it adds zero
    *                shuffle. */
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTs: Column, rightTs: Column, tiebreak: Column,
           payload: Seq[String], strict: Boolean = false,
           maxStalenessSec: Option[Long] = None): DataFrame = {
    maxStalenessSec.foreach(t =>
      require(t >= 0, s"maxStalenessSec must be >= 0, got $t"))
    val reserved = Set("__ts", "__side", "__tb", "__rv", "__match", "__mts")
    require(!left.columns.exists(reserved), s"left side must not contain ${reserved.mkString(", ")}")
    val leftSideRank = if (strict) 0 else 1 // smaller sorts first
    val rightSideRank = 1 - leftSideRank
    val keyCols = on.map(col)
    val leftCols = left.columns

    // null-ts right rows would sort first (nulls-first) and leak their
    // payload into every left row with no genuine predecessor — they can
    // never satisfy ts <= / < anything, so drop them up front
    //
    // the tiebreak keeps its own type: casting to long would silently NULL
    // non-numeric tiebreaks (string ids) and make same-timestamp right-row
    // resolution nondeterministic — any orderable type is a valid tiebreak
    val r = right.filter(rightTs.isNotNull)
      .select(keyCols :+ rightTs.as("__ts") :+
        lit(rightSideRank).as("__side") :+ tiebreak.as("__tb") :+
        struct(payload.map(col): _*).as("__rv"): _*)
    val rvType = r.schema("__rv").dataType.catalogString
    val tbType = r.schema("__tb").dataType.catalogString

    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(leftSideRank))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__rv", lit(null).cast(rvType))

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // null-ts LEFT rows sort first, see no prior right rows, and correctly
    // emit a NULL payload — they are preserved, as a left join would
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__mts",
        last(when(col("__side") === rightSideRank, col("__ts")),
          ignoreNulls = true).over(w))
      .filter(col("__side") === leftSideRank)
    // microsecond integer arithmetic: a seconds-granularity cast would
    // truncate sub-second parts and flip boundary comparisons
    val gated = maxStalenessSec match {
      case Some(t) => carried.withColumn("__match",
        when(unix_micros(col("__ts")) - unix_micros(col("__mts")) <=
          t * 1000000L, col("__match")))
      case None => carried
    }
    gated.select(leftCols.toIndexedSeq.map(col) ++
      payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` (`>` in strict mode) — "first shipment after
    * the order", "next quote after the trade". Same union-trick plan as
    * [[join]] (one shuffle + sort per key), with the carry window
    * reversed: `first(ignoreNulls)` over [current, ∞). Ties among
    * same-instant right rows resolve to the SMALLEST `tiebreak`.
    *
    * @param maxLeadSec when set, a matched right row further than this
    *                   many seconds AFTER the left timestamp is treated
    *                   as no match. */
  def joinForward(left: DataFrame, right: DataFrame, on: Seq[String],
                  leftTs: Column, rightTs: Column, tiebreak: Column,
                  payload: Seq[String], strict: Boolean = false,
                  maxLeadSec: Option[Long] = None): DataFrame = {
    maxLeadSec.foreach(t =>
      require(t >= 0, s"maxLeadSec must be >= 0, got $t"))
    val reserved = Set("__ts", "__side", "__tb", "__rv", "__match", "__mts")
    require(!left.columns.exists(reserved),
      s"left side must not contain ${reserved.mkString(", ")}")
    // non-strict: left sorts BEFORE same-instant right rows, so its
    // [current, ∞) frame sees them; strict: right sorts first → unseen
    val leftSideRank = if (strict) 1 else 0
    val rightSideRank = 1 - leftSideRank
    val keyCols = on.map(col)
    val leftCols = left.columns
    val r = right.filter(rightTs.isNotNull)
      .select(keyCols :+ rightTs.as("__ts") :+
        lit(rightSideRank).as("__side") :+ tiebreak.as("__tb") :+
        struct(payload.map(col): _*).as("__rv"): _*)
    val rvType = r.schema("__rv").dataType.catalogString
    val tbType = r.schema("__tb").dataType.catalogString
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(leftSideRank))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__rv", lit(null).cast(rvType))
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // null-ts LEFT rows sort first under nulls-first ascending order and
    // would see EVERY right row as "next"; their timestamp comparison is
    // undefined, so mask their match to NULL explicitly
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match",
        when(col("__ts").isNotNull,
          first(col("__rv"), ignoreNulls = true).over(w)))
      .withColumn("__mts",
        when(col("__ts").isNotNull,
          first(when(col("__side") === rightSideRank, col("__ts")),
            ignoreNulls = true).over(w)))
      .filter(col("__side") === leftSideRank)
    val gated = maxLeadSec match {
      // the timestamp cast normalizes TIMESTAMP_NTZ inputs (session
      // zone is pinned UTC by this repo's discipline, so the instant
      // is unchanged); unix_micros rejects NTZ directly
      case Some(t) => carried.withColumn("__match",
        when(unix_micros(col("__mts").cast("timestamp"))
          - unix_micros(col("__ts").cast("timestamp")) <=
          t * 1000000L, col("__match")))
      case None => carried
    }
    gated.select(leftCols.toIndexedSeq.map(col) ++
      payload.map(p => col(s"__match.$p").as(s"asof_$p")): _*)
  }
}
