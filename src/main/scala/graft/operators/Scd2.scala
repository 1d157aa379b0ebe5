package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Generic SCD Type 2 merge (SURVEY §2.3 J8, §2.8 X3, §7.5.1).
  *
  * Reference semantics (SQLproject1.sql:485-513 Customer, :541-557 Product):
  *  - change detection by SHA2-256 hash-diff over the tracked columns;
  *  - brand-new natural keys enter with the open sentinel range
  *    [1900-01-01, 9999-12-31), IsCurrent=1;
  *  - a changed key closes its current row (EffectiveTo = runDate,
  *    IsCurrent=0) and inserts a new current version (EffectiveFrom =
  *    runDate);
  *  - keys absent from the snapshot are left untouched (no delete handling).
  *
  * `runDate` is an explicit parameter, not GETDATE() — deterministic,
  * testable, re-runnable (SURVEY §7.5.2). The reference's own re-run bug
  * (change detection keyed on `EffectiveTo = today`, :504) is NOT
  * reproduced; we detect change purely by hash-diff, so a same-day re-run
  * with an unchanged snapshot is a no-op.
  *
  * Scale: the classifier is two hash-partitioned joins on the natural key
  * (semi for changed, anti for brand-new) over the *current* slice only;
  * history rows pass through untouched. Caller should `localCheckpoint()`
  * the input dim before overwriting the table it came from
  * (read-then-overwrite hazard, SURVEY §7.5.1).
  */
object Scd2 {

  val OpenStart = "1900-01-01"
  val OpenEnd   = "9999-12-31"

  private def withHashDiff(snapshot: DataFrame, tracked: Seq[String]): DataFrame =
    snapshot.withColumn("hash_diff", Hashing.hashDiff(tracked.map(col)))

  /** First load: every snapshot row becomes current with the open range. */
  def initialLoad(snapshot: DataFrame, tracked: Seq[String]): DataFrame =
    withHashDiff(snapshot, tracked)
      .withColumn("effective_from", to_date(lit(OpenStart)))
      .withColumn("effective_to", to_date(lit(OpenEnd)))
      .withColumn("is_current", lit(true))

  /** Merge a new snapshot into an existing SCD2 dim. */
  def merge(dim: DataFrame, snapshot: DataFrame, naturalKey: Seq[String],
            tracked: Seq[String], runDate: String): DataFrame = {
    val snap = withHashDiff(snapshot, tracked)
    val current = dim.filter(col("is_current"))
    val history = dim.filter(!col("is_current"))

    val changedKeys = current
      .select(naturalKey.map(col) :+ col("hash_diff").as("__cur_hd"): _*)
      .join(snap.select(naturalKey.map(col) :+ col("hash_diff").as("__snap_hd"): _*),
            naturalKey)
      .filter(col("__cur_hd") =!= col("__snap_hd"))
      .select(naturalKey.map(col): _*)

    val kept = current.join(changedKeys, naturalKey, "left_anti")
    val closed = current.join(changedKeys, naturalKey, "left_semi")
      .withColumn("effective_to", to_date(lit(runDate)))
      .withColumn("is_current", lit(false))
    val newVersions = snap.join(changedKeys, naturalKey, "left_semi")
      .withColumn("effective_from", to_date(lit(runDate)))
      .withColumn("effective_to", to_date(lit(OpenEnd)))
      .withColumn("is_current", lit(true))
    val brandNew = snap.join(current, naturalKey, "left_anti")
      .withColumn("effective_from", to_date(lit(OpenStart)))
      .withColumn("effective_to", to_date(lit(OpenEnd)))
      .withColumn("is_current", lit(true))

    Seq(history, kept, closed, newVersions, brandNew)
      .map(_.select(kept.columns.toIndexedSeq.map(col): _*))
      .reduce(_ unionByName _)
  }

  /** [[merge]] for a dim that carries a surrogate key column: surviving
    * version rows (history, unchanged, closed) KEEP their keys — the
    * reference's MERGE updates rows in place, never re-keys them
    * (SQLproject1.sql:485-513) — while new version rows (a changed key's
    * new current version, brand-new keys) get fresh keys offset past
    * max(existing).
    *
    * A version row is identified by (naturalKey, effective_from,
    * hash_diff): effective_from alone is NOT unique when a key changes
    * twice under one runDate (the second merge closes a version that
    * opened at runDate and opens another at runDate), but those two
    * versions necessarily carry different hash_diffs — change detection IS
    * hash inequality. The one identity this cannot distinguish is a value
    * flipping A→B→A in THREE same-day merges (the third A-version repeats
    * the first's hash at the same start date); same-day re-merges are
    * already outside the reference's own semantics (it keys change
    * detection on EffectiveTo = today), so that corner is documented, not
    * handled. Fresh-key numbering windows over only the new rows — one
    * task over a day's novelty, same posture as
    * [[graft.operators.Dims.insertOnlyMerge]]. */
  def mergeKeyed(dim: DataFrame, snapshot: DataFrame, naturalKey: Seq[String],
                 tracked: Seq[String], runDate: String,
                 keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = merge(dim.drop(keyCol), snapshot, naturalKey, tracked, runDate)
    val versionId = naturalKey :+ "effective_from" :+ "hash_diff"
    val keyMap = dim.select(versionId.map(col) :+ col(keyCol): _*)
    val joined = merged.join(keyMap, versionId, "left")
    val kept = joined.filter(col(keyCol).isNotNull)
    val maxKey = dim.agg(coalesce(max(col(keyCol)), lit(0L)).as("__mx"))
    val fresh = joined.filter(col(keyCol).isNull).drop(keyCol)
      .withColumn("__rn",
        row_number().over(Window.orderBy(versionId.map(col): _*)).cast("long"))
      .crossJoin(broadcast(maxKey))
      .withColumn(keyCol, (col("__mx") + col("__rn")).cast("long"))
      .drop("__rn", "__mx")
    // emit the input dim's column ORDER: a MERGE updates a table in place
    // and never reorders its schema (and positional ops like except/union
    // on prior-vs-merged would silently misalign otherwise)
    val cols = dim.columns.toIndexedSeq.map(col)
    kept.select(cols: _*).unionByName(fresh.select(cols: _*))
  }
}
