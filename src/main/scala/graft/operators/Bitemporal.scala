package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitemporal versioning: VALID time (when a fact was true in the
  * world) × SYSTEM time (when the warehouse learned it). [[Scd2]]
  * tracks only one axis; the questions auditors actually ask — "what
  * did we BELIEVE on T about the state at V" — need both.
  */
object Bitemporal {

  /** Build an append-only bitemporal version table from a change log:
    * one row per (key, change), valid_from = the change timestamp,
    * valid_to = the next change's timestamp (NULL = still valid),
    * sys_from = when the warehouse recorded it (`recordedTs`, which may
    * lag valid_from — late-arriving facts are the reason system time
    * exists). Append-only: corrections supersede by a LATER sys_from
    * over the same valid range, they never rewrite rows.
    *
    * Scale: one window per key (the SCD2 shuffle shape). */
  def versionTable(changes: DataFrame, keyCol: String, validTs: Column,
                   recordedTs: Column, tiebreak: Column,
                   payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(validTs, tiebreak)
    changes
      .withColumn("valid_from", validTs)
      .withColumn("valid_to", lead(validTs, 1).over(w))
      .withColumn("sys_from", recordedTs)
      .withColumn("version", row_number().over(w))
      .select(col(keyCol) +: col("version") +: col("valid_from") +:
        col("valid_to") +: col("sys_from") +: payload.map(col): _*)
  }

  /** Bitemporal point lookup: for each key, what the warehouse BELIEVED
    * at `knownAt` about the state at `validAt`.
    *
    * The subtlety the naive filter gets wrong: `valid_to` is itself
    * knowledge-dependent — a reader at `knownAt` had not seen changes
    * recorded later, so to them the then-latest change looked
    * open-ended. Correct rule over an append-only change log: restrict
    * to versions with `sys_from ≤ knownAt`, then take the latest change
    * with `valid_from ≤ validAt` (ties → highest version). The emitted
    * `valid_to` is the BELIEF-consistent one — the earliest KNOWN
    * change after `validAt` — not the current-knowledge interval end.
    * Keys with no qualifying version are absent: at that `knownAt` the
    * warehouse genuinely knew nothing about them.
    *
    * Scale: a filter + two per-key windows; nothing wider than the key
    * is shuffled. */
  def asOf(versions: DataFrame, keyCol: String, validAt: Column,
           knownAt: Column): DataFrame = {
    val known = versions.filter(col("sys_from") <= knownAt)
    val w = Window.partitionBy(col(keyCol))
    val withBelief = known.withColumn("__belief_to",
      min(when(col("valid_from") > validAt, col("valid_from"))).over(w))
    withBelief
      .filter(col("valid_from") <= validAt)
      .withColumn("__rn", row_number().over(
        w.orderBy(col("valid_from").desc, col("version").desc)))
      .filter(col("__rn") === 1)
      .withColumn("valid_to", col("__belief_to"))
      .drop("__rn", "__belief_to")
  }
}
