package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical row-hashing for change detection (SURVEY §2.8 X3).
  *
  * Reference semantics: `HASHBYTES('SHA2_256', CONCAT(UPPER(ISNULL(a,'')),
  * '|', ...))` for SCD2 hash-diffs (SQLproject1.sql:465-472, 530-537) and an
  * MD5 hash-key over upper-cased geography columns (:323-325). We keep the
  * same canonicalization — upper-case, NULL→'', '|' separator — but emit
  * Spark's hex-string form (`sha2`/`md5` return hex lowercase).
  *
  * Both are codegen'd built-ins; at scale a hash-key equi-join replaces a
  * multi-column case-insensitive join (SURVEY J2) with a single shuffle key.
  */
object Hashing {

  /** Canonical '|'-joined, upper-cased, NULL→'' concatenation. */
  def canonical(cols: Seq[Column]): Column =
    concat_ws("|", cols.map(c => upper(coalesce(c.cast("string"), lit("")))): _*)

  /** SHA2-256 hash-diff over the tracked columns (SCD2 change detection). */
  def hashDiff(cols: Seq[Column]): Column = sha2(canonical(cols), 256)

  /** MD5 hash-key over the natural-key columns (join-key compaction). */
  def hashKey(cols: Seq[Column]): Column = md5(canonical(cols))
}
