package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality rule engine (SURVEY §2.2 P4, §2.7 U2; SQLproject1.sql:213-240).
  *
  * Reference semantics: each rule is a predicate whose violation COUNT is
  * recorded as a row `(issue_type, issue_detail, row_count)` in a load-issues
  * table — surfaced, not enforced. We evaluate all rules in ONE pass with
  * conditional aggregation (`sum(when(pred,1))`) instead of one scan per
  * rule: at 100 TB, N rules must not mean N table scans.
  */
object Quality {

  final case class Rule(issueType: String, issueDetail: String, predicate: Column)

  /** Evaluate all rules in a single scan; one output row per rule.
    *
    * `createdAt` is the reference's `CreatedAt DATETIME DEFAULT GETDATE()`
    * audit column (SQLproject1.sql:220) — issues from successive runs must
    * stay distinguishable when appended to a load-issues table. An explicit
    * parameter (never wall clock) keeps runs deterministic; None omits the
    * column. */
  def check(df: DataFrame, rules: Seq[Rule],
            createdAt: Option[String] = None): DataFrame = {
    require(rules.nonEmpty, "Quality.check needs at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count(when(r.predicate, lit(1))).as(s"__c$i")
    }
    val counts = df.agg(aggs.head, aggs.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val meta = rules.zipWithIndex
      .map { case (r, i) => (i, r.issueType, r.issueDetail) }
      .toDF("__i", "issue_type", "issue_detail")
    // counts is a single row: stack it to (rule index, count) and join the
    // rule metadata (both sides tiny — broadcast, no shuffle of the fact).
    val stacked = counts.select(
      explode(array(rules.indices.map(i =>
        struct(lit(i).as("__i"), col(s"__c$i").as("row_count"))): _*)).as("kv"))
      .select(col("kv.__i"), col("kv.row_count"))
    val out = stacked.join(broadcast(meta), "__i")
      .select(col("issue_type"), col("issue_detail"), col("row_count"))
    createdAt.fold(out)(ts =>
      out.withColumn("created_at", to_timestamp(lit(ts))))
  }

  /** One-pass column profiler: null rate, distinct count, min/max per
    * column, one output row per column (values canonicalized to strings).
    * The single wide aggregate keeps it at ONE table scan regardless of
    * column count — at 100 TB, profiling must not be N scans. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "Quality.profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = one.select(explode(array(columns.map(c =>
      struct(lit(c).as("column_name"),
        col(s"__cnt_$c").as("n_present"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
    stacked.select(col("p.*"))
  }

  /** §1.3 constraint checks (Spark enforces nothing — assert post-build). */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()

  /** FK integrity: rows in `fact` whose `fk` has no match in `dim.pk`. */
  def orphanCount(fact: DataFrame, fk: String, dim: DataFrame, pk: String): Long =
    fact.join(dim.select(col(pk)), fact(fk) === dim(pk), "left_anti").count()
}
