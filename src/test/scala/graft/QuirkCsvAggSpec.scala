package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregate pushdown (`SupportsPushDownAggregates`) on the graftcsv
  * DSv2 source: COUNT(*) / COUNT(col) / MIN / MAX, optionally grouped,
  * computed inside the PartitionReader so a split returns its partials
  * instead of its rows. Every case cross-checks against the same
  * aggregate over the plain (row-returning) scan, and asserts from the
  * plan text that the pushdown actually happened (or, for the rejection
  * cases, that it did not and results are still right).
  */
class QuirkCsvAggSpec extends SparkSpec {

  private val csv = "/root/reference/Project1/superstore.csv"

  private def graft(opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graftcsv"))((r, kv) =>
      r.option(kv._1, kv._2)).load(csv)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("global count(*)/count(col)/min/max push into the reader") {
    val agg = graft().agg(
      count(lit(1)).as("n"),
      count(col("PostalCode")).as("n_postal"),
      min(col("State")).as("lo"),
      max(col("State")).as("hi"))
    planOf(agg) should include("PushedAggregation: [COUNT(*), " +
      "COUNT(PostalCode), MIN(State), MAX(State)]")
    val expected = graft().agg(
      // force the un-pushed path by aggregating a derived column
      count(lit(1)) + lit(0L), count(col("PostalCode")) + lit(0L),
      min(concat(col("State"))), max(concat(col("State"))))
    agg.collect().head.toSeq shouldBe expected.collect().head.toSeq
  }

  test("grouped aggregate pushes and merges across byte-range splits") {
    def grouped(df: DataFrame) = df.groupBy(col("Region"))
      .agg(count(lit(1)).as("n"), min(col("City")).as("lo"),
        max(col("City")).as("hi"))
    // 64 KiB splits: ~35 partial rows per group merge to one final row
    val pushed = grouped(graft("maxSplitBytes" -> "65536"))
    planOf(pushed) should include(
      "PushedAggregation: [COUNT(*), MIN(City), MAX(City) GROUP BY Region]")
    val plain = grouped(graft().withColumn("Region",
      concat(col("Region")))) // derived group key defeats the pushdown
    rowsAsStrings(pushed) shouldBe rowsAsStrings(plain)
  }

  test("pushed filters compose: rows are filtered before they are counted") {
    val agg = graft().filter(col("Region") === "West")
      .agg(count(lit(1)).as("n"))
    val plan = planOf(agg)
    plan should include("PushedAggregation: [COUNT(*)]")
    plan should include("EqualTo(Region,West)")
    agg.collect().head.getLong(0) shouldBe
      graft().filter(col("Region") === "West").count()
  }

  test("count(*) on an empty directory merges to 0, not NULL") {
    val dir = java.nio.file.Files.createTempDirectory("agg_empty").toString
    // one empty file so the scan plans zero splits
    val df = spark.read.format("graftcsv").schema("a string").load(dir)
    df.agg(count(lit(1))).collect().head.getLong(0) shouldBe 0L
  }

  test("single split claims COMPLETE pushdown: no Aggregate node at all") {
    // the whole file is one split -> the reader's result IS the answer
    val agg = graft().groupBy(col("Region")).agg(count(lit(1)).as("n"))
    val plan = planOf(agg)
    plan should include("PushedAggregation")
    plan should not include "Aggregate"
    rowsAsStrings(agg) shouldBe rowsAsStrings(
      graft().withColumn("Region", concat(col("Region")))
        .groupBy(col("Region")).agg(count(lit(1)).as("n")))
    // multi-split stays partial: a final merge aggregate remains
    val partial = graft("maxSplitBytes" -> "65536")
      .groupBy(col("Region")).agg(count(lit(1)).as("n"))
    planOf(partial) should include("Aggregate")
  }

  test("distinct and avg aggregates are NOT pushed; results unchanged") {
    val d = graft().agg(countDistinct(col("Region")).as("n"))
    planOf(d) should not include "PushedAggregation"
    d.collect().head.getLong(0) shouldBe 4L
    val a = graft().agg(avg(col("Quantity")).as("m"))
    planOf(a) should not include "PushedAggregation"
  }

  test("group-cardinality guard fails fast instead of accumulating") {
    val e = intercept[org.apache.spark.SparkException] {
      graft("maxAggGroupsPerSplit" -> "3")
        .groupBy(col("City")).agg(count(lit(1))).collect()
    }
    e.getMessage should include("maxAggGroupsPerSplit")
  }
}
