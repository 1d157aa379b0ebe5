package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-N pushdown (`SupportsPushDownTopN`) on the graftcsv source:
  * each split returns only its n best rows under the pushed ordering. */
class QuirkCsvTopNSpec extends SparkSpec {

  private val csv = "/root/reference/Project1/superstore.csv"

  private def graft(opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graftcsv"))((r, kv) =>
      r.option(kv._1, kv._2)).load(csv)

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ORDER BY + LIMIT pushes; result equals the unpushed ordering") {
    val pushed = graft("maxSplitBytes" -> "131072")
      .orderBy(col("CustomerName").asc, col("RowID").asc).limit(9)
    plan(pushed) should include(
      "PushedTopN: ORDER BY CustomerName ASC NULLS FIRST, " +
        "RowID ASC NULLS FIRST LIMIT 9 (per split)")
    val expected = graft() // single split, same ordering, not pushed-off
      .withColumn("CustomerName", concat(col("CustomerName")))
      .orderBy(col("CustomerName").asc, col("RowID").asc).limit(9)
    rowsAsStrings(pushed) shouldBe rowsAsStrings(expected)
  }

  test("DESC and NULLS LAST orderings honor Spark semantics") {
    val pushed = graft("maxSplitBytes" -> "131072")
      .orderBy(col("PostalCode").desc_nulls_last, col("RowID").asc)
      .limit(5)
    plan(pushed) should include("PostalCode DESC NULLS LAST")
    val expected = graft()
      .withColumn("PostalCode", concat(col("PostalCode")))
      .orderBy(col("PostalCode").desc_nulls_last, col("RowID").asc)
      .limit(5)
    rowsAsStrings(pushed) shouldBe rowsAsStrings(expected)
  }

  test("top-N composes with pushed filters") {
    val pushed = graft("maxSplitBytes" -> "131072")
      .filter(col("Region") === "West")
      .orderBy(col("City").asc, col("RowID").asc).limit(3)
    val p = plan(pushed)
    p should include("PushedTopN:")
    p should include("EqualTo(Region,West)")
    val expected = graft()
      .withColumn("City", concat(col("City")))
      .filter(col("Region") === "West")
      .orderBy(col("City").asc, col("RowID").asc).limit(3)
    rowsAsStrings(pushed) shouldBe rowsAsStrings(expected)
  }

  test("a LIMIT above maxTopNPerSplit declines the push") {
    val df = graft("maxTopNPerSplit" -> "8")
      .orderBy(col("RowID").asc).limit(9)
    plan(df) should not include "PushedTopN"
    df.count() shouldBe 9
    // at or below the cap it pushes
    plan(graft("maxTopNPerSplit" -> "8")
      .orderBy(col("RowID").asc).limit(8)) should include("PushedTopN")
  }

  test("orderings on derived columns are not pushed; results unchanged") {
    val df = graft().orderBy(expr("length(City)").asc, col("RowID").asc)
      .limit(3)
    plan(df) should not include "PushedTopN"
    df.count() shouldBe 3
  }
}
