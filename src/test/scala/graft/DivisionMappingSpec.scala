package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DivisionMappingSpec extends SparkSpec {
  import spark.implicits._

  test("relational division keeps only full-coverage groups") {
    val orders = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "a"))
      .toDF("cust", "prio")
    val target = orders.select(col("prio")).distinct().count()
    val got = orders.groupBy(col("cust"))
      .agg(countDistinct(col("prio")).as("np"))
      .filter(col("np") === target)
      .collect().map(_.getLong(0)).sorted
    got.toSeq shouldBe Seq(1L, 3L)
  }

  test("quantile mapping preserves rank order and pulls from the " +
    "reference distribution") {
    // B values 10x A's scale: mapping must land each B value on the
    // A value at the matching percentile
    val a = (1 to 100).map(i => ("A", i.toLong, i.toLong))
    val b = (1 to 10).map(i => ("B", 1000L + i, i * 1000L))
    val spend = (a ++ b).toDF("variant", "user_id", "cents")
    val aR = spend.filter(col("variant") === "A")
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cents"), col("user_id"))))
    val bR = spend.filter(col("variant") === "B")
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cents"), col("user_id"))))
      .withColumn("tgt", (col("rk") * 100 + 9) - pmod(col("rk") * 100 + 9,
        lit(10)))
      .withColumn("tgt", (col("tgt") / 10).cast("long"))
    val got = bR.join(aR.select(col("rk").cast("long").as("tgt"),
        col("cents").as("mapped")), Seq("tgt"))
      .orderBy(col("rk")).collect().map(_.getAs[Long]("mapped"))
    // B's rank k of 10 -> A's rank 10k of 100 -> value 10k
    got.toSeq shouldBe (1 to 10).map(_ * 10L)
  }
}
