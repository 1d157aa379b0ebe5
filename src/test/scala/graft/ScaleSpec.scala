package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key (90% of rows) + a long tail
    val hot = (1 to 900).map(i => ("hot", i.toLong, i.toDouble))
    val tail = (1 to 100).map(i => (s"k$i", i.toLong, i.toDouble))
    (hot ++ tail).toDF("k", "id", "v")
  }

  test("saltedSum equals the plain grouped sum") {
    val plain = skewed.groupBy("k").agg(sum($"v").as("sv"))
    val salted = Scale.saltedSum(skewed, Seq("k"), $"v",
      xxhash64($"id"), buckets = 8, as = "sv")
    plain.except(salted).count() shouldBe 0
    salted.except(plain).count() shouldBe 0
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "HOT"), ("k1", "T1"), ("k2", "T2")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).select("k", "id", "label")
    val salted = Scale.saltedJoin(skewed, dim, Seq("k"),
        xxhash64($"id"), buckets = 8)
      .select("k", "id", "label")
    plain.count() shouldBe salted.count()
    plain.except(salted).count() shouldBe 0
    salted.except(plain).count() shouldBe 0
  }

  test("saltedJoin keeps rows whose salt source is NULL") {
    val big = Seq(("hot", Some(1L)), ("hot", None)).toDF("k", "id")
    val dim = Seq(("hot", "HOT")).toDF("k", "label")
    Scale.saltedJoin(big, dim, Seq("k"), $"id", 8)
      .count() shouldBe 2 // NULL-salt row lands in bucket 0, not dropped
  }

  test("hashKeyDim: stable parallel keys, zero collisions on real dims") {
    val dim = Scale.hashKeyDim(Tables.customer(spark, "/root/testdata/sf0.001"),
      Seq("c_name", "c_mktsegment"), "ck")
    Scale.hashCollisionCount(dim, "ck") shouldBe 0
    // stable: same inputs, same keys
    val again = Scale.hashKeyDim(Tables.customer(spark, "/root/testdata/sf0.001"),
      Seq("c_name", "c_mktsegment"), "ck")
    dim.except(again).count() shouldBe 0
  }

  test("bucketed tables co-locate the join: no shuffle on either side") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, "/root/testdata/sf0.001")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, "/root/testdata/sf0.001")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val joined = spark.table("b_orders").join(
      spark.table("b_customer"),
      col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucket-pruned join: no exchange on either input
    plan should not include "Exchange hashpartitioning"
    joined.count() should be > 0L
  }
}
