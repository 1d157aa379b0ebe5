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

  test("zorderKey: out-of-bounds values clamp to the 16-bit range") {
    import org.apache.spark.sql.functions.{col, lit}
    // bounds [0, 100]: in-range, below-range, above-range
    val df = Seq((0.0, 0.0), (-50.0, 0.0), (250.0, 0.0),
      (100.0, 100.0), (0.0, 1e9)).toDF("x", "y")
    val keys = df.select(Scale.zorderKey(col("x"), col("y"),
        lit(0.0), lit(100.0), lit(0.0), lit(100.0)).as("z"))
      .as[Long].collect()
    // every key fits in 32 interleaved bits — no sign-extension garbage
    keys.foreach { k => k should be >= 0L; k should be < (1L << 32) }
    // below-range clamps to the lo corner, above-range to the hi corner
    keys(1) shouldBe keys(0)
    keys(2) should be > keys(0)
    keys(4) shouldBe df.select(Scale.zorderKey(col("x"), lit(100.0),
      lit(0.0), lit(100.0), lit(0.0), lit(100.0)).as("z"))
      .as[Long].collect()(0)
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

  test("saltedJoin splits the hot key across tasks (skew evidence)") {
    // 90% of the big side is one key: hash-partitioned on k alone, all of
    // it funnels into ONE shuffle partition (the straggler task at scale)
    val n = 20000L
    val big = spark.range(n).select(
      when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id"))
        .as("k"),
      $"id")
    val parts = 16
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.rdd.mapPartitions(it => Iterator.single(it.size.toLong))
        .collect().max
    val unsalted = maxPartRows(big.repartition(parts, $"k"))
    // the salted join's exchange partitions on (k, __salt): mimic it with
    // the same salt expression saltedJoin derives from the salt source
    val buckets = 8
    val salted = maxPartRows(big
      .withColumn("__salt", coalesce(pmod(xxhash64($"id"), lit(buckets)), lit(0)))
      .repartition(parts, $"k", $"__salt"))
    unsalted should be >= (n * 9 / 10) // hot key concentrated in one task
    // spread over buckets (several salt groups may hash-collide into one
    // partition, so the bound is buckets-agnostic: no task holds more than
    // half the hot key anymore)
    salted.toDouble should be <= unsalted.toDouble / 2
    // and the executed join plan really exchanges on (k, __salt) — with
    // broadcast off, since a broadcastable small side needs no salting
    val dim = Seq(("hot", "HOT")).toDF("k", "label")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Scale.saltedJoin(big, dim, Seq("k"), xxhash64($"id"), buckets)
        .queryExecution.executedPlan.toString.toLowerCase
      plan should include("hashpartitioning(k")
      plan should include("__salt")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
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

  test("rendezvousShard: monotone growth moves only added-shard winners") {
    val df = (1L to 2000L).toDF("id")
      .select($"id",
        Scale.rendezvousShard($"id", 8).as("s8"),
        Scale.rendezvousShard($"id", 10).as("s10"))
      .collect()
    df.foreach { r =>
      val (s8, s10) = (r.getInt(1), r.getInt(2))
      s8 should (be >= 0 and be < 8)
      s10 should (be >= 0 and be < 10)
      // HRW property: a row moves iff its 10-shard winner is a NEW shard
      if (s10 < 8) s10 shouldBe s8
    }
    val moved = df.count(r => r.getInt(1) != r.getInt(2)).toDouble / df.length
    moved should (be > 0.1 and be < 0.3) // expected 2/10
  }
}
