package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, 10.0), (1L, 20.0), (2L, 5.0), (3L, 7.5), (3L, 2.5), (4L, 1.0)
  ).toDF("k", "amount")

  private def dims = Seq(
    (1L, "HIGH"), (2L, "LOW"), (3L, "HIGH"), (4L, "LOW"), (5L, "LOW")
  ).toDF("dk", "prio")

  /** Both sides of a fact-to-fact join are huge at scale; disable the
    * broadcast fallback so the assert proves CO-LOCATION, not a lucky
    * BroadcastHashJoin (which also has zero shuffle exchanges). */
  private def noBroadcast[T](body: => T): T = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed join + per-key agg plans zero shuffle exchanges") {
    Bucketing.writeBucketed(facts, "bspec_fact", "k", 4, Seq("k"))
    Bucketing.writeBucketed(dims, "bspec_dim", "dk", 4, Seq("dk"))
    noBroadcast {
      val joined = spark.table("bspec_fact")
        .join(spark.table("bspec_dim"), col("k") === col("dk"))
        .groupBy(col("k"), col("prio"))
        .agg(sum(col("amount")).as("amt"), count(lit(1)).as("n"))
      Bucketing.shuffleExchangeCount(joined) shouldBe 0
      // layout never changes results: same rows as the plain join
      val expected = facts.join(dims, col("k") === col("dk"))
        .groupBy(col("k"), col("prio"))
        .agg(sum(col("amount")).as("amt"), count(lit(1)).as("n"))
      rowsAsStrings(joined) shouldBe rowsAsStrings(expected)
    }
  }

  test("mismatched bucket counts reintroduce the shuffle (the contract)") {
    Bucketing.writeBucketed(facts, "bspec_fact8", "k", 8, Seq("k"))
    Bucketing.writeBucketed(dims, "bspec_dim4", "dk", 4, Seq("dk"))
    noBroadcast {
      val joined = spark.table("bspec_fact8")
        .join(spark.table("bspec_dim4"), col("k") === col("dk"))
      Bucketing.shuffleExchangeCount(joined) should be > 0
    }
  }

  test("writeBucketed survives a stale physical location (cross-JVM residue)") {
    val whConf = spark.conf.get("spark.sql.warehouse.dir")
    val wh = new java.io.File(
      if (whConf.contains(":")) new java.net.URI(whConf).getPath else whConf)
    val stale = new java.io.File(wh, "bspec_stale")
    stale.mkdirs()
    java.nio.file.Files.write(new java.io.File(stale, "junk").toPath,
      "leftover".getBytes)
    Bucketing.writeBucketed(facts, "bspec_stale", "k", 2, Seq("k"))
    spark.table("bspec_stale").count() shouldBe facts.count()
    // and a second overwrite is idempotent
    Bucketing.writeBucketed(facts, "bspec_stale", "k", 2, Seq("k"))
    spark.table("bspec_stale").count() shouldBe facts.count()
  }
}
