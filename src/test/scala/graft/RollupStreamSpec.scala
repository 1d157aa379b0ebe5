package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Scale
import graft.streaming.RollupStream

/** Streaming dirty-day rollup maintenance == a from-scratch rollup over
  * everything that ever arrived, across multiple file drops. */
class RollupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def facts(rows: Seq[(String, String, Double)]) =
    rows.toDF("day", "g", "v").withColumn("day", to_date($"day"))

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select($"day".cast("string"), $"g", $"n_rows",
      $"sum_measure".cast("double"))
    .as[(String, String, Long, Double)].collect().toSet

  test("streamed dirty-day refresh == full recompute across drops") {
    val in = Files.createTempDirectory("graft_rs_in").toString
    val fact = Files.createTempDirectory("graft_rs_f").toString + "/f"
    val roll = Files.createTempDirectory("graft_rs_r").toString + "/r"
    val ckpt = Files.createTempDirectory("graft_rs_ck").toString

    val drop1 = Seq(("2024-01-01", "a", 10.0), ("2024-01-01", "b", 1.0),
      ("2024-01-02", "a", 20.0))
    val drop2 = Seq(("2024-01-02", "a", 5.0),  // dirty existing day
      ("2024-01-03", "b", 7.5))                // new day
    val schema = facts(drop1).schema

    facts(drop1).write.mode("append").parquet(in)
    RollupStream.runIncremental(spark, in, schema, fact, roll, ckpt,
      "day", Seq("g"), "v")
    canon(spark.read.parquet(roll)) shouldBe
      canon(Scale.rollup(facts(drop1), "day", Seq("g"), "v"))

    facts(drop2).write.mode("append").parquet(in)
    RollupStream.runIncremental(spark, in, schema, fact, roll, ckpt,
      "day", Seq("g"), "v")
    canon(spark.read.parquet(roll)) shouldBe
      canon(Scale.rollup(facts(drop1 ++ drop2), "day", Seq("g"), "v"))

    // day-1 rows were untouched by drop 2 (clean-day passthrough):
    // the refreshed rollup still carries both day-1 groups
    spark.read.parquet(roll)
      .filter($"day" === "2024-01-01").count() shouldBe 2L
  }

  test("re-running with no new files is a no-op") {
    val in = Files.createTempDirectory("graft_rs2_in").toString
    val fact = Files.createTempDirectory("graft_rs2_f").toString + "/f"
    val roll = Files.createTempDirectory("graft_rs2_r").toString + "/r"
    val ckpt = Files.createTempDirectory("graft_rs2_ck").toString

    val drop = Seq(("2024-01-01", "a", 2.0))
    facts(drop).write.mode("append").parquet(in)
    val schema = facts(drop).schema
    RollupStream.runIncremental(spark, in, schema, fact, roll, ckpt,
      "day", Seq("g"), "v")
    val first = canon(spark.read.parquet(roll))
    RollupStream.runIncremental(spark, in, schema, fact, roll, ckpt,
      "day", Seq("g"), "v")
    canon(spark.read.parquet(roll)) shouldBe first
    // and the fact store was not duplicated either
    spark.read.parquet(fact).count() shouldBe 1L
  }
}
