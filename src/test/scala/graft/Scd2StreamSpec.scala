package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Scd2
import graft.streaming.Scd2Stream

/** Streaming SCD2 maintenance == the nightly batch merges, including a
  * catching-up batch that carries two snapshot days. */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private val naturalKey = Seq("cust_id")
  private val tracked = Seq("segment", "region")

  private def snap(rows: Seq[(Long, String, String)], d: String) =
    rows.map { case (id, seg, reg) => (id, seg, reg, d) }
      .toDF("cust_id", "segment", "region", "run_date")

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select($"cust_id", $"segment", $"region",
      $"effective_from".cast("string"), $"effective_to".cast("string"),
      $"is_current")
    .as[(Long, String, String, String, String, Boolean)].collect().toSet

  test("stream of snapshot drops == batch merges in date order") {
    val in = Files.createTempDirectory("graft_scd2s_in").toString
    val dim = Files.createTempDirectory("graft_scd2s_dim").toString + "/d"
    val ckpt = Files.createTempDirectory("graft_scd2s_ck").toString

    val day1 = Seq((1L, "Consumer", "West"), (2L, "Corporate", "East"))
    val day2 = Seq((1L, "Web", "West"), (2L, "Corporate", "East"),
      (3L, "Consumer", "South")) // 1 drifts, 3 is new
    val day3 = Seq((1L, "Web", "North"), (2L, "Corporate", "East"),
      (3L, "Consumer", "South")) // 1 drifts again

    val schema = snap(day1, "2024-01-01").schema

    // batch 1: day-1 snapshot alone
    snap(day1, "2024-01-01").write.mode("append").parquet(in)
    Scd2Stream.runIncremental(spark, in, schema, dim, ckpt,
      naturalKey, tracked, "run_date")
    // batch 2: days 2 AND 3 arrive together (catch-up)
    snap(day2, "2024-01-02").write.mode("append").parquet(in)
    snap(day3, "2024-01-03").write.mode("append").parquet(in)
    Scd2Stream.runIncremental(spark, in, schema, dim, ckpt,
      naturalKey, tracked, "run_date")

    val streamed = canon(spark.read.parquet(dim))

    // the same three merges run as plain batch operators
    val b1 = Scd2.initialLoad(
      day1.toDF("cust_id", "segment", "region"), tracked)
    val b2 = Scd2.merge(b1, day2.toDF("cust_id", "segment", "region"),
      naturalKey, tracked, "2024-01-02")
    val b3 = Scd2.merge(b2, day3.toDF("cust_id", "segment", "region"),
      naturalKey, tracked, "2024-01-03")
    streamed shouldBe canon(b3)

    // invariants: one current row per key; drift produced history
    val cur = spark.read.parquet(dim).filter($"is_current")
    cur.groupBy("cust_id").count().filter($"count" > 1).count() shouldBe 0
    spark.read.parquet(dim).filter(!$"is_current")
      .filter($"cust_id" === 1L).count() shouldBe 2 // two closed versions
  }

  test("re-running with no new files is a no-op (checkpointed)") {
    val in = Files.createTempDirectory("graft_scd2s_in2").toString
    val dim = Files.createTempDirectory("graft_scd2s_dim2").toString + "/d"
    val ckpt = Files.createTempDirectory("graft_scd2s_ck2").toString
    val day1 = Seq((1L, "Consumer", "West"))
    val schema = snap(day1, "2024-01-01").schema
    snap(day1, "2024-01-01").write.mode("append").parquet(in)
    Scd2Stream.runIncremental(spark, in, schema, dim, ckpt,
      naturalKey, tracked, "run_date")
    val first = canon(spark.read.parquet(dim))
    Scd2Stream.runIncremental(spark, in, schema, dim, ckpt,
      naturalKey, tracked, "run_date")
    canon(spark.read.parquet(dim)) shouldBe first
  }
}
