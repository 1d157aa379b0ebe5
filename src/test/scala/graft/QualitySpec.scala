package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, -5.0, "W"), (2, 10.0, null), (3, -1.0, "E"), (4, 0.0, "E")
  ).toDF("id", "profit", "region")

  test("check: one row per rule, counts from a single scan") {
    val out = Quality.check(df, Seq(
      Quality.Rule("NEG_PROFIT", "profit < 0", $"profit" < 0),
      Quality.Rule("NULL_REGION", "region is null", $"region".isNull),
      Quality.Rule("NEVER", "false", lit(false))))
    out.count() shouldBe 3
    out.filter($"issue_type" === "NEG_PROFIT")
      .select("row_count").as[Long].head() shouldBe 2
    out.filter($"issue_type" === "NULL_REGION")
      .select("row_count").as[Long].head() shouldBe 1
    out.filter($"issue_type" === "NEVER")
      .select("row_count").as[Long].head() shouldBe 0
  }

  test("duplicateKeyCount / orphanCount constraint checks") {
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    Quality.duplicateKeyCount(dup, Seq("k")) shouldBe 1
    Quality.duplicateKeyCount(dup, Seq("k", "v")) shouldBe 0

    val fact = Seq(1, 2, 9).toDF("fk")
    val dim = Seq(1, 2, 3).toDF("pk")
    Quality.orphanCount(fact, "fk", dim, "pk") shouldBe 1
  }
}
