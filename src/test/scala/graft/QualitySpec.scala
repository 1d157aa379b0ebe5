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

  test("sourceQualityShrinkage: micro-source stops outranking the workhorse") {
    import spark.implicits._
    // tiny: 3/3 good (raw 1.0); big: 9400/10000 (raw 0.94);
    // junk: 0/2000 — drags the pooled rate to ~0.78, so shrinkage pulls
    // the unproven tiny source toward the pool while big barely moves
    val docs = ((1 to 3).map(_ => ("tiny", 500L)) ++
      (1 to 9400).map(_ => ("big", 500L)) ++
      (1 to 600).map(_ => ("big", 10L)) ++
      (1 to 2000).map(_ => ("junk", 10L))).toDF("source", "n_chars")
    val out = graft.operators.Quality.sourceQualityShrinkage(
        docs, "source", org.apache.spark.sql.functions.col("n_chars") >= 300,
        priorStrength = 100.0)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("raw_rate"), r.getAs[Double]("shrunk_rate"),
          r.getAs[Int]("rank")))).toMap
    out("tiny")._1 shouldBe 1.0
    out("tiny")._2 should be < out("big")._2 // shrunk toward pooled ~0.94
    out("big")._3 shouldBe 1 // workhorse ranks first after shrinkage
    // big barely moves: n >> priorStrength
    out("big")._2 shouldBe out("big")._1 +- 0.005
  }
}
