package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Windows}

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sales = Seq(
    // (order, product, ingested, qty)
    ("O1", "P1", 1, 10),
    ("O1", "P1", 2, 20), // duplicate key, newer ingest wins
    ("O1", "P2", 1, 5),
    ("O2", "P1", 3, 7),
    ("O2", "P1", 3, 7)   // exact duplicate
  ).toDF("order_id", "product_id", "ingested", "qty")

  test("Dedup.keepFirst keeps exactly one row per key") {
    val out = Dedup.keepFirst(sales, Seq("order_id", "product_id"),
      Seq(col("ingested").desc, col("qty").desc))
    out.count() shouldBe 3
    out.filter($"order_id" === "O1" && $"product_id" === "P1")
      .select("qty").as[Int].head() shouldBe 20
  }

  test("Dedup.exactGroups: one row per distinct content, min id survives") {
    val docs = Seq((1, "a"), (2, "a"), (3, "b")).toDF("id", "text")
    val out = Dedup.exactGroups(docs, "id", md5(col("text")))
      .orderBy("keep_id")
      .select("keep_id", "dup_count").as[(Int, Long)].collect().toSeq
    out shouldBe Seq((1, 2L), (3, 1L))
  }

  test("Windows.lineNumber is deterministic and dense per group") {
    val out = Windows.lineNumber(sales, Seq(col("order_id")),
      Seq(col("product_id"), col("ingested"), col("qty")), "line_no")
    out.filter($"order_id" === "O1").orderBy("line_no")
      .select("line_no").as[Int].collect().toSeq shouldBe Seq(1, 2, 3)
  }

  test("Windows.latestPerKey picks the max-ordering row") {
    val out = Windows.latestPerKey(sales,
      Seq(col("order_id")), Seq(col("ingested"), col("qty")))
    out.count() shouldBe 2
    out.filter($"order_id" === "O1").select("ingested").as[Int].head() shouldBe 2
  }

  test("Windows.rollingSum matches brute force on a ROWS frame") {
    val df = (1 to 20).map(i => ("g", i, i.toDouble)).toDF("g", "seq", "v")
    val out = Windows.rollingSum(df, Seq(col("g")), Seq(col("seq")),
        col("v"), 5, "roll")
      .orderBy("seq").select("roll").as[Double].collect().toSeq
    val expected = (1 to 20).map(i => ((i - 4).max(1) to i).map(_.toDouble).sum)
    out shouldBe expected
  }

  test("Windows.topNPerGroup keeps RANK ties") {
    val df = Seq(("g", "a", 10), ("g", "b", 10), ("g", "c", 9), ("g", "d", 1))
      .toDF("g", "id", "score")
    // top-1 by RANK keeps both tied rows
    val out = Windows.topNPerGroup(df, Seq(col("g")), col("score"), 1)
    col1(out.select("id")) shouldBe Seq("a", "b")
  }

  test("Windows.shareOfTotal sums to 1 per partition; NULL on zero total") {
    val df = Seq(("g1", 2.0), ("g1", 6.0), ("g2", 0.0)).toDF("g", "v")
    val out = df.select($"g", Windows.shareOfTotal(col("v"), Seq(col("g"))).as("s"))
    out.filter($"g" === "g1").agg(sum("s")).as[Double].head() shouldBe 1.0 +- 1e-12
    out.filter($"g" === "g2").select("s").collect().head.isNullAt(0) shouldBe true
  }
}
