package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Windows}

class R6hOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- Theil-Sen

  test("theilSenSlope is the median pairwise slope and shrugs off outliers") {
    // y = 2x except one wild outlier at x=3
    val pts = Seq(("k", 0L, 0.0), ("k", 1L, 2.0), ("k", 2L, 4.0),
      ("k", 3L, 1000.0), ("k", 4L, 8.0))
      .toDF("key", "x", "y")
      .withColumn("y", col("y").cast("decimal(18,2)"))
    val row = Windows.theilSenSlope(pts, Seq("key"), "x", "y")
      .collect().head
    row.getAs[Long]("n_points") shouldBe 5L
    row.getAs[Long]("n_pairs") shouldBe 10L
    // 6 of 10 pairwise slopes are exactly 2; median = 2
    row.getAs[Double]("theil_sen_slope") shouldBe 2.0
  }

  test("theilSenSlope handles multiple keys independently") {
    val pts = (Seq(("a", 0L, 0.0), ("a", 1L, 3.0), ("a", 2L, 6.0)) ++
      Seq(("b", 0L, 10.0), ("b", 1L, 8.0), ("b", 2L, 6.0)))
      .toDF("key", "x", "y")
      .withColumn("y", col("y").cast("decimal(18,2)"))
    val got = Windows.theilSenSlope(pts, Seq("key"), "x", "y")
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Double]("theil_sen_slope")).toMap
    got("a") shouldBe 3.0
    got("b") shouldBe -2.0
  }

  // -------------------------------------------- seasonal index

  test("seasonalIndex is dow-mean over overall-mean") {
    // Sundays always 20, other days 10 -> overall mean depends on mix
    val days = Seq(
      ("k", "2024-01-07", 20.0), ("k", "2024-01-14", 20.0), // Sundays
      ("k", "2024-01-08", 10.0), ("k", "2024-01-09", 10.0)  // Mon, Tue
    ).toDF("key", "day", "v")
      .withColumn("day", to_date(col("day")))
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Windows.seasonalIndex(days, Seq("key"), "day", "v")
      .collect().map(r => r.getAs[Int]("dow") ->
        r.getAs[Double]("seasonal_index")).toMap
    // overall mean = 60/4 = 15; sunday mean 20 -> 4/3; weekday 10 -> 2/3
    got(0) shouldBe (40.0 * 4) / (2 * 60.0)
    got(1) shouldBe (10.0 * 4) / (1 * 60.0)
    got.keySet shouldBe Set(0, 1, 2)
  }

  // -------------------------------------------- inverted index

  test("invertedIndex counts df/tf and pins postings order") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta delta"),
      (3L, "alpha epsilon")
    ).toDF("doc_id", "text")
    val got = Retrieval.invertedIndex(docs, "doc_id", "text",
        minTermLen = 4)
      .collect().map(r => r.getAs[String]("term") -> r).toMap
    got("alpha").getAs[Long]("df") shouldBe 2L
    got("alpha").getAs[Long]("total_tf") shouldBe 3L
    got("beta").getAs[Long]("total_tf") shouldBe 3L
    // fingerprint = md5 of "doc:tf:first_pos|..." sorted by doc
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("1:2:0|3:1:0".getBytes).map(b => f"$b%02x").mkString
    got("alpha").getAs[String]("postings_fp") shouldBe expected
  }

  test("invertedIndex drops short terms and is partition-invariant") {
    val docs = Seq((1L, "aa bb cccc dddd"), (2L, "cccc ee")).toDF("id", "t")
    val a = Retrieval.invertedIndex(docs, "id", "t").collect()
      .map(r => (r.getString(3), r.getLong(1))).toSet
    val b = Retrieval.invertedIndex(docs.repartition(7), "id", "t")
      .collect().map(r => (r.getString(3), r.getLong(1))).toSet
    a shouldBe b
    Retrieval.invertedIndex(docs, "id", "t")
      .select("term").as[String].collect().toSet shouldBe
      Set("cccc", "dddd")
  }
}
