package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Sketches, Vectorize}

class R6mOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- count-min audit

  test("countMinAudit never underestimates and is exact sans collisions") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = Sketches.countMinAudit(df, "k", depth = 4, width = 1024,
      topN = 10).collect()
    got.length shouldBe 3
    got.foreach { r =>
      r.getAs[Long]("cms_n") should be >= r.getAs[Long]("exact_n")
      r.getAs[Long]("overestimate") shouldBe
        (r.getAs[Long]("cms_n") - r.getAs[Long]("exact_n"))
    }
    // 3 keys in a 4x1024 sketch: collisions are possible but the md5
    // buckets for a/b/c are distinct in every row here -> exact
    got.foreach(_.getAs[Long]("overestimate") shouldBe 0L)
  }

  test("countMinAudit width-1 degenerate sketch counts everything") {
    // width 2 with keys landing in the same cell must overestimate by
    // exactly the other keys' mass (the one-sided error, made visible)
    val df = (Seq.fill(4)("x") ++ Seq.fill(2)("y")).toDF("k")
    val got = Sketches.countMinAudit(df, "k", depth = 1, width = 2,
      topN = 10).collect().map(r => r.getAs[String]("key") ->
      (r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n"))).toMap
    val (xe, xc) = got("x"); val (ye, yc) = got("y")
    xe shouldBe 4L; ye shouldBe 2L
    // either they collide (both cells = 6) or they don't (exact)
    if (xc != xe) { xc shouldBe 6L; yc shouldBe 6L }
    else { yc shouldBe 2L }
  }

  test("countMinAudit keeps only topN keys with a deterministic cut") {
    val df = (1 to 9).flatMap(i => Seq.fill(i)(s"k$i")).toDF("k")
    val got = Sketches.countMinAudit(df, "k", topN = 3).collect()
    got.map(_.getAs[String]("key")).sorted shouldBe Array("k7", "k8", "k9")
  }

  // -------------------------------------------- feature hashing

  test("hashedFeatures groups repeated tokens into one signed bucket") {
    val df = Seq((1L, "alpha alpha alpha")).toDF("id", "text")
    val got = Vectorize.hashedFeatures(df, "id", "text", 16).collect()
    got.length shouldBe 1
    got.head.getAs[Long]("n_tokens") shouldBe 3L
    math.abs(got.head.getAs[Long]("weight")) shouldBe 3L
  }

  test("hashedFeatures weight is bounded by the bucket token count") {
    val df = Seq((1L, "a b c d e f g h i j k l m n o p q r s t"))
      .toDF("id", "text")
    val got = Vectorize.hashedFeatures(df, "id", "text", 4).collect()
    got.map(_.getAs[Long]("n_tokens")).sum shouldBe 20L
    got.foreach { r =>
      math.abs(r.getAs[Long]("weight")) should be <= r.getAs[Long]("n_tokens")
      // weight and count have the same parity (sum of +/-1 terms)
      ((r.getAs[Long]("weight") - r.getAs[Long]("n_tokens")) % 2) shouldBe 0L
    }
  }

  // -------------------------------------------- RRF fusion

  test("rrfFuse sums reciprocal ranks with 0 for a missing side") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id_a", "r_a")
    val b = Seq((20L, 1), (30L, 2)).toDF("id_b", "r_b")
    val got = Retrieval.rrfFuse(a, "id_a", "r_a", b, "id_b", "r_b")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("rrf_score")).toMap
    got(10L) shouldBe (1.0 / 61 + 0.0)
    got(20L) shouldBe (1.0 / 62 + 1.0 / 61)
    got(30L) shouldBe (0.0 + 1.0 / 62)
  }

  test("rrfFuse ranks the both-lists id first and ties break by id") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 1)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(a, "id", "rank", b, "id", "rank")
      .orderBy("fused_rank").collect()
    got.head.getAs[Long]("id") shouldBe 20L // on both lists
    got.map(_.getAs[Int]("fused_rank")).toSeq shouldBe Seq(1, 2, 3)
  }
}
