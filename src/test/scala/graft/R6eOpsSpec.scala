package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Quality, Similarity}

class R6eOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- curriculum order

  test("curriculumOrder bands by global score rank and cycles bands") {
    val docs = (1L to 40L).map(i => (i, i * 10)).toDF("id", "difficulty")
    val got = Corpus.curriculumOrder(docs, "id", col("difficulty"),
        nBands = 4)
      .orderBy("curriculum_pos").collect()
    // positions are 1..40 exactly once
    got.map(_.getAs[Long]("curriculum_pos")).toSeq shouldBe (1L to 40L)
    // bands are equal deciles of the score order: ids 1-10 -> band 0, etc.
    got.foreach { r =>
      r.getAs[Int]("band") shouldBe ((r.getAs[Long]("id") - 1) / 10).toInt
    }
    // the stream cycles bands: each round of 4 holds one doc per band
    got.grouped(4).foreach { slice =>
      slice.map(_.getAs[Int]("band")).toSet shouldBe Set(0, 1, 2, 3)
    }
  }

  test("curriculum round order within a band is the md5 hash order") {
    val docs = (1L to 12L).map(i => (i, 1L)).toDF("id", "s") // all tied
    val got = Corpus.curriculumOrder(docs, "id", col("s"), nBands = 3)
      .collect()
    val byBand = got.groupBy(_.getAs[Int]("band"))
    byBand.values.foreach { rows =>
      val inRoundOrder = rows.sortBy(_.getAs[Long]("round"))
        .map(_.getAs[Long]("id"))
      val inHashOrder = rows.map(_.getAs[Long]("id"))
        .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes).map(b => f"$b%02x").mkString, id))
      inRoundOrder.toSeq shouldBe inHashOrder.toSeq
    }
  }

  // -------------------------------------------- cluster representatives

  test("clusterRepresentatives picks the k most-central members per cell") {
    // two orthogonal clusters; centroids = two axis vectors
    val embs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.8f, 0.3f)),
      (4L, Seq(0f, 1f)), (5L, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((100L, Seq(1f, 0f)), (200L, Seq(0f, 1f)))
      .toDF("centroid_id", "centroid_emb")
    val got = Similarity.clusterRepresentatives(embs, "vec_id",
        "embedding", cents, k = 2)
      .select("centroid_id", "rep_rank", "vec_id", "n_members")
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1)
    got(100L).map(_._4).toSet shouldBe Set(3L) // cell population
    got(100L).sortBy(_._2).map(_._3).toSeq shouldBe Seq(1L, 2L)
    got(200L).sortBy(_._2).map(_._3).toSeq shouldBe Seq(4L, 5L)
  }

  // -------------------------------------------- bootstrap CI

  private val armed = (1L to 400L).map { i =>
    val arm = if (i % 2 == 0) "A" else "B"
    val v = BigDecimal(if (arm == "A") 100 + (i % 7) else 200 + (i % 7))
    (i, arm, v)
  }.toDF("id", "arm", "v")
    .withColumn("v", col("v").cast("decimal(18,2)"))

  test("bootstrapCi brackets the group mean and keeps ci_lo <= ci_hi") {
    val got = Quality.bootstrapCi(armed, col("arm"), col("id"), col("v"),
        reps = 50)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    got.keySet shouldBe Set("A", "B")
    got.values.foreach { r =>
      val (m, lo, hi) = (r.getAs[Double]("mean"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      lo should be <= hi
      // the CI of a mean over a tight value range must bracket it
      lo should be <= m + 1.0
      hi should be >= m - 1.0
      r.getAs[Long]("n_reps") shouldBe 50L
    }
    got("B").getAs[Double]("mean") should be >
      got("A").getAs[Double]("mean")
  }

  test("bootstrapCi is deterministic across runs and repartitionings") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Quality.bootstrapCi(df, col("arm"), col("id"), col("v"), reps = 20)
        .collect().map(r => (r.getAs[String]("grp"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))).toSet
    run(armed) shouldBe run(armed.repartition(13))
  }

  test("a different seed draws different replicate weights") {
    val a = Quality.bootstrapCi(armed, col("arm"), col("id"), col("v"),
      reps = 20, seed = "s1").collect().map(_.getAs[Double]("ci_lo")).toSet
    val b = Quality.bootstrapCi(armed, col("arm"), col("id"), col("v"),
      reps = 20, seed = "s2").collect().map(_.getAs[Double]("ci_lo")).toSet
    a should not be b
  }
}
