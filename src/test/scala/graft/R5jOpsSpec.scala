package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Scale}

/** Round-5 wave-10 operators: global row numbering, quantile
  * normalization, weighted sampling. */
class R5jOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- globalRowNumber ----------------------------------------------------

  test("globalRowNumber equals the naive global window") {
    val df = Seq((1L, 5.0), (2L, 3.0), (3L, 5.0), (4L, 1.0), (5L, 4.0),
      (6L, 3.0), (7L, 9.0)).toDF("id", "v")
    val naive = df.withColumn("rn", row_number().over(
      Window.orderBy(col("v").asc, col("id").asc)))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    for (buckets <- Seq(1, 2, 3, 4096)) {
      val fast = Scale.globalRowNumber(df, "v", "id", buckets,
        smallInputMaxRows = 0L)
        .select("id", "global_rn").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      withClue(s"buckets=$buckets: ") { fast shouldBe naive }
    }
  }

  test("globalRowNumber: constant values degrade to one bucket, stay 1..N") {
    val df = Seq.tabulate(10)(i => (i.toLong, 7.0)).toDF("id", "v")
    val out = Scale.globalRowNumber(df, "v", "id", smallInputMaxRows = 0L)
      .orderBy("id").collect().map(_.getLong(2))
    out shouldBe (1L to 10L).toArray
  }

  test("globalRowNumber: small-input dispatch path matches telescoped") {
    val df = Seq((1L, 5.0), (2L, 3.0), (3L, 5.0), (4L, 1.0)).toDF("id", "v")
    val small = Scale.globalRowNumber(df, "v", "id")
      .select("id", "global_rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val tele = Scale.globalRowNumber(df, "v", "id", smallInputMaxRows = 0L)
      .select("id", "global_rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    small shouldBe tele
  }

  // ---- quantileNormalizeScores --------------------------------------------

  test("quantileNormalizeScores maps source ranks onto pooled values") {
    // pooled sorted scores: 1,2,3,10,20,30 (N=6)
    // source a (1,2,3): ranks 1..3 -> idx 1+((r-1)*5)//2 = 1, 3, 6
    //   -> normalized 1, 3, 30
    // source b (10,20,30): same idx mapping -> 1, 3, 30
    val docs = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "b", 10L), (5L, "b", 20L), (6L, "b", 30L))
      .toDF("doc_id", "source", "score")
    val out = Corpus.quantileNormalizeScores(docs, "doc_id", "source",
      col("score"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    out shouldBe Array((1L, 1L), (2L, 3L), (3L, 30L),
      (4L, 1L), (5L, 3L), (6L, 30L))
  }

  test("quantileNormalizeScores: equal-size sources get identical " +
    "normalized distributions") {
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i <= 20) "hot" else "cold",
        if (i <= 20) 1000L + i else i.toLong))
      .toDF("doc_id", "source", "score")
    val out = Corpus.quantileNormalizeScores(docs, "doc_id", "source",
      col("score"))
    val bySource = out.collect()
      .groupBy(_.getString(1))
      .map { case (s, rows) => s -> rows.map(_.getLong(3)).sorted.toSeq }
    bySource("hot") shouldBe bySource("cold")
  }

  test("quantileNormalizeScores: a singleton source maps to the pooled " +
    "median") {
    val docs = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "a", 4L), (5L, "solo", 99L))
      .toDF("doc_id", "source", "score")
    // N=5 -> idx = 1 + 4//2 = 3 -> pooled value at rank 3 = 3
    val solo = Corpus.quantileNormalizeScores(docs, "doc_id", "source",
      col("score"))
      .filter(col("source") === "solo").collect()(0)
    solo.getLong(3) shouldBe 3L
  }

  // ---- weightedSampleK ----------------------------------------------------

  private val sampleDocs = (1 to 30).map(i =>
    (i.toLong, if (i % 2 == 0) "even" else "odd", (i % 7 + 1).toLong))
    .toDF("doc_id", "source", "w")

  test("weightedSampleK keeps exactly k per group, deterministically") {
    val a = Corpus.weightedSampleK(sampleDocs, "doc_id", "source",
      col("w"), 5, "s").collect()
    val b = Corpus.weightedSampleK(sampleDocs, "doc_id", "source",
      col("w"), 5, "s").collect()
    a.groupBy(_.getString(1)).view.mapValues(_.length).toMap shouldBe
      Map("even" -> 5, "odd" -> 5)
    a.map(_.getLong(0)).sorted shouldBe b.map(_.getLong(0)).sorted
  }

  test("weightedSampleK: growing k extends the kept prefix") {
    val k3 = Corpus.weightedSampleK(sampleDocs, "doc_id", "source",
      col("w"), 3, "s").collect().map(_.getLong(0)).toSet
    val k6 = Corpus.weightedSampleK(sampleDocs, "doc_id", "source",
      col("w"), 6, "s").collect().map(_.getLong(0)).toSet
    k3.subsetOf(k6) shouldBe true
  }

  test("weightedSampleK drops non-positive weights") {
    val docs = Seq((1L, "g", 5L), (2L, "g", 0L), (3L, "g", -1L))
      .toDF("doc_id", "source", "w")
    Corpus.weightedSampleK(docs, "doc_id", "source", col("w"), 10, "s")
      .collect().map(_.getLong(0)) shouldBe Array(1L)
  }

  test("weightedSampleK: different seeds give different samples") {
    val s1 = Corpus.weightedSampleK(sampleDocs, "doc_id", "source",
      col("w"), 5, "seed1").collect().map(_.getLong(0)).toSet
    val s2 = Corpus.weightedSampleK(sampleDocs, "doc_id", "source",
      col("w"), 5, "seed2").collect().map(_.getLong(0)).toSet
    s1 should not be s2
  }
}
