package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Embedding-space decontamination: corpus docs cosine-near an eval-set
  * item are flagged with their closest match — the leakage path n-gram
  * decontamination cannot see. */
class SemanticDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def emb(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("flags exactly the corpus docs within threshold; closest eval wins") {
    val corpus = Seq(
      (100L, emb(1.0, 0.0, 0.0)),   // identical to eval 1
      (101L, emb(0.9, 0.1, 0.0)),   // near eval 1
      (102L, emb(0.0, 0.0, 1.0)),   // orthogonal to both evals
      (103L, emb(0.6, 0.8, 0.0))    // nearer eval 2 than eval 1
    ).toDF("vec_id", "embedding")
    val evalSet = Seq(
      (1L, emb(1.0, 0.0, 0.0)),
      (2L, emb(0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(
      corpus, "vec_id", "embedding", evalSet, "vec_id", "embedding",
      threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    out.keySet shouldBe Set(100L, 101L, 103L) // 102 is clean
    out(100L) shouldBe 1L
    out(101L) shouldBe 1L
    out(103L) shouldBe 2L // cos vs eval2 = 0.8 > cos vs eval1 = 0.6
  }

  test("equal-cosine ties break to the lower eval_id; one row per doc") {
    val corpus = Seq((7L, emb(1.0, 1.0))).toDF("vec_id", "embedding")
    val evalSet = Seq(
      (5L, emb(2.0, 2.0)), // both evals are exactly cosine 1.0
      (3L, emb(3.0, 3.0))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.semanticDecontaminate(
      corpus, "vec_id", "embedding", evalSet, "vec_id", "embedding",
      threshold = 0.99).collect()
    rows.length shouldBe 1
    rows.head.getLong(1) shouldBe 3L
  }

  test("candidates path scores ONLY the given pairs") {
    val corpus = Seq(
      (100L, emb(1.0, 0.0)), (101L, emb(1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val evalSet = Seq((1L, emb(1.0, 0.0))).toDF("vec_id", "embedding")
    // only (101, 1) is a candidate — 100 must NOT be flagged even
    // though its cosine is 1.0
    val cand = Seq((101L, 1L)).toDF("corpus_id", "eval_id")
    val out = Similarity.semanticDecontaminate(
      corpus, "vec_id", "embedding", evalSet, "vec_id", "embedding",
      threshold = 0.5, candidates = Some(cand))
      .collect().map(_.getLong(0)).toSeq
    out shouldBe Seq(101L)
  }

  test("agrees with Corpus-level expectation on real embeddings (anti-join shape)") {
    val all = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = all.filter(col("vec_id") >= 20)
    val evalSet = all.filter(col("vec_id") < 20)
    val flagged = Similarity.semanticDecontaminate(
      corpus, "vec_id", "embedding", evalSet, "vec_id", "embedding",
      threshold = 0.4)
    // one row per flagged doc, and every flagged cosine clears the bar
    val rows = flagged.collect()
    rows.map(_.getLong(0)).distinct.length shouldBe rows.length
    rows.foreach(_.getDouble(2) should be >= 0.4)
    // the flagged set equals the brute-force predicate evaluated via
    // cosineNearDupPairs-style scoring
    val brute = corpus.crossJoin(
        evalSet.select(col("vec_id").as("e_id"), col("embedding").as("ee")))
      .withColumn("cos",
        call_function("vec_cosine", col("embedding"), col("ee")))
      .filter(col("cos") >= 0.4)
      .select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    rows.map(_.getLong(0)).toSet shouldBe brute
  }
}
