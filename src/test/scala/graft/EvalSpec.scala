package graft

import org.apache.spark.sql.functions._

import graft.operators.Eval

/** Evaluation operators: ranking metrics, Cohen's kappa, nearest-centroid
  * classifier eval. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // Embeddings along two orthogonal-ish directions so cosine order is
  // hand-computable: label 0 vectors point at (1,0), label 1 at (0,1);
  // v3 is a label-0 vector that leans towards label 1.
  private def embFixture = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.8f, 0.2f), 0),
    (3L, Array(0.1f, 0.9f), 0), // mislabeled: points with label-1 cluster
    (4L, Array(0.0f, 1.0f), 1),
    (5L, Array(0.1f, 1.0f), 1),
    (6L, Array(0.2f, 0.9f), 1))
    .toDF("vec_id", "embedding", "label")

  // ---- rankingMetrics -----------------------------------------------------

  test("rankingMetrics ranks by cosine and scores relevance per query") {
    val out = Eval.rankingMetrics(embFixture, "vec_id", "embedding", "label",
      col("id") === 0, k = 3, qScale = 1024)
      .collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("q_id") shouldBe 0L
    // corpus minus self: 1,2 (label 0, near) then 6,5,3,4 by cosine to
    // (1,0); top-3 = ids 1,2,6 with rel = 1,1,0
    r.getAs[Long]("n_rel") shouldBe 3L // three other label-0 vectors
    r.getAs[Int]("hit1") shouldBe 1
    r.getAs[Long]("hits_k") shouldBe 2L
    r.getAs[Int]("first_rel_rank") shouldBe 1
    r.getAs[Double]("rr") shouldBe 1.0
    val d = Eval.discountTable(3)
    r.getAs[Long]("dcg") shouldBe d(0) + d(1)
    r.getAs[Double]("ndcg") shouldBe
      (d(0) + d(1)).toDouble / (d(0) + d(1) + d(2)).toDouble
  }

  test("rankingMetrics: no relevant in top-k gives rr 0 and ndcg 0") {
    // query is the mislabeled vector 3: nearest are the label-1 cluster
    val out = Eval.rankingMetrics(embFixture, "vec_id", "embedding", "label",
      col("id") === 3, k = 3, qScale = 1024).collect().head
    out.getAs[Long]("hits_k") shouldBe 0L
    out.getAs[Double]("rr") shouldBe 0.0
    out.getAs[Long]("dcg") shouldBe 0L
    out.getAs[Double]("ndcg") shouldBe 0.0
    assert(out.isNullAt(out.fieldIndex("first_rel_rank")))
  }

  test("rankingMetrics enforces the query-side broadcast cap") {
    val s = spark
    val key = graft.operators.Similarity.MaxBroadcastRowsKey
    val prev = s.conf.getOption(key)
    s.conf.set(key, "2")
    try {
      val e = intercept[IllegalArgumentException] {
        Eval.rankingMetrics(embFixture, "vec_id", "embedding", "label",
          lit(true), k = 3).collect()
      }
      e.getMessage should include("rankingMetrics query side")
    } finally {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  test("discountTable rank-1 discount is exactly 2^30") {
    Eval.discountTable(2)(0) shouldBe (1L << 30)
  }

  // ---- cohenKappa ---------------------------------------------------------

  test("cohenKappa matches the closed form on a textbook confusion") {
    // classic 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10 (N=50)
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val out = Eval.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()
    out.length shouldBe 4
    val r = out.head
    val po = 35.0 / 50.0
    // marginals: A yes 25, A no 25; B yes 30, B no 20
    val pe = (25.0 * 30 + 25.0 * 20) / (50.0 * 50.0)
    r.getAs[Double]("observed_agreement") shouldBe po +- 1e-12
    r.getAs[Double]("expected_agreement") shouldBe pe +- 1e-12
    r.getAs[Double]("kappa") shouldBe ((po - pe) / (1 - pe)) +- 1e-12
    val cells = out.map(x => (x.getAs[String]("rating_a"),
      x.getAs[String]("rating_b")) -> x.getAs[Long]("n")).toMap
    cells(("yes", "yes")) shouldBe 20L
    cells(("no", "yes")) shouldBe 10L
  }

  test("cohenKappa excludes NULL ratings and handles constant raters") {
    val df = Seq(
      (Some("x"), Some("x")), (Some("x"), Some("x")),
      (None, Some("x")), (Some("x"), None))
      .toDF("a", "b")
    val out = Eval.cohenKappa(df, col("a"), col("b")).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("n") shouldBe 2L
    // both raters constant -> pe = 1 -> kappa undefined
    assert(out.head.isNullAt(out.head.fieldIndex("kappa")))
    out.head.getAs[Double]("observed_agreement") shouldBe 1.0
  }

  // ---- nearestCentroidEval ------------------------------------------------

  test("nearestCentroidEval scores the mislabeled vector as fn/fp") {
    val out = Eval.nearestCentroidEval(embFixture, "vec_id", "embedding",
      "label").collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    // vector 3 (truth 0) classifies to the label-1 centroid
    val c0 = out(0)
    c0.getAs[Long]("support") shouldBe 4L
    c0.getAs[Long]("tp") shouldBe 3L
    c0.getAs[Long]("fn") shouldBe 1L
    c0.getAs[Long]("fp") shouldBe 0L
    c0.getAs[Double]("precision") shouldBe 1.0
    c0.getAs[Double]("recall") shouldBe 0.75
    c0.getAs[Double]("f1") shouldBe (6.0 / 7.0) +- 1e-12
    val c1 = out(1)
    c1.getAs[Long]("tp") shouldBe 3L
    c1.getAs[Long]("fp") shouldBe 1L
    c1.getAs[Long]("fn") shouldBe 0L
    c1.getAs[Double]("recall") shouldBe 1.0
  }

  test("nearestCentroidEval drops zero vectors and keeps perfect classes") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.0f, 0.9f), 1),
      (4L, Array(0.0f, 0.0f), 1)) // zero vector: no cosine, excluded
      .toDF("vec_id", "embedding", "label")
    val out = Eval.nearestCentroidEval(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    out(0).getAs[Double]("f1") shouldBe 1.0
    out(1).getAs[Long]("support") shouldBe 2L // zero vector not scored
    out(1).getAs[Double]("f1") shouldBe 1.0
  }
}
