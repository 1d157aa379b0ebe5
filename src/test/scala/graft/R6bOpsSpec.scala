package graft

import org.apache.spark.sql.functions._

import graft.operators.{Linkage, NearDup, Skyline}

class R6bOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------- winnow span reuse

  private val span =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("winnowReusePairs finds a shared span between otherwise-different docs") {
    val docs = Seq(
      (1L, s"intro one two three $span closing words here"),
      (2L, s"completely different lead in text $span and another tail"),
      (3L, "unrelated content about something else entirely with many " +
        "extra words that share nothing of the span at all ok")
    ).toDF("doc_id", "text")
    val got = NearDup.winnowReusePairs(docs, "doc_id", "text",
        k = 3, w = 4, maxDf = 16, minShared = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L))
  }

  test("winnowReusePairs df cap drops boilerplate fingerprints") {
    // the same span in ALL docs -> every fingerprint's df exceeds the cap
    val docs = (1L to 5L).map(i => (i, s"doc $i says $span end"))
      .toDF("doc_id", "text")
    NearDup.winnowReusePairs(docs, "doc_id", "text",
      k = 3, w = 4, maxDf = 4, minShared = 1).count() shouldBe 0L
  }

  test("reuse score is shared over the smaller fingerprint set") {
    val docs = Seq(
      (1L, span),                              // the span only
      (2L, s"$span extra trailing words continue for a while longer here")
    ).toDF("doc_id", "text")
    val row = NearDup.winnowReusePairs(docs, "doc_id", "text",
      k = 3, w = 4, maxDf = 16, minShared = 1).collect().head
    val (shared, na, nb, reuse) = (row.getAs[Long]("shared"),
      row.getAs[Long]("n_a"), row.getAs[Long]("n_b"),
      row.getAs[Double]("reuse"))
    shared should be <= math.min(na, nb)
    reuse shouldBe (shared.toDouble / math.min(na, nb).toDouble)
  }

  // -------------------------------------------------- Fellegi-Sunter

  test("fellegiSunterWeights computes smoothed m/u and the weight ratio") {
    // 4 matches (field agrees 3/4), 6 unmatches (agrees 1/6)
    val pairs = (Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq((false, true)) ++ Seq.fill(5)((false, false)))
      .toDF("is_match", "f1")
    val row = Linkage.fellegiSunterWeights(pairs, "is_match", Seq("f1"))
      .collect().head
    row.getAs[Long]("m_agree") shouldBe 3L
    row.getAs[Long]("n_match") shouldBe 4L
    row.getAs[Long]("u_agree") shouldBe 1L
    row.getAs[Long]("n_unmatch") shouldBe 6L
    row.getAs[Double]("m_prob") shouldBe (4.0 / 6.0)
    row.getAs[Double]("u_prob") shouldBe (2.0 / 8.0)
    row.getAs[Double]("weight_ratio") shouldBe ((4.0 * 8.0) / (6.0 * 2.0))
  }

  test("null agreement counts as disagreement") {
    val pairs = Seq((true, Some(true)), (true, None),
        (false, Some(false))).toDF("is_match", "f1")
    val row = Linkage.fellegiSunterWeights(pairs, "is_match", Seq("f1"))
      .collect().head
    row.getAs[Long]("m_agree") shouldBe 1L
    row.getAs[Long]("n_match") shouldBe 2L
  }

  test("one output row per field") {
    val pairs = Seq((true, true, false), (false, false, true))
      .toDF("is_match", "a", "b")
    Linkage.fellegiSunterWeights(pairs, "is_match", Seq("a", "b"))
      .select("field").as[String].collect().toSet shouldBe Set("a", "b")
  }

  // -------------------------------------------------- Pareto frontier

  private def frontier(pts: Seq[(Long, Long, Long)], buckets: Int = 8) =
    Skyline.paretoFrontier2D(pts.toDF("id", "x", "y"), col("x"), col("y"),
      buckets).select("id").as[Long].collect().toSet

  test("skyline keeps exactly the non-dominated points") {
    // (5,1) (3,3) (1,5) frontier; (2,2) dominated by (3,3); (3,1) by (5,1)
    frontier(Seq((1L, 5L, 1L), (2L, 3L, 3L), (3L, 1L, 5L),
      (4L, 2L, 2L), (5L, 3L, 1L))) shouldBe Set(1L, 2L, 3L)
  }

  test("ties on both dimensions survive together; single-dim ties resolve strictly") {
    // two identical maxima both stay; (4,2) vs (4,3): equal x, higher y wins
    frontier(Seq((1L, 4L, 3L), (2L, 4L, 3L), (3L, 4L, 2L),
      (6L, 9L, 1L))) shouldBe Set(1L, 2L, 6L)
  }

  test("matches the brute-force skyline on a random point set") {
    val rnd = new scala.util.Random(11)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.map(_._1).toSet
    frontier(pts, buckets = 4) shouldBe brute
    frontier(pts, buckets = 1024) shouldBe brute
  }

  test("all-equal x degenerates to the max-y row set") {
    frontier(Seq((1L, 7L, 2L), (2L, 7L, 9L), (3L, 7L, 9L))) shouldBe
      Set(2L, 3L)
  }
}
