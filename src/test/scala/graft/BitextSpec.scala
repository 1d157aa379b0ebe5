package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class BitextSpec extends SparkSpec {
  import spark.implicits._

  // 2-d vectors: angles chosen so a1<->b1 and a2<->b2 are mutual best
  // matches; b3 sits close to b1 making a1's competition tight
  private def vec(deg: Double) = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }
  private val emb = Seq(
    (0L, vec(0)),    // A: a1
    (2L, vec(90)),   // A: a2
    (1L, vec(5)),    // B: b1 — best for a1
    (3L, vec(85)),   // B: b2 — best for a2
    (5L, vec(40))    // B: b3 — runner-up for both A rows
  ).toDF("vec_id", "embedding")

  private def mine(minMargin: Double) =
    Similarity.marginBitextMine(emb, "vec_id", "embedding",
      col("vec_id") % 2 === 0, col("vec_id") % 2 === 1, minMargin)

  test("mutual-best pairs with margin over runner-up competition") {
    val got = mine(1.0).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("margin")).toMap
    got.keySet shouldBe Set((0L, 1L), (2L, 3L))
    // cos(a1,b1)=cos5° ≈ .996; runner-ups cos(a1,b3)=cos40°, cos(b1,a2)=cos85°
    val expected = math.cos(math.toRadians(5)) /
      ((math.cos(math.toRadians(40)) + math.cos(math.toRadians(85))) / 2)
    got((0L, 1L)) shouldBe expected +- 1e-3
  }

  test("raising minMargin drops the tighter pair first") {
    // a2/b2's margin is higher (its runner-ups are weaker); a threshold
    // between the two margins keeps only it
    val margins = mine(1.0).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Double]("margin"))).toMap
    val cut = (margins(0L) + margins(2L)) / 2
    mine(cut).select("a_id").as[Long].collect().toSeq shouldBe
      Seq(if (margins(0L) > margins(2L)) 0L else 2L)
  }

  test("singleton competition (no runner-up) yields no mined pair") {
    val tiny = Seq((0L, vec(0)), (1L, vec(5))).toDF("vec_id", "embedding")
    Similarity.marginBitextMine(tiny, "vec_id", "embedding",
      col("vec_id") === 0, col("vec_id") === 1, 0.0).count() shouldBe 0L
  }

  test("negative runner-up mean never passes via an inverted ratio") {
    // a at 0°; b1 at 60° (best, cos=.5 > 0); b2/b3 at ~180° so the
    // runner-up mean is NEGATIVE. cosine/negative-denominator would be
    // negative here — fine — but mirror-image geometries flip BOTH signs
    // and sail over minMargin; the operator must drop non-positive
    // denominators outright.
    val neg = Seq(
      (0L, vec(0)),   // A
      (1L, vec(60)),  // B: best for a (cos 60° = .5)
      (3L, vec(175)), // B: runner-up, cos < 0
      (5L, vec(185))  // B: cos < 0
    ).toDF("vec_id", "embedding")
    Similarity.marginBitextMine(neg, "vec_id", "embedding",
      col("vec_id") % 2 === 0, col("vec_id") % 2 === 1, 0.0)
      .count() shouldBe 0L
    // the fully mirrored case: best pair ALSO negative, runner-ups more
    // negative — old math gave a large POSITIVE margin
    val mirror = Seq(
      (0L, vec(0)),
      (1L, vec(170)), // best for a, cos ≈ -.98
      (3L, vec(180)), // runner-up cos = -1
      (5L, vec(179))
    ).toDF("vec_id", "embedding")
    Similarity.marginBitextMine(mirror, "vec_id", "embedding",
      col("vec_id") % 2 === 0, col("vec_id") % 2 === 1, 1.0)
      .count() shouldBe 0L
  }

  test("candidates restrict scoring and localize the ranking") {
    val cands = Seq((0L, 1L), (0L, 5L), (2L, 3L), (2L, 5L))
      .toDF("a_id", "b_id")
    val got = Similarity.marginBitextMine(emb, "vec_id", "embedding",
      col("vec_id") % 2 === 0, col("vec_id") % 2 === 1, 1.0,
      candidates = Some(cands)).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    got shouldBe Set((0L, 1L), (2L, 3L))
  }
}
