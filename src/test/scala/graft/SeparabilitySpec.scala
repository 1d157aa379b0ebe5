package graft

import graft.operators.Eval

class SeparabilitySpec extends SparkSpec {
  import spark.implicits._

  test("separable labels concentrate same-label mass in high bins") {
    // label 0 along +x, label 1 along +y: same-label cos ~1, cross ~0
    val vecs = (1 to 40).map { i =>
      val lab = i % 2
      val e = if (lab == 0) Array(1.0f, 0.001f * i, 0f, 0f)
      else Array(0.001f * i, 1.0f, 0f, 0f)
      (i.toLong, e, lab)
    }.toDF("vec_id", "embedding", "label")
    val got = Eval.labelSeparability(vecs, "vec_id", "embedding", "label",
      numPlanes = 4, dim = 4).collect()
      .map(r => (r.getBoolean(0), r.getAs[Int]("cos_bin")) ->
        r.getAs[Long]("n_pairs")).toMap
    val sameHigh = got.collect {
      case ((true, b), n) if b >= 8 => n }.sum
    val sameLow = got.collect {
      case ((true, b), n) if b < 8 => n }.sum
    sameHigh should be > sameLow
    // cross-label pairs that survive bucketing sit near cos 0
    got.keys.filter(!_._1).foreach(_._2 should be < 8)
  }

  test("bin edges clamp cos == 1 into the top bin") {
    val vecs = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Eval.labelSeparability(vecs, "vec_id", "embedding", "label",
      numPlanes = 2, dim = 2).collect()
    got.foreach(_.getAs[Int]("cos_bin") shouldBe 9)
  }
}
