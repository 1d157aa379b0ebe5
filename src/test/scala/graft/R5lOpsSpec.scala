package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Quality, Similarity}

/** Round-5 wave-12 operators: CUPED adjustment, PSI drift, embedding
  * outliers. */
class R5lOpsSpec extends SparkSpec {
  import spark.implicits._

  private val D2 = DecimalType(18, 2)

  // ---- cupedAdjust --------------------------------------------------------

  test("cupedAdjust matches the closed-form theta and adjusted means") {
    // units: (variant, y, x); pooled theta = cov(x,y)/var(x)
    val units = Seq(
      ("A", 10.0, 1.0), ("A", 20.0, 3.0),
      ("B", 30.0, 5.0), ("B", 40.0, 7.0))
      .toDF("variant", "yd", "xd")
      .select(col("variant"), col("yd").cast(D2).as("y"),
        col("xd").cast(D2).as("x"))
    val out = Quality.cupedAdjust(units, "variant", col("y"), col("x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // x: 1,3,5,7 mean 4; y: 10,20,30,40 mean 25
    // cov = ((-3)(-15)+(-1)(-5)+(1)(5)+(3)(15))/4 = 100/4 = 25
    // var = (9+1+1+9)/4 = 5 -> theta = 5
    val (nA, meanYA, meanXA, thetaA, adjA) = out("A")
    nA shouldBe 2L
    meanYA shouldBe 15.0
    meanXA shouldBe 2.0
    thetaA shouldBe 5.0 +- 1e-12
    adjA shouldBe (15.0 - 5.0 * (2.0 - 4.0)) +- 1e-9 // 25
    val (_, meanYB, _, _, adjB) = out("B")
    meanYB shouldBe 35.0
    adjB shouldBe (35.0 - 5.0 * (6.0 - 4.0)) +- 1e-9 // 25
  }

  test("cupedAdjust: zero covariate variance leaves means unadjusted") {
    val units = Seq(("A", 10.0, 2.0), ("A", 20.0, 2.0), ("B", 30.0, 2.0))
      .toDF("variant", "yd", "xd")
      .select(col("variant"), col("yd").cast(D2).as("y"),
        col("xd").cast(D2).as("x"))
    val out = Quality.cupedAdjust(units, "variant", col("y"), col("x"))
      .collect().map(r => r.getString(0) -> ((r.isNullAt(4), r.getDouble(5))))
      .toMap
    out("A") shouldBe ((true, 15.0))
    out("B") shouldBe ((true, 30.0))
  }

  // ---- psiDrift -----------------------------------------------------------

  test("psiDrift: a source matching the pooled distribution scores ~0") {
    // two identically distributed sources -> pooled == each source
    val rows = (0 until 100).flatMap(i =>
      Seq(("a", (i % 10).toLong), ("b", (i % 10).toLong)))
      .toDF("source", "v")
    val out = Quality.psiDrift(rows, "source", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("a") shouldBe 0.0 +- 1e-6
    out("b") shouldBe 0.0 +- 1e-6
  }

  test("psiDrift: a shifted source scores clearly above the 0.2 alert") {
    // source b concentrated in the top bucket vs a uniform majority
    val rows = ((0 until 900).map(i => ("a", (i % 10).toLong)) ++
      (0 until 100).map(_ => ("b", 9L))).toDF("source", "v")
    val out = Quality.psiDrift(rows, "source", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("b") should be > 0.2
    out("a") should be < out("b")
  }

  test("psiDrift: constant values degrade to one bucket without error") {
    val rows = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("source", "v")
    val out = Quality.psiDrift(rows, "source", col("v")).collect()
    out.length shouldBe 2
    // all mass in bucket 0 for every source; add-one smoothing over the
    // 9 empty buckets is loud at N=2..3 but must stay bounded and finite
    all(out.map(_.getDouble(2)).toSeq) should be < 0.2
  }

  // ---- embeddingOutliers --------------------------------------------------

  test("embeddingOutliers flags the vector pointing away from its centroid") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 1), (2L, Seq(1.0f, 0.1f), 1),
      (3L, Seq(0.9f, 0.0f), 1),
      (4L, Seq(-1.0f, 0.0f), 1), // opposite direction: the outlier
      (5L, Seq(0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(rows, "vec_id", "embedding",
      "label").collect()
      .map(r => r.getLong(0) -> ((r.get(3), r.getBoolean(4)))).toMap
    out(4L)._2 shouldBe true
    out(1L)._2 shouldBe false
    out(2L)._2 shouldBe false
    out(5L)._2 shouldBe false // singleton label: cos 1 with itself
    out(5L)._1.asInstanceOf[Double] shouldBe 1.0 +- 1e-9
  }

  test("embeddingOutliers: zero vector gets NULL cosine and the flag") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(0.0f, 0.0f), 2)) // zero vector alone in its label
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(rows, "vec_id", "embedding",
      "label").collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(3), r.getBoolean(4)))).toMap
    out(2L) shouldBe ((true, true))
    out(1L) shouldBe ((false, false))
  }
}
