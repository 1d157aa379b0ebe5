package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Eval, Similarity}

class R6cOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- quantized covariance

  test("quantizedCovariance matches the closed form on a 2-D fixture") {
    // q-vectors (scale 1): (1,2), (3,4), (5,0)
    val embs = Seq(
      (1L, Seq(1f, 2f)), (2L, Seq(3f, 4f)), (3L, Seq(5f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizedCovariance(embs, "vec_id", "embedding",
        qScale = 1)
      .select("i", "j", "n", "s_i", "s_j", "s_ij", "cov")
      .as[(Int, Int, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    got((0, 0))._7 shouldBe ((3.0 * 35 - 9.0 * 9) / 9.0)   // var(x)
    got((1, 1))._7 shouldBe ((3.0 * 20 - 6.0 * 6) / 9.0)   // var(y)
    got((0, 1))._7 shouldBe ((3.0 * 14 - 9.0 * 6) / 9.0)   // cov(x,y)
    got.keySet shouldBe Set((0, 0), (0, 1), (1, 1))        // upper triangle
  }

  test("quantizedCovariance quantizes by floor at the given scale") {
    val embs = Seq((1L, Seq(0.5f)), (2L, Seq(-0.5f))).toDF("id", "emb")
    // floor(0.5*2)=1, floor(-0.5*2)=-1 -> mean 0, var (2*2-0)/4 = 1
    val row = Similarity.quantizedCovariance(embs, "id", "emb", qScale = 2)
      .collect().head
    row.getAs[Long]("s_ij") shouldBe 2L
    row.getAs[Double]("cov") shouldBe 1.0
  }

  // -------------------------------------------- incremental components

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long)].collect().toMap

  test("incremental merge equals from-scratch recompute") {
    val verts = (1L to 8L).toDF("id")
    val oldE = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val newE = Seq((2L, 3L), (6L, 7L), (7L, 8L)).toDF("a", "b")
    val stored = Clusters.connectedComponents(verts, "id", oldE, "a", "b")
    val inc = labelsOf(Clusters.incrementalComponents(stored, "id",
      "cluster_id", newE, "a", "b"))
    val scratch = labelsOf(Clusters.connectedComponents(verts, "id",
      oldE.unionByName(newE), "a", "b"))
    inc shouldBe scratch
  }

  test("untouched components keep their labels; new vertices join in") {
    val verts = (1L to 4L).toDF("id")
    val oldE = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val stored = Clusters.connectedComponents(verts, "id", oldE, "a", "b")
    // edge to a vertex never seen before (9), touching only {3,4}
    val inc = labelsOf(Clusters.incrementalComponents(stored, "id",
      "cluster_id", Seq((4L, 9L)).toDF("a", "b"), "a", "b"))
    inc shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 9L -> 3L)
  }

  test("a new edge can bridge two old components transitively") {
    val verts = (1L to 6L).toDF("id")
    val oldE = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val stored = Clusters.connectedComponents(verts, "id", oldE, "a", "b")
    val inc = labelsOf(Clusters.incrementalComponents(stored, "id",
      "cluster_id", Seq((2L, 3L), (4L, 5L)).toDF("a", "b"), "a", "b"))
    inc.values.toSet shouldBe Set(1L)
  }

  test("empty new batch is the identity") {
    val verts = (1L to 3L).toDF("id")
    val oldE = Seq((1L, 2L)).toDF("a", "b")
    val stored = Clusters.connectedComponents(verts, "id", oldE, "a", "b")
    labelsOf(Clusters.incrementalComponents(stored, "id", "cluster_id",
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")) shouldBe
      labelsOf(stored)
  }

  // -------------------------------------------- uncertainty sampling

  test("uncertaintySample ranks the ambiguous vector first") {
    // two clean clusters on axes; vec 5 sits between them (ambiguous)
    val embs = Seq(
      (1L, Seq(1f, 0f, 0f), 0), (2L, Seq(1f, 0.1f, 0f), 0),
      (3L, Seq(0f, 1f, 0f), 1), (4L, Seq(0.1f, 1f, 0f), 1),
      (5L, Seq(1f, 1f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Eval.uncertaintySample(embs, "vec_id", "embedding", "label",
      k = 5).select("id").as[Long].collect()
    got.head shouldBe 5L
    got should have length 5
  }

  test("k bounds the sample and margin is top1 minus top2") {
    val embs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 1), (3L, Seq(1f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val rows = Eval.uncertaintySample(embs, "vec_id", "embedding", "label",
      k = 2).collect()
    rows.length shouldBe 2
    rows.foreach { r =>
      r.getAs[Double]("margin") shouldBe
        (r.getAs[Double]("cos1") - r.getAs[Double]("cos2"))
      r.getAs[Double]("cos1") should be >= r.getAs[Double]("cos2")
    }
  }

  test("vectors with a null label or embedding are excluded") {
    val embs = Seq(
      (1L, Some(Seq(1f, 0f)), Some(0)), (2L, Some(Seq(0f, 1f)), Some(1)),
      (3L, None, Some(0)), (4L, Some(Seq(1f, 1f)), None)
    ).toDF("vec_id", "embedding", "label")
    Eval.uncertaintySample(embs, "vec_id", "embedding", "label", k = 10)
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 2L)
  }
}
