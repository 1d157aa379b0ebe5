package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/embeddings.parquet").exists()

  private lazy val embs = Tables.embeddings(spark, sf)
  private lazy val cents = Similarity.ivfCentroids(embs, "vec_id", "embedding", 8)

  test("centroids: exactly k, deterministic across evaluations") {
    assume(available)
    cents.count() shouldBe 8
    val a = col1(cents.select("centroid_id"))
    val b = col1(Similarity.ivfCentroids(embs, "vec_id", "embedding", 8)
      .select("centroid_id"))
    a shouldBe b
  }

  test("assignment: every vector exactly one centroid") {
    assume(available)
    val assigned = Similarity.ivfAssign(embs, "vec_id", "embedding", cents)
    assigned.count() shouldBe embs.count()
    assigned.groupBy("vec_id").count().filter($"count" > 1).count() shouldBe 0
    // a centroid vector is assigned to itself (cos = 1 with itself)
    assigned.filter($"vec_id" === $"centroid_id").count() shouldBe 8
  }

  test("ivf top-k results come only from probed buckets and rank correctly") {
    assume(available)
    val out = Similarity.ivfTopK(embs, "vec_id", "embedding",
      $"vec_id" < 10, cents, k = 3, nprobe = 2).cache()
    out.groupBy("q_id").count().filter($"count" > 3).count() shouldBe 0
    // ranks are 1..n dense per query
    out.filter($"rank" < 1 || $"rank" > 3).count() shouldBe 0
    out.unpersist()
    ()
  }

  test("recall vs brute force is substantial on this corpus") {
    assume(available)
    val brute = Similarity.cosineTopK(embs, "vec_id", "embedding",
        $"vec_id" < 10, k = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(embs, "vec_id", "embedding",
        $"vec_id" < 10, cents, k = 3, nprobe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    recall should be >= 0.2 // nprobe=2/8 buckets; exactness isn't the point
    ivf.size should be <= brute.size
  }

  test("ivfRecallCalibration: curve is non-decreasing, matches ivfTopK " +
    "pointwise, and reaches 1.0 when every bucket is probed") {
    assume(available)
    val k = 3
    val numCent = 8
    val curve = Similarity.ivfRecallCalibration(embs, "vec_id", "embedding",
        $"vec_id" < 10, cents, k = k, maxNprobe = numCent)
      .orderBy("nprobe")
      .collect().map(r => (r.getAs[Int]("nprobe"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall")))
    curve.map(_._1).toSeq shouldBe (1 to numCent)
    curve.sliding(2).foreach { case Array(a, b) =>
      b._3 should be >= a._3 // more probes never lose candidates
    }
    // probing all buckets IS brute force
    curve.last._3 shouldBe 1.0
    // the curve point at nprobe=2 equals an independent ivfTopK run
    val brute = Similarity.cosineTopK(embs, "vec_id", "embedding",
        $"vec_id" < 10, k = k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf2 = Similarity.ivfTopK(embs, "vec_id", "embedding",
        $"vec_id" < 10, cents, k = k, nprobe = 2)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    curve(1)._2 shouldBe (brute & ivf2).size.toLong
  }
}
