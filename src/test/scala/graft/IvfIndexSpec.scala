package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** The catalog-persisted IVF index: incremental batch assignment equals
  * full re-assignment, batch re-delivery is idempotent (and never
  * touches other batches' partitions), the drift report fires the
  * re-train trigger on a skewed batch, and retrain (= build) resets it. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    spark.conf.set("spark.sql.catalog.graft_ivf",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ivf.root", r)
    r
  }

  /** Deterministic little corpus: 60 vectors in 3 well-separated axis
    * clusters (ids 0-19 cluster on axis 0, 20-39 on axis 1, 40-59 on
    * axis 2), with a small id-dependent wobble so vectors are distinct. */
  private def corpus(ids: Range) = ids.map { i =>
    val axis = (i / 20) % 3
    val v = Array.fill(4)(0.01f * ((i % 7) + 1))
    v(axis) = 1f
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("incremental batch assignment == full re-assignment") {
    root
    IvfIndex.build(spark, "graft_ivf", "ns", "a",
      corpus(0 until 40), "vec_id", "embedding", 3)
    IvfIndex.assignBatch(spark, "graft_ivf", "ns", "a",
      corpus(40 until 60), "vec_id", "embedding", "b1")
    val incremental = IvfIndex.assignment(spark, "graft_ivf", "ns", "a")
      .select("vec_id", "centroid_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val full = graft.operators.Similarity.ivfAssign(corpus(0 until 60),
        "vec_id", "embedding",
        IvfIndex.centroids(spark, "graft_ivf", "ns", "a"))
      .select(col("vec_id").cast("string"),
        col("centroid_id").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    incremental shouldBe full
    incremental should have size 60
  }

  test("re-delivering a batch is idempotent and leaves other batches' " +
      "partitions byte-identical") {
    root
    IvfIndex.build(spark, "graft_ivf", "ns", "b",
      corpus(0 until 40), "vec_id", "embedding", 3)
    IvfIndex.assignBatch(spark, "graft_ivf", "ns", "b",
      corpus(40 until 60), "vec_id", "embedding", "b1")
    def baseFiles = new java.io.File(s"$root/ns/b_assign/batch=base")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    val before = baseFiles
    val rows1 = IvfIndex.assignment(spark, "graft_ivf", "ns", "b").count()
    IvfIndex.assignBatch(spark, "graft_ivf", "ns", "b",
      corpus(40 until 60), "vec_id", "embedding", "b1")
    IvfIndex.assignment(spark, "graft_ivf", "ns", "b")
      .count() shouldBe rows1
    baseFiles shouldBe before
  }

  test("drift report fires the re-train trigger on a skewed batch; " +
      "retrain resets it") {
    root
    // base corpus = clusters 0 and 1 only; the new batch lands ENTIRELY
    // in cluster-2 space, piling into buckets the base never shaped
    IvfIndex.build(spark, "graft_ivf", "ns", "c",
      corpus(0 until 40), "vec_id", "embedding", 2)
    IvfIndex.needsRetrain(spark, "graft_ivf", "ns", "c") shouldBe false
    IvfIndex.assignBatch(spark, "graft_ivf", "ns", "c",
      corpus(40 until 60), "vec_id", "embedding", "b1")
    val report = IvfIndex.driftReport(spark, "graft_ivf", "ns", "c")
    report.columns should contain allOf
      ("centroid_id", "n_base", "n_new", "new_share", "global_share",
        "drift_alert")
    IvfIndex.needsRetrain(spark, "graft_ivf", "ns", "c") shouldBe true
    // re-train on the full corpus: build() is the retrain path — the
    // rebuilt base covers everything, no non-base batches remain
    IvfIndex.build(spark, "graft_ivf", "ns", "c",
      corpus(0 until 60), "vec_id", "embedding", 3)
    IvfIndex.needsRetrain(spark, "graft_ivf", "ns", "c") shouldBe false
    IvfIndex.assignment(spark, "graft_ivf", "ns", "c")
      .count() shouldBe 60
  }

  test("centroid embeddings round-trip the all-string layer exactly") {
    root
    val vecs = Seq(
      (1L, Array(0.1f, -3.4028235e38f, 1.4e-45f, 7.0000005f)),
      (2L, Array(1f, 2f, 3f, 4f))
    ).toDF("vec_id", "embedding")
    IvfIndex.build(spark, "graft_ivf", "ns", "rt", vecs,
      "vec_id", "embedding", 2)
    val back = IvfIndex.centroids(spark, "graft_ivf", "ns", "rt")
      .collect().map(r => r.getString(0) ->
        r.getSeq[Float](1).toArray).toMap
    back("1") shouldBe Array(0.1f, -3.4028235e38f, 1.4e-45f, 7.0000005f)
    back("2") shouldBe Array(1f, 2f, 3f, 4f)
  }
}
