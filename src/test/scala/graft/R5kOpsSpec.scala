package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Similarity}

/** Round-5 wave-11 operators: integer-exact PageRank, zone-map audit,
  * label-centroid cosine. */
class R5kOpsSpec extends SparkSpec {
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  // ---- pageRankInt --------------------------------------------------------

  test("pageRankInt matches the hand-computed integer recurrence on a path") {
    // path a–b–c, scale 3e6: r0 = 1e6, base = 150000
    //   iter1: a=c=150000+425000=575000, b=150000+850000+850000=1850000
    //   iter2: a=c=150000+786250=936250, b=150000+2*488750=1127500
    val edges = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val out = Clusters.pageRankInt(edges, "s", "t", iters = 2,
      scale = 3000000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out("a") shouldBe ((1L, 936250L))
    out("b") shouldBe ((2L, 1127500L))
    out("c") shouldBe ((1L, 936250L))
  }

  test("pageRankInt is invariant to duplicate and reversed input edges") {
    val clean = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val noisy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("c", "b"),
      ("b", "c")).toDF("s", "t")
    val a = Clusters.pageRankInt(clean, "s", "t", iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val b = Clusters.pageRankInt(noisy, "s", "t", iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    a shouldBe b
  }

  test("pageRankInt conserves bounded rank mass and ranks every vertex") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c")).toDF("s", "t")
    val out = Clusters.pageRankInt(edges, "s", "t", iters = 4)
    out.count() shouldBe 4L
    val ranks = out.collect().map(_.getLong(2))
    all(ranks.toSeq) should be > 0L
    // floor truncation only loses mass, never creates it
    ranks.sum should be <= 1000000000000L
  }

  // ---- labelCentroidCosine ------------------------------------------------

  test("labelCentroidCosine computes exact integer dots and IEEE cosines") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 1), (2L, Seq(1.0f, 0.0f), 1),
      (3L, Seq(0.0f, 1.0f), 2),
      (4L, Seq(1.0f, 1.0f), 3))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidCosine(rows, "vec_id", "embedding",
      "label", qScale = 4)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.get(3))))
      .toMap
    // label1 centroid (8,0), label2 (0,4), label3 (4,4)
    out((1, 2))._1 shouldBe 0L
    out((1, 3))._1 shouldBe 32L
    out((2, 3))._1 shouldBe 16L
    out((1, 2))._2.asInstanceOf[Double] shouldBe 0.0
    out((1, 3))._2.asInstanceOf[Double] shouldBe
      (32.0 / (math.sqrt(64.0) * math.sqrt(32.0)))
    out((2, 3))._2.asInstanceOf[Double] shouldBe
      (16.0 / (math.sqrt(16.0) * math.sqrt(32.0)))
  }

  test("labelCentroidCosine yields NULL cosine against a zero centroid") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 1),
      (2L, Seq(0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidCosine(rows, "vec_id", "embedding",
      "label").collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 0L
    out.head.isNullAt(3) shouldBe true
  }

  test("labelCentroidCosine rejects a non-power-of-two scale") {
    val rows = Seq((1L, Seq(1.0f), 1)).toDF("vec_id", "embedding", "label")
    an[IllegalArgumentException] should be thrownBy
      Similarity.labelCentroidCosine(rows, "vec_id", "embedding", "label",
        qScale = 1000)
  }

  // ---- q171/q172 end-to-end invariants ------------------------------------

  test("q171 ranks the full trade graph with conserved mass") {
    val out = Queries.byName("q171_pagerank").fn(spark, Sf).cache()
    val n = out.count()
    n should be > 0L
    // vertex set = distinct endpoints; customers (even parity) and
    // suppliers (odd parity) both present
    out.filter(col("vertex") % 2 === 0).count() should be > 0L
    out.filter(col("vertex") % 2 === 1).count() should be > 0L
    val agg = out.agg(sum("rank"), min("rank")).head()
    agg.getLong(0) should be <= 1000000000000L
    agg.getLong(1) should be > 0L
    out.unpersist()
  }

  test("q172 audit: clustering by ship date skips files, natural doesn't") {
    val out = Queries.byName("q172_zonemap_audit").fn(spark, Sf).cache()
    // 2 layouts x 7 yearly predicates
    out.count() shouldBe 14L
    val skipped = out.groupBy("layout").agg(sum("files_skipped").as("sk"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the date-clustered layout must dominate the insertion-order layout
    skipped("clustered") should be > skipped("natural")
    // per predicate, read + skipped = total file count
    out.filter(col("files_read") + col("files_skipped") =!= 16L)
      .count() shouldBe 0L
    out.unpersist()
  }
}
