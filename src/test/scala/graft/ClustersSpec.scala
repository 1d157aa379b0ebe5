package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Similarity}

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(verts: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(verts.toDF("id"), "id",
        pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain, triangle, and singleton all resolve to min reachable id") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L),
      Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), // 5-chain
          (6L, 7L), (7L, 9L), (6L, 9L)))          // triangle
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 6L, 9L -> 6L)
  }

  test("convergence is detected (no fixed iteration count needed)") {
    // a 2-vertex graph converges in 1 round; a 10-chain needs several —
    // both must produce the exact fixpoint under the same maxIter
    val chain = (1L to 10L).sliding(2).map(s => (s(1), s.head)).toSeq
    cc(1L to 10L, chain).values.toSet shouldBe Set(1L)
  }

  test("exhausting maxIter fails loudly instead of returning wrong labels") {
    val chain = (1L to 64L).sliding(2).map(s => (s(1), s.head)).toSeq
    an[IllegalStateException] should be thrownBy
      Clusters.connectedComponents((1L to 64L).toDF("id"), "id",
        chain.toDF("a", "b"), "a", "b", maxIter = 2,
        smallGraphMaxEdges = 0L).collect()
  }

  test("small-graph fast path == iterative loop (longs, random graph)") {
    val rnd = new scala.util.Random(7)
    val verts = 0L until 400L
    val pairs = Seq.fill(300)((rnd.nextInt(400).toLong,
      rnd.nextInt(400).toLong)).filter(p => p._1 != p._2)
    val fast = cc(verts, pairs)
    val slow = Clusters.connectedComponents(verts.toDF("id"), "id",
        pairs.toDF("a", "b"), "a", "b", smallGraphMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    fast shouldBe slow
  }

  test("small-graph fast path: string ids use Spark's binary UTF-8 order") {
    // "😀" (a supplementary char) sorts ABOVE "�" in
    // UTF-8 binary order but BELOW it in Java UTF-16 order — the label
    // must match the iterative path's Spark min() on both fixtures
    val ids = Seq("😀", "�")
    val pairs = Seq(("😀", "�"))
    val fast = Clusters.connectedComponents(ids.toDF("id"), "id",
        pairs.toDF("a", "b"), "a", "b")
      .as[(String, String)].collect().toMap
    val slow = Clusters.connectedComponents(ids.toDF("id"), "id",
        pairs.toDF("a", "b"), "a", "b", smallGraphMaxEdges = 0L)
      .as[(String, String)].collect().toMap
    fast shouldBe slow
    fast.values.toSet shouldBe Set("�") // UTF-8 min, not UTF-16 min
  }

  test("hub-skew: a 10k-spoke star converges in O(1) rounds despite one " +
    "hot vertex") {
    // diameter 2: label 0 reaches every spoke in one propagation round;
    // maxIter=4 asserts the round count stays constant-small — if the
    // hot-key aggregation or pointer jumping regressed to per-spoke
    // progress this would blow the iteration budget and throw
    val spokes = (1L to 10000L)
    val verts = spark.range(0, 10001).toDF("id")
    val pairs = spokes.toDF("b").withColumn("a", lit(0L))
    val comps = Clusters.connectedComponents(verts, "id", pairs, "a", "b",
      maxIter = 4)
    comps.filter($"cluster_id" =!= 0L).count() shouldBe 0L
    comps.count() shouldBe 10001L
  }

  test("reliable checkpointDir variant: identical output, durable files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    val chain = (1L to 10L).sliding(2).map(s => (s(1), s.head)).toSeq
    val local = cc(1L to 10L, chain)
    val durable = Clusters.connectedComponents(
        (1L to 10L).toDF("id"), "id", chain.toDF("a", "b"), "a", "b",
        maxIter = 20, checkpointDir = Some(dir.toString))
      .as[(Long, Long)].collect().toMap
    durable shouldBe local
    // the final round's reliable checkpoint remains readable...
    def filesUnder(f: java.io.File): Long =
      if (f.isFile) 1L else Option(f.listFiles()).fold(0L)(_.map(filesUnder).sum)
    filesUnder(dir.toFile) should be > 0L
    // ...and every INTERMEDIATE round's snapshot was pruned: Spark never
    // deletes reliable checkpoints itself, so without pruning each run
    // leaves ~2 corpus-sized snapshots per round behind
    val runDirs = Option(dir.toFile.listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("run_"))
    runDirs.length shouldBe 1
    val stepDirs = Option(runDirs.head.listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("step_"))
    stepDirs.length shouldBe 1
  }

  test("clusterSummary: size and canonical representative per cluster") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "cluster_id")
    val s = Clusters.clusterSummary(comps, "id")
      .as[(Long, Long, Long)].collect().toSet
    s shouldBe Set((1L, 2L, 1L), (3L, 1L, 3L))
  }

  test("quantizeInt8: codes in [-127,127], zero vector -> NULL") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("id", "emb")
    val out = df.select($"id", Similarity.quantizeInt8($"emb").as("q"))
    out.filter($"id" === 2 && $"q".isNull).count() shouldBe 1
    val q = out.filter($"id" === 1).select($"q").as[Seq[Long]].head()
    q shouldBe Seq(63L, -127L, 31L) // floor(x * 127 / 2)
    q.foreach(v => math.abs(v) should be <= 127L)
  }

  test("quantized top-k keeps high recall vs exact float top-k") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedCosineTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    recall should be >= 0.8 // int8 keeps ~all of the float ranking
  }

  // ---- triangleStats ------------------------------------------------------

  private def triStats(verts: Seq[Long], pairs: Seq[(Long, Long)]) =
    Clusters.triangleStats(verts.toDF("id"), "id",
        pairs.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("triangles"),
          Option(r.getAs[java.lang.Double]("lcc")).map(_.doubleValue))))
      .toMap

  test("triangleStats counts a 4-clique and leaves chains at zero") {
    // 4-clique {1,2,3,4} (4 triangles, each vertex in 3) + chain 5-6-7
    val clique = for {
      i <- 1L to 4L; j <- 1L to 4L if i < j
    } yield (i, j)
    val out = triStats(1L to 8L,
      clique ++ Seq((5L, 6L), (6L, 7L)))
    (1L to 4L).foreach { v =>
      out(v)._1 shouldBe 3L
      out(v)._2 shouldBe 3L
      out(v)._3.get shouldBe 1.0 // 2*3 / (3*2)
    }
    out(6L) shouldBe ((2L, 0L, Some(0.0)))
    out(5L)._3 shouldBe None // deg 1 -> lcc undefined
    out(8L) shouldBe ((0L, 0L, None)) // isolated vertex
  }

  test("triangleStats is invariant to edge direction and duplicates") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 1L), (1L, 1L))
    triStats(1L to 3L, noisy) shouldBe triStats(1L to 3L, base)
  }

  // ---- kCore --------------------------------------------------------------

  private def core(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Clusters.kCore(pairs.toDF("a", "b"), "a", "b", k)
      .as[(Long, Long)].collect().toMap

  test("kCore keeps the clique and peels chains transitively") {
    val clique = for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)
    // pendant chain hanging off the clique: 4-5-6; 6 peels first, then 5
    val edges = clique ++ Seq((4L, 5L), (5L, 6L))
    val c3 = core(edges, 3)
    c3.keySet shouldBe Set(1L, 2L, 3L, 4L)
    c3.values.toSet shouldBe Set(3L) // every clique vertex has core deg 3
    // k=1 keeps every non-isolated vertex
    core(edges, 1).keySet shouldBe (1L to 6L).toSet
  }

  test("kCore is empty when no subgraph reaches k") {
    core(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 3) shouldBe Map.empty
  }

  // ---- commonNeighborCandidates -------------------------------------------

  test("commonNeighborCandidates scores non-adjacent wedge endpoints") {
    // 1 and 3 share neighbors {2, 4}; 1-3 not adjacent -> candidate.
    // 1 and 5: one common neighbor (4) -> below minCommon.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L), (4L, 5L))
    val out = Clusters.commonNeighborCandidates(
        edges.toDF("a", "b"), "a", "b", minCommon = 2)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        ((r.getAs[Long]("common"), r.getAs[Double]("jaccard"))))
      .toMap
    // (2,4) qualifies symmetrically: shared neighbors {1, 3}
    out.keySet shouldBe Set((1L, 3L), (2L, 4L))
    out((1L, 3L))._1 shouldBe 2L
    // deg(1) = 2, deg(3) = 2, union = 2 + 2 - 2 = 2 -> jaccard 1.0
    out((1L, 3L))._2 shouldBe 1.0
    // deg(2) = 2, deg(4) = 3 -> jaccard 2 / 3
    out((2L, 4L))._2 shouldBe (2.0 / 3.0) +- 1e-15
  }

  test("commonNeighborCandidates suppresses over-cap hub centers") {
    // star: hub 100 adjacent to 1..4 -> every leaf pair shares the hub.
    // With the hub over the center cap, no wedges survive.
    val star = (1L to 4L).map(v => (100L, v))
    Clusters.commonNeighborCandidates(star.toDF("a", "b"), "a", "b",
      minCommon = 1, maxCenterDegree = 3).count() shouldBe 0L
    Clusters.commonNeighborCandidates(star.toDF("a", "b"), "a", "b",
      minCommon = 1, maxCenterDegree = 4).count() shouldBe 6L // C(4,2)
  }

  test("commonNeighborCandidates drops adjacent pairs") {
    // triangle: every pair adjacent -> no candidates at all
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    Clusters.commonNeighborCandidates(edges.toDF("a", "b"), "a", "b",
      minCommon = 1).count() shouldBe 0L
  }

  test("clusterCohesionAudit: clique is complete, chain is flagged") {
    // component A: 3-clique (1,2,3) with distances 1,2,3
    // component B: 3-chain (10-11-12) — 2 of 3 possible pairs
    // singleton 99 never appears (size >= 2 filter)
    val verts = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L).toDF("id")
    val pairs = Seq(
      (1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 3),
      (10L, 11L, 1), (11L, 12L, 2)
    ).toDF("a", "b", "dist")
    val out = Clusters.clusterCohesionAudit(verts, "id", pairs,
      "a", "b", "dist")
      .collect().map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_pairs"),
          r.getAs[Int]("min_dist"), r.getAs[Int]("max_dist"),
          r.getAs[Double]("completeness"), r.getAs[Boolean]("is_chain")))
      .toMap
    out.keySet shouldBe Set(1L, 10L)
    out(1L) shouldBe ((3L, 3L, 1, 3, 1.0, false))
    out(10L)._6 shouldBe true // chain: completeness 2/3 < 1
    out(10L)._5 shouldBe (2.0 / 3.0) +- 1e-15
  }
}
