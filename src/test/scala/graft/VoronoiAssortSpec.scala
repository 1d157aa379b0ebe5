package graft

import org.apache.spark.sql.functions._

import graft.operators.Clusters

class VoronoiAssortSpec extends SparkSpec {
  import spark.implicits._

  private val nodes = (1L to 9L).map(Tuple1(_)).toDF("id")
  // chain 1-2-3-4-5-6-7 with seeds 1 and 7, plus a 8-9 island
  private val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (5L, 6L), (6L, 7L), (8L, 9L)).toDF("a", "b")

  test("each node is owned by its nearest seed, ties to smaller seed") {
    val got = Clusters.graphVoronoi(nodes, "id",
      col("id") === 1L || col("id") === 7L, edges, "a", "b", maxHops = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("hops"), r.getAs[Long]("seed"))).toMap
    got(2L) shouldBe ((1, 1L))
    got(3L) shouldBe ((2, 1L))
    got(4L) shouldBe ((3, 1L)) // equidistant: tie to smaller seed 1
    got(5L) shouldBe ((2, 7L))
    got(6L) shouldBe ((1, 7L))
    got.contains(8L) shouldBe false // unreachable island
  }

  test("voronoi distances agree with bfsHops") {
    val v = Clusters.graphVoronoi(nodes, "id",
      col("id") === 1L || col("id") === 7L, edges, "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("hops")).toMap
    val b = Clusters.bfsHops(nodes, "id",
      col("id") === 1L || col("id") === 7L, edges, "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("hops")).toMap
    v shouldBe b
  }

  test("star graphs are disassortative, cliques are assortative-neutral") {
    val star = (2L to 8L).map(i => (1L, i)).toDF("a", "b")
    val starR = Clusters.degreeAssortativity(star, "a", "b")
      .collect().head
    // all edges hub(7)-spoke(1): correlation is degenerate (NaN) or
    // strongly negative; for a pure star every edge is identical, so
    // the variance on each side is zero -> NaN
    val r = starR.getAs[Double]("assortativity")
    assert(r.isNaN || r < 0)
    // a clique: all degrees equal -> 0/0 -> NaN too; mixed graph below
    val mixed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (5L, 1L))
      .toDF("a", "b")
    val m = Clusters.degreeAssortativity(mixed, "a", "b").collect().head
    m.getAs[Long]("m2") shouldBe 10L
    m.getAs[Double]("assortativity") should (be >= -1.0 and be <= 1.0)
  }
}
