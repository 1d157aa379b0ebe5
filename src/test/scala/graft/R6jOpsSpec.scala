package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Linkage}

class R6jOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- scorePairs / resolve

  test("scorePairs multiplies agreement weights in fixed order") {
    val pairs = Seq((1L, 2L, true, false), (3L, 4L, true, true))
      .toDF("a_id", "b_id", "f1", "f2")
    val got = Linkage.scorePairs(pairs, Seq("f1" -> 2.0, "f2" -> 10.0))
      .select("a_id", "score").as[(Long, Double)].collect().toMap
    got(1L) shouldBe 2.0
    got(3L) shouldBe 20.0
  }

  test("resolveEntities clusters transitively and flags canonicals") {
    val records = (1L to 6L).toDF("id")
    // 1-2 and 2-3 match (1,2,3 one entity); 5-6 match; 4 alone
    val scored = Seq((1L, 2L, 150.0), (2L, 3L, 150.0), (5L, 6L, 150.0),
      (3L, 4L, 10.0)).toDF("a_id", "b_id", "score")
    val got = Linkage.resolveEntities(records, "id", scored, 100.0)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("entity_id"), r.getAs[Long]("entity_size"),
          r.getAs[Boolean]("is_canonical")))).toMap
    got(1L) shouldBe ((1L, 3L, true))
    got(2L) shouldBe ((1L, 3L, false))
    got(3L) shouldBe ((1L, 3L, false))
    got(4L) shouldBe ((4L, 1L, true))
    got(5L) shouldBe ((5L, 2L, true))
    got(6L) shouldBe ((5L, 2L, false))
  }

  // -------------------------------------------- partition modularity

  test("partitionModularity matches the closed form on two cliques") {
    // communities A={1,2,3} triangle, B={4,5} edge, one cross edge 3-4
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (3L, 4L))
      .toDF("a", "b")
    val mem = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"))
      .toDF("id", "c")
    val got = Clusters.partitionModularity(edges, "a", "b", mem, "id", "c")
      .collect().map(r => r.getAs[String]("community") -> r).toMap
    val m = 5L
    got("A").getAs[Long]("intra_edges") shouldBe 3L
    got("B").getAs[Long]("intra_edges") shouldBe 1L
    got("A").getAs[Long]("degree_sum") shouldBe 7L // 2+2+3
    got("B").getAs[Long]("degree_sum") shouldBe 3L // 2+1
    val expected = (4.0 * m * (3 + 1) - (49 + 9)) / (4.0 * m * m)
    got("A").getAs[Double]("q_modularity") shouldBe expected
    got("B").getAs[Double]("q_modularity") shouldBe expected
  }

  test("communities with no edges appear with zeros") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val mem = Seq((1L, "A"), (2L, "A"), (9L, "Z")).toDF("id", "c")
    val got = Clusters.partitionModularity(edges, "a", "b", mem, "id", "c")
      .collect().map(r => r.getAs[String]("community") -> r).toMap
    got("Z").getAs[Long]("intra_edges") shouldBe 0L
    got("Z").getAs[Long]("degree_sum") shouldBe 0L
    got("Z").getAs[Long]("n_members") shouldBe 1L
    // all edges intra in A -> perfectly assortative partition
    got("A").getAs[Double]("q_modularity") shouldBe
      (4.0 * 1 * 1 - 4.0) / 4.0
  }
}
