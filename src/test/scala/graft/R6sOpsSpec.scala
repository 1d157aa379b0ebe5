package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Retrieval, Stats}

class R6sOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- Spearman

  test("spearman perfect monotone relation scores +/-1") {
    val df = (1 to 30).map(i => (i.toDouble, (i * i).toDouble)).toDF("x", "y")
    Stats.spearman(df, col("x"), col("y")).collect()
      .head.getAs[Double]("rho") shouldBe 1.0 +- 2e-6
    Stats.spearman(df, col("x"), -col("y")).collect()
      .head.getAs[Double]("rho") shouldBe -1.0 +- 2e-6
  }

  test("spearman sees monotone where Pearson-style linearity fails") {
    // exponential growth: still perfectly rank-correlated
    val df = (1 to 20).map(i => (i.toDouble, math.exp(i.toDouble)))
      .toDF("x", "y")
    Stats.spearman(df, col("x"), col("y")).collect()
      .head.getAs[Double]("rho") shouldBe 1.0 +- 2e-6
  }

  test("spearman handles heavy ties via average ranks") {
    // x constant on pairs, y alternating: hand-checkable small case
    val df = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (2.0, 4.0),
      (3.0, 5.0), (3.0, 6.0)).toDF("x", "y")
    val got = Stats.spearman(df, col("x"), col("y")).collect().head
    got.getAs[Long]("n") shouldBe 6L
    // rank-correlation of a monotone step function: strong but < 1
    got.getAs[Double]("rho") should be > 0.9
    got.getAs[Double]("rho") should be < 1.0
  }

  test("spearman constant column yields NULL rho") {
    val df = (1 to 10).map(i => (5.0, i.toDouble)).toDF("x", "y")
    val got = Stats.spearman(df, col("x"), col("y")).collect().head
    assert(got.isNullAt(got.fieldIndex("rho")))
  }

  test("spearman of independent shuffled ranks is near zero") {
    val perm = Seq(7, 2, 9, 4, 1, 8, 3, 10, 5, 6)
    val df = perm.zipWithIndex.map { case (p, i) =>
      (i.toDouble, p.toDouble)
    }.toDF("x", "y")
    math.abs(Stats.spearman(df, col("x"), col("y")).collect()
      .head.getAs[Double]("rho")) should be < 0.5
  }

  // -------------------------------------------- phrase search

  test("phraseSearch finds only consecutive-token matches") {
    val df = Seq(
      (1L, "the table scan was fast"),
      (2L, "scan the table"), // reversed: no match
      (3L, "table and scan far apart"),
      (4L, "table scan then another table scan")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(df, "doc_id", "text",
      Seq("table", "scan"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matches"), r.getAs[Int]("first_pos"))).toMap
    got.keySet shouldBe Set(1L, 4L)
    got(1L) shouldBe ((1L, 1))
    got(4L) shouldBe ((2L, 0))
  }

  test("phraseSearch supports longer phrases") {
    val df = Seq((1L, "a b c d"), (2L, "a b x c d"), (3L, "x a b c"))
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(df, "doc_id", "text",
      Seq("a", "b", "c")).collect()
    got.map(_.getAs[Long]("doc_id")).sorted shouldBe Array(1L, 3L)
  }

  test("phraseSearch counts overlapping occurrences") {
    val df = Seq((1L, "go go go")).toDF("doc_id", "text")
    Retrieval.phraseSearch(df, "doc_id", "text", Seq("go", "go"))
      .collect().head.getAs[Long]("n_matches") shouldBe 2L
  }

  // -------------------------------------------- label propagation

  test("labelPropagation collapses a clique to its min label") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L)).toDF("a", "b")
    val got = Clusters.labelPropagation(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label"))
      .toMap
    got(1L) shouldBe got(2L)
    got(2L) shouldBe got(3L)
    got(4L) shouldBe got(5L)
    got(5L) shouldBe got(6L)
    got(1L) should not be got(4L)
  }

  test("labelPropagation keeps isolated nodes in their own community") {
    val nodes = (1L to 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val got = Clusters.labelPropagation(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("community_size")).toMap
    got(3L) shouldBe 1L
    got(1L) shouldBe 2L
  }

  test("labelPropagation is deterministic under ties (min label wins)") {
    // node 3 sees labels 1 and 2 once each -> adopts 1
    val nodes = (1L to 3L).toDF("id")
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("a", "b")
    val got = Clusters.labelPropagation(nodes, "id", edges, "a", "b",
      rounds = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label"))
      .toMap
    got(3L) shouldBe 1L
  }
}
