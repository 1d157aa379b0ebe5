package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clusters, Stats}

class SimpsonTrussSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- simpsonScreen

  test("simpsonScreen flags the textbook reversal") {
    // within each group y DECREASES in x; pooled, the high-x group has
    // much higher y, so the pooled association is positive
    val g1 = Seq((1L, 10L), (2L, 9L), (3L, 8L)).map { case (x, y) =>
      ("g1", x, y) }
    val g2 = Seq((101L, 1010L), (102L, 1009L), (103L, 1008L)).map {
      case (x, y) => ("g2", x, y) }
    val df = (g1 ++ g2).toDF("g", "x", "y")
    val got = Stats.simpsonScreen(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Int]("group_sign"), r.getAs[Int]("pooled_sign"),
          r.getAs[Boolean]("is_reversed"))).toMap
    got("g1") shouldBe ((-1, 1, true))
    got("g2") shouldBe ((-1, 1, true))
  }

  test("simpsonScreen reports agreement when there is no paradox") {
    val df = (1 to 20).map(i => (if (i % 2 == 0) "a" else "b",
      i.toLong, i.toLong * 3)).toDF("g", "x", "y")
    val got = Stats.simpsonScreen(df, Seq("g"), col("x"), col("y"))
      .collect()
    all(got.map(_.getAs[Boolean]("is_reversed"))) shouldBe false
    all(got.map(_.getAs[Int]("group_sign"))) shouldBe 1
  }

  test("simpsonScreen constant x yields zero sign") {
    val df = (1 to 6).map(i => ("a", 5L, i.toLong)).toDF("g", "x", "y")
    val got = Stats.simpsonScreen(df, Seq("g"), col("x"), col("y"))
      .collect().head
    got.getAs[Int]("group_sign") shouldBe 0
    got.getAs[Boolean]("is_reversed") shouldBe false
  }

  // -------------------------------------------- kTruss

  // a 4-clique (all 6 edges, support 2) plus a pendant chain
  private val cliqueAndChain = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L)).toDF("a_id", "b_id")

  test("kTruss keeps the clique and drops the chain") {
    val got = Clusters.kTruss(cliqueAndChain, "a_id", "b_id",
      k = 4, rounds = 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("support")))
      .toMap
    got.keySet shouldBe Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L))
    all(got.values) shouldBe 2L
  }

  test("kTruss peeling cascades: removing weak edges can strand others") {
    // triangle 1-2-3 plus edge 3-4 closed into triangle 3-4-5 by one
    // edge each: supports 1 everywhere -> k=4 clears the whole graph
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L)).toDF("a_id", "b_id")
    Clusters.kTruss(tri, "a_id", "b_id", k = 4, rounds = 2)
      .count() shouldBe 0L
    // k=3 (support >= 1) keeps both triangles but drops nothing else
    Clusters.kTruss(tri, "a_id", "b_id", k = 3, rounds = 2)
      .count() shouldBe 6L
  }

  test("kTruss degree cap drops saturated vertices before enumeration") {
    // star hub 0 with 40 spokes (degree 40) + a clean 4-clique
    val star = (1L to 40L).map(i => (0L, i))
    val clique = Seq((101L, 102L), (101L, 103L), (101L, 104L),
      (102L, 103L), (102L, 104L), (103L, 104L))
    val edges = (star ++ clique).toDF("a_id", "b_id")
    val got = Clusters.kTruss(edges, "a_id", "b_id", k = 4, rounds = 1,
      maxDegree = Some(30)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // hub edges vanish pre-enumeration; the clique survives untouched
    got shouldBe clique.toSet
  }

  test("kTruss normalizes direction and duplicate edges") {
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("a_id", "b_id")
    val got = Clusters.kTruss(messy, "a_id", "b_id", k = 3, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L))
  }
}
