package graft

import graft.operators.{Corpus, Linkage}

class MatchingCoverSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- iterativeMatching

  test("round 2 matches records whose best partner was taken in round 1") {
    // chain of preferences: a-b (100) strongest, then c's best is b
    // (90), but b pairs with a in round 1; c-d (80) mutual in round 2
    val pairs = Seq(
      ("a", "b", 100L), ("b", "c", 90L), ("c", "d", 80L))
      .toDF("a_value", "b_value", "jw_ppm")
    val got = Linkage.iterativeMatching(pairs, "jw_ppm", rounds = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Int]("round"))
      .toMap
    got shouldBe Map(("a", "b") -> 1, ("c", "d") -> 2)
  }

  test("matching is exclusive: a record appears in at most one pair") {
    val pairs = Seq(
      ("a", "b", 100L), ("a", "c", 99L), ("a", "d", 98L),
      ("b", "c", 50L), ("c", "d", 97L))
      .toDF("a_value", "b_value", "jw_ppm")
    val got = Linkage.iterativeMatching(pairs, "jw_ppm", rounds = 3)
      .collect().flatMap(r => Seq(r.getString(0), r.getString(1)))
    got.distinct.length shouldBe got.length
  }

  test("single round equals reciprocalBestMatch") {
    val pairs = Seq(("a", "b", 95L), ("b", "c", 90L), ("a", "c", 10L))
      .toDF("a_value", "b_value", "jw_ppm")
    val iter = Linkage.iterativeMatching(pairs, "jw_ppm", rounds = 1)
      .drop("round").collect().map(_.toSeq).toSet
    val rbm = Linkage.reciprocalBestMatch(pairs, "jw_ppm")
      .collect().map(_.toSeq).toSet
    iter shouldBe rbm
  }

  // -------------------------------------------- greedySourceCover

  private val docs = Seq(
    (1L, "alpha beta gamma delta", "s1"),   // 3 shingles
    (2L, "alpha beta", "s2"),               // 1 shingle (subset of s1)
    (3L, "epsilon zeta eta", "s3"),         // 2 new shingles
    (4L, "alpha beta gamma", "s2"))         // s2 gains another s1-subset
    .toDF("doc_id", "text", "source")

  test("greedy cover picks the largest-gain source first, ties by name") {
    val got = Corpus.greedySourceCover(docs, "source", "text",
      shingleN = 2, rounds = 5).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("source"),
        r.getAs[Long]("new_elements"), r.getAs[Long]("covered_total")))
    got(0) shouldBe ((1, "s1", 3L, 3L))
    got(1) shouldBe ((2, "s3", 2L, 5L))
    // s2's shingles are fully covered by s1 -> zero gain -> not picked
    got.length shouldBe 2
  }

  test("covered_total is the running distinct union size") {
    val overlapping = Seq(
      (1L, "a b c", "x"), (2L, "b c d", "y")).toDF("doc_id", "text", "source")
    val got = Corpus.greedySourceCover(overlapping, "source", "text", 2, 5)
      .collect()
    got.map(_.getAs[Long]("covered_total")).last shouldBe 3L // a b, b c, c d
  }
}
