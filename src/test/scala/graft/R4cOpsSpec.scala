package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, NearDup, Retrieval}

/** Round-4 wave-4 operators: span-duplication profiling, deterministic
  * BM25 retrieval, prefix-filter set-similarity join. */
class R4cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- spanDuplication ----------------------------------------------------

  test("spanDuplication: shared vs unique spans counted per doc") {
    // spanLen=3: docs 1 and 2 share the span "a b c"; doc 3 is disjoint
    val docs = Seq(
      (1L, "a b c d"), // spans: "a b c", "b c d"
      (2L, "z a b c"), // spans: "z a b", "a b c"
      (3L, "p q r")    // span:  "p q r"
    ).toDF("id", "text")
    val out = Corpus.spanDuplication(docs, "id", "text", spanLen = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1).toList
    out shouldBe List(
      (1L, 2, 1L, 0.5),
      (2L, 2, 1L, 0.5),
      (3L, 1, 0L, 0.0))
  }

  test("spanDuplication: span repeated WITHIN one doc is not cross-doc") {
    val docs = Seq(
      (1L, "a b c x a b c"), // "a b c" twice, but only in this doc
      (2L, "q r s")
    ).toDF("id", "text")
    val out = Corpus.spanDuplication(docs, "id", "text", spanLen = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1).toList
    // distinct spans of doc 1: "a b c","b c x","c x a","x a b" — none shared
    out.head._3 shouldBe 0L
    out.foreach(_._3 shouldBe 0L)
  }

  test("spanDuplication: docs shorter than spanLen emit no row") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("id", "text")
    val out = Corpus.spanDuplication(docs, "id", "text", spanLen = 3)
    out.select("doc_id").as[Long].collect().toList shouldBe List(2L)
  }

  // ---- bm25TopK -----------------------------------------------------------

  test("bm25TopK: term-bearing docs outrank term-free docs, rank is dense") {
    val docs = Seq(
      (1L, "spark spark spark engine"),
      (2L, "spark engine"),
      (3L, "nothing relevant here at all"),
      (4L, "spark")
    ).toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text", Seq("spark"), topK = 4)
      .as[(Long, Int, Double, Int)].collect().sortBy(_._4).toList
    out.map(_._4) shouldBe List(1, 2, 3, 4)
    // doc 3 has tf=0 -> score 0, ranked last
    out.last._1 shouldBe 3L
    out.last._3 shouldBe 0.0
    // all scoring docs strictly positive, descending
    val scores = out.map(_._3)
    scores shouldBe scores.sorted.reverse
    scores.head should be > 0.0
  }

  test("bm25TopK: multi-term score is the sum of per-term scores") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha"), (3L, "beta"), (4L, "gamma")
    ).toDF("id", "text")
    def score(terms: Seq[String]): Map[Long, Double] =
      Retrieval.bm25TopK(docs, "id", "text", terms, topK = 4)
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    val both = score(Seq("alpha", "beta"))
    val a = score(Seq("alpha"))
    val b = score(Seq("beta"))
    both.keys.foreach { k =>
      both(k) shouldBe (a(k) + b(k)) +- 1e-12
    }
  }

  test("bm25TopK: NULL/empty-text docs are excluded from the corpus stats") {
    val docs = Seq((1L, "spark engine"), (2L, null.asInstanceOf[String]),
      (3L, "   "), (4L, "other text"))
      .toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text", Seq("spark"), topK = 10)
    // token-less docs emit no row AND do not count in N/df/avgdl
    out.count() shouldBe 2L
    // N=2, df=1 -> idf = (2-1+0.5)/(1+0.5) = 1.0; doc 1 scores, doc 4 zero
    val scores = out.select($"doc_id", $"score").as[(Long, Double)]
      .collect().toMap
    scores(4L) shouldBe 0.0
    scores(1L) should be > 0.0
  }

  test("bm25TopK: topK truncates with deterministic doc_id tie-break") {
    val docs = (1L to 10L).map(i => (i, "same text every time"))
      .toDF("id", "text")
    val out = Retrieval.bm25TopK(docs, "id", "text", Seq("same"), topK = 3)
      .select($"doc_id").as[Long].collect().toList
    // identical scores: ties resolved by ascending doc_id
    out.sorted shouldBe List(1L, 2L, 3L)
  }

  // ---- prefixFilterJoin ---------------------------------------------------

  private def naiveJaccardPairs(docs: Seq[(Long, String)], tau: Double) = {
    val sets = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ai, as) <- sets; (bi, bs) <- sets if ai < bi
      inter = (as intersect bs).size
      j = inter.toDouble / (as.size + bs.size - inter)
      if j >= tau
    } yield (ai, bi, inter.toLong, j)).toSet
  }

  test("prefixFilterJoin equals brute-force all-pairs (lossless recall)") {
    // mixed sizes, near-dups, exact dup, and disjoint docs
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"),
      (3L, "a b c d e f g h"), (4L, "p q r s t"), (5L, "p q r s u"),
      (6L, "z y"), (7L, "m"), (8L, "m n o p q r s t u v w x"))
    for (tau <- Seq(0.5, 0.66, 0.99)) {
      val got = NearDup.prefixFilterJoin(docs.toDF("id", "text"),
          "id", "text", tau)
        .as[(Long, Long, Long, Double)].collect().toSet
      got shouldBe naiveJaccardPairs(docs, tau)
    }
  }

  test("prefixFilterJoin: duplicate tokens collapse to the distinct set") {
    val docs = Seq((1L, "a a a b"), (2L, "b a")).toDF("id", "text")
    val out = NearDup.prefixFilterJoin(docs, "id", "text", 0.5)
      .as[(Long, Long, Long, Double)].collect().toList
    out shouldBe List((1L, 2L, 2L, 1.0))
  }
}
