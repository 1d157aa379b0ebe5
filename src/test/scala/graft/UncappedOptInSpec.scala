package graft

import graft.operators.{Clusters, Corpus, NearDup}

/** The uncapped exact forms of every shingle-pair / triangle operator are
  * verification-scale only, so they must be explicit opt-ins: maxDf = 0
  * (or maxDegree = None) without `uncapped = true` is a programming error
  * caught at plan time, never a silent quadratic job.
  */
class UncappedOptInSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Seq((1, "a b c d e", "train"), (2, "a b c d f", "test"))
      .toDF("doc_id", "text", "split")
  private lazy val edges = Seq((1, 2), (2, 3)).toDF("a_id", "b_id")

  test("pair joins reject maxDf = 0 without the opt-in") {
    an[IllegalArgumentException] should be thrownBy
      NearDup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.1, maxDf = 0)
    an[IllegalArgumentException] should be thrownBy
      NearDup.ngramContainmentPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.1, maxDf = 0)
    an[IllegalArgumentException] should be thrownBy
      NearDup.lshPlanner(docs, "doc_id", "text", maxDf = 0)
    an[IllegalArgumentException] should be thrownBy
      NearDup.autoThreshold(docs, "doc_id", "text", maxDf = 0)
    an[IllegalArgumentException] should be thrownBy
      Corpus.splitLeakageAudit(docs, "doc_id", "text", "split", n = 3,
        threshold = 0.5, maxDf = 0)
  }

  test("candidate-fed calls are pair-bounded and need no opt-in") {
    val cand = Seq((1, 2)).toDF("a_id", "b_id")
    NearDup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.0, maxDf = 0, candidates = Some(cand))
      .count() shouldBe 1L
  }

  test("explicit uncapped = true unlocks the exact form") {
    NearDup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.0, maxDf = 0, uncapped = true).count() shouldBe 1L
  }

  test("kTruss rejects maxDegree = None without the opt-in") {
    an[IllegalArgumentException] should be thrownBy
      Clusters.kTruss(edges, "a_id", "b_id", k = 3, rounds = 1,
        maxDegree = None)
    // default is capped; explicit opt-in still works
    Clusters.kTruss(edges, "a_id", "b_id", k = 3, rounds = 1)
      .count() shouldBe 0L
    Clusters.kTruss(edges, "a_id", "b_id", k = 3, rounds = 1,
      maxDegree = None, uncapped = true).count() shouldBe 0L
  }
}
