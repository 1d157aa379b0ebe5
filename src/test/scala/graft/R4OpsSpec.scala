package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Similarity}

/** Round-4 operator additions: training shards, token budgets, Gopher
  * quality flags, semantic dedup. */
class R4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- shardForTraining ---------------------------------------------------

  test("shardForTraining: partition of the input, dense per-shard positions") {
    val docs = (0L until 200L).toDF("id")
    val out = Corpus.shardForTraining(docs, "id", nShards = 8, seed = "s1")
      .select($"id", $"shard_id", $"shard_pos")
      .as[(Long, Int, Int)].collect()
    out.map(_._1).sorted shouldBe (0L until 200L).toArray
    all(out.map(_._2)) should (be >= 0 and be < 8)
    // positions within each shard are exactly 1..size
    out.groupBy(_._2).values.foreach { shard =>
      shard.map(_._3).sorted shouldBe (1 to shard.length).toArray
    }
  }

  test("shardForTraining: same seed reproduces, new seed permutes") {
    val docs = (0L until 200L).toDF("id")
    def run(seed: String) =
      Corpus.shardForTraining(docs, "id", nShards = 8, seed = seed)
        .select($"id", $"shard_id", $"shard_pos")
        .as[(Long, Int, Int)].collect().sortBy(_._1)
    run("a") shouldBe run("a")
    run("a") should not be run("b")
  }

  test("shardForTraining: nShards=1 is a total deterministic order") {
    val docs = (0L until 50L).toDF("id")
    val out = Corpus.shardForTraining(docs, "id", nShards = 1)
      .select($"shard_id", $"shard_pos").as[(Int, Int)].collect()
    all(out.map(_._1)) shouldBe 0
    out.map(_._2).sorted shouldBe (1 to 50).toArray
  }

  // ---- capTokensPerSource -------------------------------------------------

  test("capTokensPerSource: kept docs are the md5-rank prefix within budget") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 90L), (6L, "b", 90L)
    ).toDF("id", "src", "n")
    val out = Corpus.capTokensPerSource(docs, "id", "src", $"n", maxTokens = 60)
      .select($"id", $"src", $"cum_tokens").as[(Long, String, Long)].collect()
    // every kept row is within budget
    all(out.map(_._3)) should be <= 60L
    // prefix property: a kept doc's md5 rank is below every dropped doc's
    val rank = docs.select($"id", $"src").as[(Long, String)].collect()
      .groupBy(_._2).map { case (srcKey, rows) =>
        srcKey -> rows.map(_._1)
          .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString, id))
      }
    for ((srcKey, ordered) <- rank) {
      val keptSet = out.filter(_._2 == srcKey).map(_._1).toSet
      val keptPrefix = ordered.takeWhile(keptSet.contains)
      keptSet shouldBe keptPrefix.toSet
    }
  }

  test("capTokensPerSource: zero budget keeps nothing; big budget keeps all") {
    val docs = Seq((1L, "a", 5L), (2L, "a", 5L)).toDF("id", "src", "n")
    Corpus.capTokensPerSource(docs, "id", "src", $"n", 0).count() shouldBe 0
    Corpus.capTokensPerSource(docs, "id", "src", $"n", 100).count() shouldBe 2
  }

  // ---- gopherQualityFlags -------------------------------------------------

  test("gopherQualityFlags: each rule trips on its own pathology") {
    val good = "the quick brown fox jumps over the lazy dog near the old " +
      "river bank and rests in the warm afternoon sun for a while longer"
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to keep"),                   // word count
      (3L, good + " ###### ###### ###### ######"), // symbol ratio
      (4L, ("12345 " * 25).trim),                  // no alpha, no stopwords
      (5L, "")                                     // empty: nothing passes
    ).toDF("id", "text")
    val out = Corpus.gopherQualityFlags(docs, "id", "text",
        minWords = 20, maxWords = 80, minMeanWordLen = 2.0,
        maxMeanWordLen = 10.0, maxSymbolRatio = 0.1, minAlphaRatio = 0.8,
        minStopwordHits = 2)
      .select($"id", $"flag_word_count", $"flag_mean_word_len",
        $"flag_symbol_ratio", $"flag_alpha_ratio", $"flag_stopwords", $"keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    out(1L) shouldBe ((1L, true, true, true, true, true, true))
    out(2L)._2 shouldBe false // word count
    out(2L)._7 shouldBe false
    out(3L)._4 shouldBe false // symbol ratio
    out(3L)._7 shouldBe false
    out(4L)._5 shouldBe false // alpha ratio
    out(4L)._6 shouldBe false // stopwords
    out(5L) shouldBe ((5L, false, false, true, false, false, false))
  }

  test("gopherQualityFlags: stopword hits count DISTINCT stopwords") {
    val docs = Seq((1L, "the the the the the")).toDF("id", "text")
    val out = Corpus.gopherQualityFlags(docs, "id", "text", minWords = 1)
      .select($"stop_hits").as[Int].head()
    out shouldBe 1 // five copies of one stopword is one hit
  }

  // ---- vocabulary / bpePairStats ------------------------------------------

  test("vocabulary: counts, doc frequencies, deterministic rank") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma"),
      (3L, "beta beta beta")
    ).toDF("id", "text")
    val out = Corpus.vocabulary(docs, "id", "text", topK = 2)
      .select($"token", $"n_occurrences", $"n_docs", $"rank")
      .as[(String, Long, Long, Int)].collect().sortBy(_._4)
    out shouldBe Array(("beta", 4L, 2L, 1), ("alpha", 3L, 2L, 2))
  }

  test("vocabulary: global top-k never sorts the whole vocabulary in one " +
      "task (bounded TakeOrderedAndProject / WindowGroupLimit)") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    val plan = Corpus.vocabulary(docs, "id", "text", 10)
      .queryExecution.executedPlan.toString
    // Spark plans rank<=k over a global order as a limit-k partial top-k
    // per partition + merge (TakeOrderedAndProject), or WindowGroupLimit
    // on versions that don't push the limit — either keeps every task's
    // output bounded by k
    assert(plan.contains("TakeOrderedAndProject") ||
      plan.contains("WindowGroupLimit"), plan)
  }

  test("bpePairStats: adjacent in-word character pairs, single chars skipped") {
    val docs = Seq((1L, "abab x cd")).toDF("id", "text")
    // abab -> ab, ba, ab ; x skipped ; cd -> cd
    val out = Corpus.bpePairStats(docs, "text", topK = 10)
      .select($"pair", $"n_occurrences", $"rank")
      .as[(String, Long, Int)].collect().sortBy(_._3)
    out shouldBe Array(("ab", 2L, 1), ("ba", 1L, 2), ("cd", 1L, 3))
  }

  // ---- sampleByScore ------------------------------------------------------

  test("sampleByScore: deterministic, monotone in keepProb, p=0/1 edges") {
    val docs = (0L until 500L).toDF("id")
    def kept(p: Double) = Corpus.sampleByScore(docs, "id", lit(p), "s")
      .select($"id").as[Long].collect().toSet
    kept(0.0) shouldBe empty
    kept(1.0) should have size 500
    val half = kept(0.5)
    half.size.toDouble shouldBe 250.0 +- 60.0 // uniform draw sanity
    // monotone: raising p only ADDS documents
    half.subsetOf(kept(0.8)) shouldBe true
    kept(0.2).subsetOf(half) shouldBe true
    // re-run identical
    kept(0.5) shouldBe half
  }

  // ---- pseudonymizePii ----------------------------------------------------

  test("pseudonymizePii: same value → same token, different → different, " +
      "linkage survives where scrubPii destroys it") {
    val docs = Seq(
      (1L, "mail a@x.com then b@x.com then a@x.com again"),
      (2L, "reply to a@x.com please")
    ).toDF("id", "text")
    val out = Corpus.pseudonymizePii(docs, "id", "text",
        Seq(("email", "[a-z]+@[a-z]+[.][a-z]+", "EM_")))
      .select($"id", $"pseudonymized", $"n_email")
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    out(1L)._3 shouldBe 3
    val toks = "EM_[0-9a-f]{8}".r.findAllIn(out(1L)._2).toSeq
    toks should have size 3
    toks.head shouldBe toks(2)          // a@x.com twice → same token
    toks.head should not be toks(1)     // b@x.com → different token
    // cross-document linkage: a@x.com in doc 2 gets doc 1's token
    "EM_[0-9a-f]{8}".r.findFirstIn(out(2L)._2).get shouldBe toks.head
    // raw values are gone
    out(1L)._2 should not include "a@x.com"
  }

  test("pseudonymizePii: no matches returns text unchanged; nulls stay null") {
    val docs = Seq((1L, "nothing here"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = Corpus.pseudonymizePii(docs, "id", "text",
        Seq(("email", "[a-z]+@[a-z]+[.][a-z]+", "EM_")))
      .select($"id", $"pseudonymized").as[(Long, Option[String])]
      .collect().toMap
    out(1L) shouldBe Some("nothing here")
    out(2L) shouldBe None
  }

  // ---- semanticDedup ------------------------------------------------------

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  test("semanticDedup: near-identical vectors collapse, distinct survive") {
    val emb = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(0.999, 0.01)), // a near-dup pair
      (3L, vec(0.0, 1.0)),                         // orthogonal: survives
      (4L, vec(-0.999, -0.01))                     // anti-parallel: survives
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9)
      .select($"vec_id", $"cluster_id", $"cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    out.map(_._1) shouldBe Array(1L, 3L, 4L)       // min-id keeper
    out.find(_._1 == 1L).get._3 shouldBe 2L
    out.find(_._1 == 3L).get._3 shouldBe 1L
  }

  test("semanticDedup: prefer column picks the keeper, chains collapse") {
    // cosines: 1~2 = 0.8, 2~3 = 0.6, 1~3 = 0 — at threshold 0.55 the
    // chain 1-2-3 collapses to one survivor even though 1 !~ 3
    val emb = Seq(
      (1L, vec(1.0, 0.0), 10), (2L, vec(0.8, 0.6), 99),
      (3L, vec(0.0, 1.0), 50))
      .toDF("vec_id", "embedding", "clicks")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.55, prefer = Some(col("clicks")))
      .select($"vec_id", $"cluster_size").as[(Long, Long)].collect()
    out shouldBe Array((2L, 3L)) // highest clicks in the 3-chain
  }
}
