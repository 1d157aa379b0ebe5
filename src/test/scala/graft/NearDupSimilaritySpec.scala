package graft

import org.apache.spark.sql.functions._

import graft.operators.{NearDup, Similarity}

class NearDupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the sleepy dog"), // near-dup of 1
    (3, "completely different text about spark catalyst plans"),
    (4, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("id", "text")

  test("ngramJaccardPairs finds the near-dup pair and scores the exact dup 1.0") {
    val pairs = NearDup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = 0.3)
      .orderBy("a_id", "b_id")
      .select("a_id", "b_id", "jaccard").as[(Int, Int, Double)].collect().toSeq
    pairs.map(p => (p._1, p._2)) shouldBe Seq((1, 2), (1, 4), (2, 4))
    pairs.find(p => p._1 == 1 && p._2 == 4).get._3 shouldBe 1.0
    pairs.find(p => p._1 == 1 && p._2 == 2).get._3 should be < 1.0
  }

  test("ngramJaccardPairs maxDf cap drops hot shingles from both " +
    "intersection and set sizes") {
    // shingles shared by all three docs have df=3; cap at 2 removes them,
    // so only the doc1/doc2 overlap that is NOT corpus-wide survives
    val trio = Seq(
      (1, "alpha beta gamma delta epsilon zeta"),
      (2, "alpha beta gamma delta epsilon eta"),
      (3, "alpha beta gamma theta iota kappa")
    ).toDF("id", "text")
    val uncapped = NearDup.ngramJaccardPairs(trio, "id", "text", n = 3,
      threshold = 0.0, maxDf = 0, uncapped = true)
      .select("a_id", "b_id", "jaccard").as[(Int, Int, Double)]
      .collect().map(p => (p._1, p._2) -> p._3).toMap
    val capped = NearDup.ngramJaccardPairs(trio, "id", "text", n = 3,
      threshold = 0.0, maxDf = 2)
      .select("a_id", "b_id", "jaccard").as[(Int, Int, Double)]
      .collect().map(p => (p._1, p._2) -> p._3).toMap
    // "alpha beta gamma" (df=3) is capped away: the 1-3 / 2-3 pairs shared
    // ONLY that stop-shingle, so they vanish entirely
    uncapped.keySet shouldBe Set((1, 2), (1, 3), (2, 3))
    capped.keySet shouldBe Set((1, 2))
    // and the surviving pair is scored over the reduced universe:
    // 3 of 5 shingles shared uncapped; 2 of 4 shared once the stop-shingle
    // is gone from both intersection AND set sizes
    uncapped((1, 2)) shouldBe 0.6 +- 1e-12
    capped((1, 2)) shouldBe 0.5 +- 1e-12
  }

  test("ngramJaccardPairs candidates mode scores only the given pairs") {
    val cand = Seq((1, 2)).toDF("a_id", "b_id")
    val pairs = NearDup.ngramJaccardPairs(docs, "id", "text", n = 3,
      threshold = 0.0, maxDf = 0, candidates = Some(cand))
      .select("a_id", "b_id").as[(Int, Int)].collect().toSet
    pairs shouldBe Set((1, 2)) // (1,4)/(2,4) never scored
    // scores agree with the all-pairs path
    val full = NearDup.ngramJaccardPairs(docs, "id", "text", n = 3,
      threshold = 0.0, maxDf = 0, uncapped = true)
      .filter($"a_id" === 1 && $"b_id" === 2)
      .select("jaccard").as[Double].head()
    NearDup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = 0.0,
        maxDf = 0, candidates = Some(cand))
      .select("jaccard").as[Double].head() shouldBe full
  }

  test("minHashLshCandidates surfaces near-dups without a full cross join") {
    val cand = NearDup.minHashLshCandidates(docs, "id", "text",
        shingleN = 3, numHashes = 12, bandSize = 3)
      .as[(Int, Int)].collect().toSet
    cand should contain((1, 4)) // identical docs always collide
    // doc 3 shares no shingles: can never band-collide with anything
    cand.exists(p => p._1 == 3 || p._2 == 3) shouldBe false
  }

  test("simHash: identical docs identical hash; near-dups within small hamming") {
    val hashes = NearDup.simHash(docs, "id", "text").orderBy("doc_id")
      .select("simhash").as[Long].collect()
    hashes(0) shouldBe hashes(3)
    java.lang.Long.bitCount(hashes(0) ^ hashes(1)) should be <= 8
    java.lang.Long.bitCount(hashes(0) ^ hashes(2)) should be > 8
  }

  private lazy val embs = Seq(
    (0, Array(1.0f, 0.0f, 0.0f)),
    (1, Array(0.9f, 0.1f, 0.0f)),
    (2, Array(0.0f, 1.0f, 0.0f)),
    (3, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosineTopK: exact ranking by cosine for each query") {
    val out = Similarity.cosineTopK(embs, "vec_id", "embedding",
        $"vec_id" === 0, k = 3)
      .orderBy("rank").select("n_id").as[Int].collect().toSeq
    out shouldBe Seq(1, 2, 3) // most to least similar to [1,0,0]
  }

  test("cosine column: orthogonal=0, identical=1, opposite=-1") {
    val c = embs.as("a").crossJoin(embs.as("b"))
      .filter($"a.vec_id" === 0)
      .select($"b.vec_id".as("id"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .orderBy("id").as[(Int, Double)].collect().map(_._2)
    c(0) shouldBe 1.0 +- 1e-9
    c(2) shouldBe 0.0 +- 1e-9
    c(3) shouldBe -1.0 +- 1e-9
  }

  test("lshBucketed: same vector same bucket; bucket sizes consistent") {
    val dup = embs.union(embs.filter($"vec_id" === 0)
      .select(lit(9).as("vec_id"), $"embedding"))
    val out = Similarity.lshBucketed(dup, "vec_id", "embedding",
      numPlanes = 8, dim = 3)
    val buckets = out.select("vec_id", "bucket").as[(Int, Int)].collect().toMap
    buckets(0) shouldBe buckets(9)
    // bucket_size equals the actual bucket population
    val sizes = out.groupBy("bucket").count()
      .join(out.select("bucket", "bucket_size").distinct(), "bucket")
      .filter($"count" =!= $"bucket_size").count() shouldBe 0
  }

  test("simHash: fused SimHashPack expression == explode+SUM aggregate") {
    import graft.functions.TextFunctions
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the the the repeated repeated tokens vote with multiplicity"),
      (3L, "unicode café naïve 日本語 tokens"),
      (4L, ""),   // token-less: must emit NO row in either formulation
      (5L, "  "), // whitespace-only: same
      (6L, "x")
    ).toDF("doc_id", "text")
    for (bits <- Seq(16, 32, 64)) {
      // the pre-expression aggregate formulation, verbatim
      val tok = fixture.select($"doc_id",
          explode(TextFunctions.tokens($"text")).as("__t"))
        .withColumn("__h", md5($"__t"))
      val sums = (0 until bits).map { j =>
        val nib = conv(substring($"__h", j / 4 + 1, 1), 16, 10).cast("int")
        val bit = shiftright(nib, j % 4).bitwiseAND(lit(1))
        sum(bit * lit(2) - lit(1)).as(s"__s$j")
      }
      val legacy = tok.groupBy($"doc_id").agg(sums.head, sums.tail: _*)
        .withColumn("simhash",
          (0 until bits).map(j =>
            when(col(s"__s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _))
        .select($"doc_id", $"simhash")
        .as[(Long, Long)].collect().sortBy(_._1)
      val fused = NearDup.simHash(fixture, "doc_id", "text", bits)
        .as[(Long, Long)].collect().sortBy(_._1)
      fused shouldBe legacy
      fused.map(_._1) shouldBe Array(1L, 2L, 3L, 6L) // 4, 5 emit no row
    }
  }

  test("simHash: duplicate ids emit one fingerprint row EACH (per-row " +
      "contract, not the old vote-merge)") {
    val dup = Seq((1L, "alpha beta gamma"), (1L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = NearDup.simHash(dup, "doc_id", "text", 32)
      .as[(Long, Long)].collect()
    out.length shouldBe 2
    // each row's fingerprint is its own text's, not a blend
    val single = NearDup.simHash(
        Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"),
        "doc_id", "text", 32)
      .as[(Long, Long)].head()._2
    out.map(_._2) should contain(single)
  }

  test("simHash: fingerprinting is a scalar projection — no aggregate, " +
      "no exchange beyond the spread repartition") {
    val plan = NearDup.simHash(docs.withColumn("id", $"id".cast("long")),
      "id", "text", 32).queryExecution.executedPlan.toString
    plan should not include "HashAggregate"
    "Exchange".r.findAllIn(plan).size shouldBe 1 // the spread only
  }

  // ---- sortedNeighborhoodPairs --------------------------------------------

  test("sortedNeighborhoodPairs: exactly the window-adjacent rank pairs") {
    // keys sort as b1 < b2 < b3 < z9 regardless of the id order
    val df = Seq((10L, "b2"), (20L, "z9"), (30L, "b1"), (40L, "b3"))
      .toDF("id", "k")
    val out = NearDup.sortedNeighborhoodPairs(df, "id", col("k"), window = 2)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("rank_gap"))).toSet
    // sorted order: 30(b1), 10(b2), 40(b3), 20(z9); gap-1 pairs only
    out shouldBe Set((30L, 10L, 1), (10L, 40L, 1), (40L, 20L, 1))
  }

  test("sortedNeighborhoodPairs: window spans bucket boundaries") {
    val df = (1L to 100L).map(i => (i, f"k$i%03d")).toDF("id", "k")
    val out = NearDup.sortedNeighborhoodPairs(df, "id", col("k"),
      window = 3, buckets = 7)
    // N*(w-1) - sum_{g<w} (w-g-1)... = exact candidate count: for each of
    // the 100 ranked rows, gaps 1..2 where the partner exists
    out.count() shouldBe (99L + 98L)
    // candidates are invariant to the bucket count (boundaries move,
    // ranks do not)
    val one = NearDup.sortedNeighborhoodPairs(df, "id", col("k"),
      window = 3, buckets = 1)
    rowsAsStrings(out.orderBy("a_id", "b_id")) shouldBe
      rowsAsStrings(one.orderBy("a_id", "b_id"))
  }
}
