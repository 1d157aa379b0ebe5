package graft


import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Scale, Similarity}

/** Round-4 wave-3 operators: commonness quality buckets, domain gating,
  * cross-source overlap audit, bloom-pruned join, quantized k-means. */
class R4bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- commonnessBuckets --------------------------------------------------

  test("commonnessBuckets: integer-exact score and threshold bucketing") {
    // 4 docs over a 3-token vocabulary: "a" in 4 docs, "b" in 2, "z" in 1
    val docs = Seq(
      (1L, "a a b"), (2L, "a b"), (3L, "a"), (4L, "a z")
    ).toDF("id", "text")
    val out = Corpus.commonnessBuckets(docs, "id", "text",
        headMinRelDf = 0.80, tailMaxRelDf = 0.70)
      .select($"id", $"n_tokens", $"sum_df", $"rel_mean_df", $"bucket")
      .as[(Long, Int, Long, Double, String)].collect().sortBy(_._1).toList
    // doc 1: tokens a,a,b -> df 4+4+2 = 10, mean 10/3/4 docs
    out.head shouldBe ((1L, 3, 10L, 10.0 / 3 / 4, "head"))
    // doc 4: a,z -> 4+1 = 5, rel mean 5/2/4 = 0.625 -> tail
    out.last shouldBe ((4L, 2, 5L, 5.0 / 2 / 4, "tail"))
    // doc 3: a -> 4/1/4 = 1.0 head; doc 2: (4+2)/2/4 = 0.75 middle
    out(1)._5 shouldBe "middle"
    out(2)._5 shouldBe "head"
  }

  test("commonnessBuckets: thresholds are scale-free (duplicated corpus)") {
    val docs = Seq((1L, "a a b"), (2L, "a b"), (3L, "a"), (4L, "a z"))
      .toDF("id", "text")
    val dup = docs.union(docs.withColumn("id", $"id" + 10))
    def buckets(df: org.apache.spark.sql.DataFrame) =
      Corpus.commonnessBuckets(df, "id", "text", 0.80, 0.70)
        .select(($"id" % 10).as("k"), $"bucket").as[(Long, String)]
        .collect().toMap
    // every doc keeps its bucket when the corpus doubles
    buckets(dup).filter(_._1 <= 4) shouldBe buckets(docs)
  }

  // ---- domainOf / domainGate ----------------------------------------------

  test("domainOf: scheme/port/path/query stripped, case-folded") {
    val urls = Seq(
      "https://Sub.Example.COM/path?q=1",
      "http://example.org:8080/x",
      "ftp://files.example.net",
      "not a url"
    ).toDF("url")
    urls.select(Corpus.domainOf($"url")).as[String].collect().toList shouldBe
      List("sub.example.com", "example.org", "files.example.net", "")
  }

  test("domainGate: NULL/unparseable urls survive as domain '' (not dropped)") {
    val docs = Seq((1L, "https://ok.example.com/x"),
      (2L, null.asInstanceOf[String]), (3L, "not a url at all"))
      .toDF("id", "url")
    val block = Seq(Tuple1("blocked.example.com")).toDF("dom")
    val out = Corpus.domainGate(docs, "id", "url", block, "dom")
      .select($"id", $"domain", $"n_domain_docs")
      .as[(Long, String, Long)].collect()
      .map { case (i, d, n) => i -> ((d, n)) }.toMap
    out(1L) shouldBe (("ok.example.com", 1L))
    // NULL url and unparseable url fold to '' and are counted together
    out(2L) shouldBe (("", 2L))
    out(3L) shouldBe (("", 2L))
  }

  test("domainGate: blocklist drops whole domains; counts cover survivors") {
    val docs = Seq(
      (1L, "https://keep.example.com/a"), (2L, "https://keep.example.com/b"),
      (3L, "https://BAD.example.com/x"), (4L, "https://other.net/y")
    ).toDF("id", "url")
    val block = Seq("bad.example.com").toDF("dom")
    val gated = Corpus.domainGate(docs, "id", "url", block, "dom")
      .select($"id", $"domain", $"n_domain_docs")
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    gated.map(_._1) shouldBe List(1L, 2L, 4L)
    gated.filter(_._2 == "keep.example.com").map(_._3) shouldBe List(2L, 2L)
    gated.last._3 shouldBe 1L
  }

  // ---- crossSourceOverlap ---------------------------------------------------

  test("crossSourceOverlap: shared shingle types and exact jaccard") {
    val docs = Seq(
      (1L, "x", "one two three four"), // shingles: {1-2-3, 2-3-4}
      (2L, "y", "one two three"),      // {1-2-3}
      (3L, "z", "five six seven")      // {5-6-7}
    ).toDF("id", "src", "text")
    val out = Corpus.crossSourceOverlap(docs, "id", "text", "src", 3)
      .select($"source_a", $"source_b", $"n_shared", $"n_shingles_a",
        $"n_shingles_b", $"jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect().toList
    // only (x, y) shares anything; pairs with zero overlap are absent
    out shouldBe List(("x", "y", 1L, 2L, 1L, 0.5))
  }

  test("crossSourceOverlap: duplicate shingles within a source count once") {
    val docs = Seq(
      (1L, "x", "a b c a b c"), // shingle types {a-b-c, b-c-a, c-a-b}
      (2L, "y", "a b c")
    ).toDF("id", "src", "text")
    val out = Corpus.crossSourceOverlap(docs, "id", "text", "src", 3)
      .select($"n_shared", $"n_shingles_a", $"n_shingles_b")
      .as[(Long, Long, Long)].collect().toList
    out shouldBe List((1L, 3L, 1L))
  }

  // ---- bloomPrunedJoin ------------------------------------------------------

  test("bloomPrunedJoin: output equals the plain join exactly") {
    val big = (0L until 5000L).map(i => (i % 400, i)).toDF("k", "v")
    val small = (0L until 40L).map(i => (i * 3, s"d$i")).toDF("k", "label")
    val plain = big.join(small, "k")
    val pruned = Scale.bloomPrunedJoin(big, small, "k",
      expectedItems = 1000L, fpp = 0.01)
    pruned.count() shouldBe plain.count()
    pruned.except(plain).count() shouldBe 0
    plain.except(pruned).count() shouldBe 0
  }

  test("bloomPrunedJoin: big side is filtered BEFORE its exchange") {
    // parquet-backed big side: a LocalRelation would let the optimizer
    // eagerly fold the probe filter out of the plan
    val dir = java.nio.file.Files.createTempDirectory("bloom_big").toString
    (0L until 5000L).map(i => (i % 400, i)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val big = spark.read.parquet(dir)
    val small = (0L until 40L).map(i => (i * 3, s"d$i")).toDF("k", "label")
    // defeat broadcast so the join actually shuffles the big side
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    saved.foreach { case (k, _) => conf.set(k, "-1") }
    try {
      val plan = Scale.bloomPrunedJoin(big, small, "k", 1000L, 0.01)
        .queryExecution.executedPlan.toString
      // the join shuffles, and the bloom probe (a UDF filter) sits BELOW
      // the exchange — deeper nodes print later in the tree string
      plan should include("Exchange hashpartitioning")
      plan should include("UDF")
      assert(plan.indexOf("UDF") > plan.indexOf("Exchange hashpartitioning"),
        s"bloom probe not below the shuffle in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("bloomPrunedJoin: rejects non-long keys") {
    val strKeyed = Seq(("a", 1)).toDF("k", "v")
    an[IllegalArgumentException] should be thrownBy
      Scale.bloomPrunedJoin(strKeyed, strKeyed, "k", 10L, 0.01)
  }

  // ---- kmeansAssignQuantized -------------------------------------------------

  private def vecs(n: Int, dim: Int) = {
    // three well-separated direction groups + noise
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val base = Array.fill(dim)(0.05f * (rnd.nextFloat() - 0.5f))
      base(i % 3) = 1.0f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("kmeansAssignQuantized: total assignment, ids in range, deterministic") {
    val e = vecs(90, 8)
    def run() = Similarity.kmeansAssignQuantized(e, "vec_id", "embedding",
        k = 3, iters = 2)
      .select($"vec_id", $"cluster_id", $"cluster_cos")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toList
    val out = run()
    out.map(_._1) shouldBe (0L until 90L).toList // every vector exactly once
    all(out.map(_._2)) should (be >= 0 and be < 3)
    out shouldBe run() // bit-identical re-run
  }

  test("kmeansAssignQuantized: training recovers the 3 planted groups") {
    val e = vecs(90, 8)
    val out = Similarity.kmeansAssignQuantized(e, "vec_id", "embedding",
        k = 3, iters = 3)
      .select($"vec_id", $"cluster_id").as[(Long, Int)].collect()
    // after training, each planted group maps to one dominant cluster
    val purity = out.groupBy(_._1 % 3).values.map { g =>
      g.groupBy(_._2).values.map(_.size).max.toDouble / g.size
    }.min
    purity should be >= 0.9
  }

  test("kmeansAssignQuantized: iters=0 assigns against the raw seeds") {
    val e = vecs(30, 8)
    val seeded = Similarity.kmeansAssignQuantized(e, "vec_id", "embedding",
      k = 3, iters = 0).select($"vec_id", $"cluster_id")
    // reference: cosine against the k smallest-md5 codes, max wins
    seeded.count() shouldBe 30L
  }
}
