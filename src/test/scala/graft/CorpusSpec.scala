package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.{Corpus, NearDup}

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate: overlap counted against the eval shingle universe") {
    val corpus = Seq(
      (1, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma"
      (2, "zeta eta theta iota kappa")       // shares nothing
    ).toDF("id", "text")
    val eval = Seq((100, "alpha beta gamma mu nu")).toDF("id", "text")
    val out = Corpus.decontaminate(corpus, eval, "id", "text", n = 3,
        maxOverlapRatio = 0.3)
      .select($"doc_id", $"n_shingles", $"n_overlap", $"contaminated")
      .as[(Int, Int, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    out(1) shouldBe ((1, 3, 1L, true)) // 1 of 3 shingles is in the eval set
    out(2) shouldBe ((2, 3, 0L, false))
  }

  test("packSequences: contiguous fill, docs may straddle bin boundaries") {
    val docs = Seq((1, 60), (2, 50), (3, 30), (4, 10)).toDF("id", "n")
    val out = Corpus.packSequences(docs, "id", shard = lit(0),
        tokenCount = $"n", budget = 100)
      .select($"doc_id", $"start_offset", $"bin", $"bin_offset")
      .as[(Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out(1) shouldBe ((1, 0L, 0L, 0L))
    out(2) shouldBe ((2, 60L, 0L, 60L))  // starts in bin 0, spills into 1
    out(3) shouldBe ((3, 110L, 1L, 10L))
    out(4) shouldBe ((4, 140L, 1L, 40L))
  }

  test("packSequences: shards pack independently") {
    val docs = Seq((1, 70), (2, 70), (3, 70)).toDF("id", "n")
    val bins = Corpus.packSequences(docs, "id", shard = $"id" % 2,
        tokenCount = $"n", budget = 100)
      .select($"doc_id", $"shard", $"bin").as[(Int, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    bins(1) shouldBe ((1L, 0L)) // shard 1: offsets 0, 70
    bins(3) shouldBe ((1L, 0L))
    bins(2) shouldBe ((0L, 0L)) // alone in shard 0
  }

  test("mixSources: weights upsample by repetition, downsample " +
    "deterministically, drop at zero") {
    val docs = (1 to 400).map(i =>
      (i.toLong, s"s${i % 4}")).toDF("doc_id", "source")
    val out = Corpus.mixSources(docs, "doc_id", "source",
        Map("s0" -> 3.0, "s1" -> 0.5, "s2" -> 0.0))
      .cache()
    // integer weight 3.0: every s0 doc appears exactly 3x, copy_ids 1..3
    out.filter($"source" === "s0").groupBy("doc_id").count()
      .select(countDistinct($"count")).as[Long].head() shouldBe 1
    out.filter($"source" === "s0").count() shouldBe 300
    out.filter($"source" === "s0").agg(max($"copy_id")).as[Int].head() shouldBe 3
    // 0.5: a deterministic ~half survive, once each
    val s1 = out.filter($"source" === "s1").count()
    s1 should (be >= 30L and be <= 70L)
    out.filter($"source" === "s1").agg(max($"copy_id")).as[Int].head() shouldBe 1
    // 0.0 drops the source entirely; unlisted sources keep 1 copy
    out.filter($"source" === "s2").count() shouldBe 0
    out.filter($"source" === "s3").count() shouldBe 100
    // re-run selects the SAME survivors (hash-determinism, no RNG)
    val again = Corpus.mixSources(docs, "doc_id", "source",
      Map("s0" -> 3.0, "s1" -> 0.5, "s2" -> 0.0))
    again.except(out).count() shouldBe 0
    out.unpersist()
    ()
  }

  test("scrubPii: global redaction, per-rule counts on the original text") {
    val df = Seq((1, "mail a@b.com and c@d.org, call 12-345-678-9012")).
      toDF("id", "text")
    val out = Corpus.scrubPii(df, "id", "text", Seq(
        ("email", "[a-z]+@[a-z]+[.][a-z]+", "<EMAIL>"),
        ("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>")))
      .as[(Int, String, Int, Int)].head()
    out._2 shouldBe "mail <EMAIL> and <EMAIL>, call <PHONE>"
    out._3 shouldBe 2
    out._4 shouldBe 1
  }

  test("decontaminate composes with a streaming corpus (stream-static " +
    "broadcast join + stateful agg) and matches the batch result") {
    implicit val sc = spark.sqlContext
    val evalSet = Seq((100, "alpha beta gamma mu nu")).toDF("id", "text")
    val batchDocs = Seq(
      (1, "alpha beta gamma delta epsilon"),
      (2, "zeta eta theta iota kappa")).toDF("id", "text")
    val mem = MemoryStream[(Int, String)]
    val q = Corpus.decontaminate(mem.toDF.toDF("id", "text"), evalSet,
        "id", "text", n = 3, maxOverlapRatio = 0.3)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("complete").start()
    mem.addData((1, "alpha beta gamma delta epsilon"),
      (2, "zeta eta theta iota kappa"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("decon_stream").collect().toSet
    val batch = Corpus.decontaminate(batchDocs, evalSet, "id", "text",
      n = 3, maxOverlapRatio = 0.3).collect().toSet
    streamed shouldBe batch
  }

  test("chunkDocuments: overlap carried, tail kept, redundant tail dropped") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Corpus.chunkDocuments(Seq((1, words)).toDF("id", "text"),
        "id", "text", chunkSize = 50, overlap = 10)
      .select($"chunk_id", $"start_tok", $"n_tok", $"chunk_text")
      .as[(Int, Int, Int, String)].collect().sortBy(_._1)
    out.map(c => (c._1, c._2, c._3)) shouldBe
      Seq((0, 0, 50), (1, 40, 50), (2, 80, 20))
    // the overlap region is shared verbatim between consecutive chunks
    out(0)._4.split(" ").takeRight(10) shouldBe out(1)._4.split(" ").take(10)
    out(2)._4.split(" ").head shouldBe "w81"

    // 90 tokens: start 80 adds nothing beyond chunk [40,90) -> dropped
    val w90 = (1 to 90).map(i => s"w$i").mkString(" ")
    Corpus.chunkDocuments(Seq((1, w90)).toDF("id", "text"), "id", "text",
        chunkSize = 50, overlap = 10)
      .select($"start_tok").as[Int].collect().sorted shouldBe Seq(0, 40)
    // short doc -> exactly one whole-doc chunk; empty doc -> nothing
    Corpus.chunkDocuments(Seq((1, "a b c"), (2, " ")).toDF("id", "text"),
        "id", "text", chunkSize = 50, overlap = 10)
      .select($"doc_id", $"n_tok", $"chunk_text").as[(Int, Int, String)]
      .collect().toSeq shouldBe Seq((1, 3, "a b c"))
  }

  test("simHashHammingPairs: banding finds exactly the brute-force pairs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val banded = Corpus.simHashHammingPairs(docs, "doc_id", "text",
        maxHamming = 3)
      .select($"a_id", $"b_id", $"hamming").as[(Long, Long, Int)]
      .collect().toSet
    val sig = NearDup.simHash(docs, "doc_id", "text")
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .filter($"h" <= 3).as[(Long, Long, Int)].collect().toSet
    banded shouldBe brute
    banded should not be empty
  }

  test("simHashHammingPairs at 64 bits (16-bit bands) still matches brute " +
    "force — the corpus-scale configuration") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val banded = Corpus.simHashHammingPairs(docs, "doc_id", "text",
        maxHamming = 3, bits = 64)
      .select($"a_id", $"b_id", $"hamming").as[(Long, Long, Int)]
      .collect().toSet
    val sig = NearDup.simHash(docs, "doc_id", "text", bits = 64)
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .filter($"h" <= 3).as[(Long, Long, Int)].collect().toSet
    banded shouldBe brute
  }

  test("dedupeAgainstCorpus drops batch docs near an existing doc, keeps " +
    "the rest intact") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val batch = Seq(
      // identical to corpus doc 1 -> hamming 0 -> dropped
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      // unrelated -> survives with all columns
      (11L, "completely different words nowhere near anything"))
      .toDF("doc_id", "text")
    val out = Corpus.dedupeAgainstCorpus(batch, corpus, "doc_id", "text",
      maxHamming = 3)
    out.columns.toSeq shouldBe Seq("doc_id", "text")
    out.select($"doc_id").as[Long].collect().toSeq shouldBe Seq(11L)
  }

  test("dedupeAgainstSignatures == dedupeAgainstCorpus (store == recompute)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = docs.filter($"doc_id" % 10 === 9)
    val corpus = docs.filter($"doc_id" % 10 =!= 9)
    val viaText = Corpus.dedupeAgainstCorpus(batch, corpus, "doc_id", "text",
      maxHamming = 3)
    // the persisted-store shape: 8 bytes/doc, no text column at all —
    // materialized here so the gate's plan provably cannot re-read corpus
    // text (there is none to read)
    val store = NearDup.simHash(corpus, "doc_id", "text", bits = 32)
      .localCheckpoint()
    store.columns.toSeq shouldBe Seq("doc_id", "simhash")
    val viaStore = Corpus.dedupeAgainstSignatures(batch, store, "doc_id",
      "text", maxHamming = 3)
    viaStore.count() shouldBe viaText.count()
    viaText.except(viaStore).count() shouldBe 0
    viaStore.except(viaText).count() shouldBe 0
  }

  test("capPerSource: deterministic quota per source, rank-limit pushed " +
    "before the exchange") {
    val docs = (1L to 70L)
      .map(i => (i, if (i <= 60) "mega" else "small", s"text $i"))
      .toDF("doc_id", "source", "text")
    val capped = Corpus.capPerSource(docs, "doc_id", "source", maxDocs = 10)
    capped.groupBy("source").count().as[(String, Long)].collect().toSet shouldBe
      Set(("mega", 10L), ("small", 10L))
    capped.agg(max($"source_rank")).as[Int].head() shouldBe 10
    // stable across runs (md5 ranking, no RNG)
    Corpus.capPerSource(docs, "doc_id", "source", maxDocs = 10)
      .select("doc_id").except(capped.select("doc_id")).count() shouldBe 0
    // Spark plans the rank filter as WindowGroupLimit: per-task top-k
    // BEFORE the shuffle, so a mega-source never concentrates unbounded
    capped.queryExecution.executedPlan.toString should
      include("WindowGroupLimit")
  }

  test("simHashHammingPairs rejects a radius the banding cannot guarantee") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 4,
        numBands = 4)
  }

  test("bandMask at 64 band bits is all-ones, not zero (shift wraps mod 64)") {
    Corpus.bandMask(64) shouldBe -1L
    Corpus.bandMask(16) shouldBe 0xFFFFL
    Corpus.bandMask(8) shouldBe 0xFFL
  }

  test("bits=64 single band (maxHamming=0) finds exactly the " +
    "identical-fingerprint pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical -> hamming 0
      (3L, "completely different words nowhere near anything else at all"))
      .toDF("doc_id", "text")
    Corpus.simHashHammingPairs(docs, "doc_id", "text",
        maxHamming = 0, bits = 64, numBands = 1)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet shouldBe
      Set((1L, 2L))
    Corpus.dedupeAgainstCorpus(
        Seq((10L, "alpha beta gamma delta epsilon zeta"),
            (11L, "fresh unseen content")).toDF("doc_id", "text"),
        docs, "doc_id", "text", maxHamming = 0, bits = 64, numBands = 1)
      .select($"doc_id").as[Long].collect().toSeq shouldBe Seq(11L)
  }

  test("charEntropy: uniform alphabet hits ln(k), single-char text " +
    "scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd"),       // uniform over 4 chars -> ln 4
      (2L, "aaaaaaaa"),   // single char -> 0
      (3L, "")            // empty -> absent
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("char_entropy_nats")).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L) shouldBe math.log(4.0) +- 1e-6
    out(2L) shouldBe 0.0 +- 1e-9
  }

  test("wordDropout: deterministic across evaluations, order preserved, " +
    "rate in the right ballpark") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 400).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    def run() = graft.operators.Corpus.wordDropout(docs, "doc_id", "text",
        dropPermille = 250)
      .collect().map(r => (r.getAs[String]("text_aug"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).head
    val (aug1, kept, dropped) = run()
    run() shouldBe ((aug1, kept, dropped)) // md5 coin: no RNG state
    kept + dropped shouldBe 400L
    dropped.toDouble should (be > 400 * 0.15 and be < 400 * 0.35)
    // kept tokens appear in original order
    val keptToks = aug1.split(" ").toSeq
    keptToks shouldBe keptToks.sortBy(t => t.drop(1).toInt)
    // salt changes the coin
    val other = graft.operators.Corpus.wordDropout(docs, "doc_id", "text",
        dropPermille = 250, salt = "aug1")
      .collect().head.getAs[String]("text_aug")
    other should not be aug1
  }
}
