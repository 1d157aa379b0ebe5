package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.streaming.CorpusIntake

/** Streaming corpus intake: two file-drop batches, second-wave near-dups of
  * already-accepted documents must be dropped, and the streamed corpus must
  * equal the one-shot batch resolution of the same documents. */
class CorpusIntakeSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 ~ doc 2 (near-dup, batch 1): components keep min id 1
  // doc 11 ~ doc 1 (near-dup across batches): dropped by the corpus gate
  // doc 12 is novel; doc 13 == doc 12 exactly (within-batch radius-0 dup)
  private val batch1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog today"),
    (3L, "completely different text about spark catalyst optimizer plans"))
  private val batch2 = Seq(
    (11L, "the quick brown fox jumps over the lazy dog tonight"),
    (12L, "a genuinely novel document about distributed joins and shuffles"),
    (13L, "a genuinely novel document about distributed joins and shuffles"))

  test("two-batch intake: within-batch dedup, cross-batch gate, " +
    "stream == one-shot batch resolution") {
    val root = Files.createTempDirectory("graft_intake").toString
    val (in, corpus, ckpt) = (s"$root/in", s"$root/corpus", s"$root/ckpt")
    val schema = batch1.toDF("doc_id", "text").schema

    def drop(docs: Seq[(Long, String)]): Unit =
      docs.toDF("doc_id", "text").write.mode("append").parquet(in)
    def run(): Unit = CorpusIntake.runIncremental(spark, in, schema,
      corpus, ckpt, "doc_id", "text")

    drop(batch1); run()
    val afterB1 = spark.read.parquet(corpus).select("doc_id")
      .as[Long].collect().toSet
    afterB1 shouldBe Set(1L, 3L) // 2 resolved away within batch 1

    drop(batch2); run() // checkpoint: only the new files are processed
    val afterB2 = spark.read.parquet(corpus)
    afterB2.select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L, 12L) // 11 gated by accepted doc 1; 13 deduped within b2
    // accepted rows carry original columns untouched
    afterB2.filter($"doc_id" === 12L).select("text").as[String].head() shouldBe
      batch2(1)._2

    // parity: one-shot batch resolution (min-id keeper) over ALL docs
    val all = (batch1 ++ batch2).toDF("doc_id", "text")
    val oneShot = Corpus.resolveDuplicates(all, "doc_id",
        Corpus.simHashHammingPairs(all, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id")
      .select("doc_id", "text")
    oneShot.collect().map(_.toSeq).toSet shouldBe
      afterB2.select("doc_id", "text").collect().map(_.toSeq).toSet
  }

  test("signature-store intake: same corpus as the text gate, store " +
    "tracks acceptances, accepted text is write-only") {
    val root = Files.createTempDirectory("graft_intake_sig").toString
    val (in, corpus, ckpt, sigs) =
      (s"$root/in", s"$root/corpus", s"$root/ckpt", s"$root/sigs")
    val schema = batch1.toDF("doc_id", "text").schema
    def run(): Unit = CorpusIntake.runIncremental(spark, in, schema,
      corpus, ckpt, "doc_id", "text", signatureDir = Some(sigs))

    batch1.toDF("doc_id", "text").write.mode("append").parquet(in); run()
    batch2.toDF("doc_id", "text").write.mode("append").parquet(in); run()

    val accepted = spark.read.parquet(corpus)
    accepted.select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L, 12L) // identical decisions to the text-gate variant
    // the store mirrors the corpus exactly: one signature per accepted doc
    val store = spark.read.parquet(sigs)
    store.columns.toSeq shouldBe Seq("doc_id", "simhash")
    store.select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 3L, 12L)
    // and the stored fingerprints ARE the accepted docs' fingerprints
    val recomputed = graft.operators.NearDup
      .simHash(accepted, "doc_id", "text", bits = 32)
    store.except(recomputed).count() shouldBe 0
    recomputed.except(store).count() shouldBe 0
  }

  test("per-source quota holds ACROSS batches, remainder chosen by md5 rank") {
    val root = Files.createTempDirectory("graft_intake_quota").toString
    val (in, corpus, ckpt) = (s"$root/in", s"$root/corpus", s"$root/ckpt")
    // mutually non-near-dup texts so only the quota gates
    val b1 = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel", "a"),
      (2L, "completely different text about catalyst optimizer plans", "a"),
      (3L, "unrelated prose concerning streaming watermarks and state", "b"))
    val b2 = Seq(
      (11L, "november oscar papa quebec romeo sierra tango uniform", "a"),
      (12L, "a genuinely novel document about distributed joins", "a"),
      (13L, "yet another singular text on parquet row group pruning", "a"),
      (14L, "fresh content regarding broadcast hash join thresholds", "b"))
    val schema = b1.toDF("doc_id", "text", "source").schema
    def run(): Unit = CorpusIntake.runIncremental(spark, in, schema,
      corpus, ckpt, "doc_id", "text", quota = Some(("source", 3)))

    b1.toDF("doc_id", "text", "source").write.mode("append").parquet(in); run()
    b2.toDF("doc_id", "text", "source").write.mode("append").parquet(in); run()

    val bySource = spark.read.parquet(corpus)
      .select("doc_id", "source").as[(Long, String)].collect()
      .groupBy(_._2).map { case (s, rs) => s -> rs.map(_._1).toSet }
    bySource("a") should have size 3 // 2 from b1 + exactly 1 of b2's 3
    bySource("b") shouldBe Set(3L, 14L) // under quota, all accepted
    // the admitted source-a doc from b2 is the md5-rank minimum
    val md5rank = (id: Long) => java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = Seq(11L, 12L, 13L).minBy(id => (md5rank(id), id))
    bySource("a") shouldBe Set(1L, 2L, expected)
  }

  test("quality gates (gopher + fixed-model cross-entropy) drop inside " +
    "the stream exactly as in batch") {
    val root = Files.createTempDirectory("graft_intake_gates").toString
    val (in, corpus, ckpt) = (s"$root/in", s"$root/corpus", s"$root/ckpt")
    // reference model: common-English prose — docs of these tokens score
    // low CE; gibberish is all-OOV and scores the flat penalty
    val refCorpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog and the cat"),
      (101L, "a document about the spark optimizer and the shuffle plans"))
      .toDF("doc_id", "text")
    val model = Corpus.unigramLogProbs(refCorpus, "doc_id", "text")
      .localCheckpoint()
    val gopher = CorpusIntake.GopherGate(minWords = 5, minMeanWordLen = 2.0,
      maxMeanWordLen = 12.0, minStopwordHits = 1)
    val ceMax = 10.0
    // b1: 1 passes; 2 fails gopher (no stopwords, symbol-free gibberish
    // is caught by CE anyway); 3 fails CE (all-OOV -> 20 nats)
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "zzz"),
      (3L, "qqqq wwww eeee rrrr tttt yyyy uuuu iiii oooo pppp"))
    // b2: 11 near-dups accepted doc 1 (cross-batch gate); 12 passes all
    val b2 = Seq(
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "a document about the spark optimizer and the lazy dog"))
    val schema = b1.toDF("doc_id", "text").schema
    def run(): Unit = CorpusIntake.runIncremental(spark, in, schema,
      corpus, ckpt, "doc_id", "text",
      gopher = Some(gopher), ce = Some(CorpusIntake.CeGate(model, ceMax)))

    b1.toDF("doc_id", "text").write.mode("append").parquet(in); run()
    b2.toDF("doc_id", "text").write.mode("append").parquet(in); run()

    val streamed = spark.read.parquet(corpus)
    streamed.select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 12L)

    // batch parity: the same gates applied one-shot (gates are per-doc
    // against a FIXED model, so they commute with batching), then the
    // same min-id duplicate resolution
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val gophered = Corpus.gopherQualityFlags(all, "doc_id", "text",
        gopher.minWords, gopher.maxWords, gopher.minMeanWordLen,
        gopher.maxMeanWordLen, gopher.maxSymbolRatio, gopher.minAlphaRatio,
        gopher.minStopwordHits)
      .filter($"keep").select("doc_id", "text")
    val ceKept = Corpus.unigramCrossEntropyAgainst(gophered, "doc_id",
        "text", model)
      .filter($"cross_entropy_nats" <= ceMax).select($"doc_id")
    val gated = gophered.join(ceKept, Seq("doc_id"), "left_semi")
    val oneShot = Corpus.resolveDuplicates(gated, "doc_id",
        Corpus.simHashHammingPairs(gated, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id")
      .select("doc_id", "text")
    oneShot.collect().map(_.toSeq).toSet shouldBe
      streamed.select("doc_id", "text").collect().map(_.toSeq).toSet
  }

  test("re-running with no new files appends nothing") {
    val root = Files.createTempDirectory("graft_intake2").toString
    val schema = batch1.toDF("doc_id", "text").schema
    batch1.toDF("doc_id", "text").write.parquet(s"$root/in")
    def run(): Unit = CorpusIntake.runIncremental(spark, s"$root/in", schema,
      s"$root/corpus", s"$root/ckpt", "doc_id", "text")
    run()
    val n1 = spark.read.parquet(s"$root/corpus").count()
    run() // idempotent: checkpoint already covers every input file
    spark.read.parquet(s"$root/corpus").count() shouldBe n1
  }

  test("quota via the persisted counts table == quota via corpus " +
    "re-aggregation, counts table tracks acceptances") {
    val b1 = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel", "a"),
      (2L, "completely different text about catalyst optimizer plans", "a"),
      (3L, "unrelated prose concerning streaming watermarks and state", "b"))
    val b2 = Seq(
      (11L, "november oscar papa quebec romeo sierra tango uniform", "a"),
      (12L, "a genuinely novel document about distributed joins", "a"),
      (13L, "yet another singular text on parquet row group pruning", "a"),
      (14L, "fresh content regarding broadcast hash join thresholds", "b"))
    val schema = b1.toDF("doc_id", "text", "source").schema

    def intake(root: String, countsDir: Option[String]): Set[Long] = {
      def run(): Unit = CorpusIntake.runIncremental(spark, s"$root/in",
        schema, s"$root/corpus", s"$root/ckpt", "doc_id", "text",
        quota = Some(("source", 3)), quotaCountsDir = countsDir)
      b1.toDF("doc_id", "text", "source").write.mode("append")
        .parquet(s"$root/in"); run()
      b2.toDF("doc_id", "text", "source").write.mode("append")
        .parquet(s"$root/in"); run()
      spark.read.parquet(s"$root/corpus").select("doc_id")
        .as[Long].collect().toSet
    }
    val r1 = Files.createTempDirectory("graft_quota_agg").toString
    val r2 = Files.createTempDirectory("graft_quota_store").toString
    val viaAgg = intake(r1, None)
    val viaStore = intake(r2, Some(s"$r2/counts"))
    viaStore shouldBe viaAgg // identical admission decisions
    // the counts table mirrors the accepted corpus exactly
    val counts = spark.read.parquet(s"$r2/counts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = spark.read.parquet(s"$r2/corpus")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts shouldBe bySource
  }

  test("missing counts table falls back to corpus re-aggregation and " +
    "re-seeds itself (enabling the store on an existing corpus)") {
    val b1 = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel", "a"),
      (2L, "completely different text about catalyst optimizer plans", "a"),
      (3L, "unrelated prose concerning streaming watermarks and state", "a"))
    val b2 = Seq(
      (11L, "november oscar papa quebec romeo sierra tango uniform", "a"),
      (12L, "a genuinely novel document about distributed joins", "a"))
    val schema = b1.toDF("doc_id", "text", "source").schema
    val root = Files.createTempDirectory("graft_quota_seed").toString
    def run(countsDir: Option[String]): Unit =
      CorpusIntake.runIncremental(spark, s"$root/in", schema,
        s"$root/corpus", s"$root/ckpt", "doc_id", "text",
        quota = Some(("source", 4)), quotaCountsDir = countsDir)
    // batch 1 WITHOUT the counts store: 3 source-a docs accepted
    b1.toDF("doc_id", "text", "source").write.mode("append")
      .parquet(s"$root/in"); run(None)
    // batch 2 turns the store ON with no table present: the allowance
    // must still see the 3 already in the corpus (admit ONE of b2, not
    // both), and the table must seed to the full corpus counts
    b2.toDF("doc_id", "text", "source").write.mode("append")
      .parquet(s"$root/in"); run(Some(s"$root/counts"))
    val accepted = spark.read.parquet(s"$root/corpus")
      .select("doc_id").as[Long].collect().toSet
    accepted should have size 4 // quota=4 held despite the fresh store
    accepted should contain allOf (1L, 2L, 3L)
    spark.read.parquet(s"$root/counts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("a" -> 4L)
  }
}
