package graft

import org.apache.spark.sql.functions._

import graft.operators.{NearDup, NearDupIndex}

/** Hot-band cap on the MinHash-LSH candidate tier (the band-space twin
  * of the hot-shingle maxDf cap): a replica clique — identical text, so
  * EVERY band bucket holds the whole clique — must not detonate into
  * quadratic candidate pairs, while genuine small-bucket near-dups keep
  * pairing. Covers the in-memory generator, the conf default, and the
  * persisted index (cap pinned at build, immune to later conf drift). */
class NearDupHotBandSpec extends SparkSpec {
  import spark.implicits._

  // identical text ⇒ identical MinHash signatures ⇒ all 4 band buckets
  // hold the entire clique: the boilerplate/mirror pathology
  private def clique(from: Int, to: Int) = (from to to).map(i =>
    (s"c$i", "replica boilerplate page body repeated verbatim across " +
      "mirrored hosts every single day"))

  // a genuine duplicate pair whose buckets hold exactly 2 postings
  private val realPair = Seq(
    ("r1", "the quick brown fox jumps over the lazy dog again and again"),
    ("r2", "the quick brown fox jumps over the lazy dog again and again"))

  private val noise = Seq(
    ("n1", "entirely different content about spark catalyst optimizers"),
    ("n2", "completely unrelated text concerning csv ingestion quirks"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("a replica clique saturates its buckets and is dropped by the " +
      "cap; small buckets still pair") {
    val docs = (clique(1, 30) ++ realPair ++ noise).toDF("doc_id", "text")
    val uncapped = NearDup.minHashLshCandidates(docs, "doc_id", "text",
      maxBucket = 0L)
    val cliquePairs = uncapped.filter(col("a_id").startsWith("c") &&
      col("b_id").startsWith("c"))
    cliquePairs.count() shouldBe 435L // C(30,2): the quadratic detonation
    val capped = NearDup.minHashLshCandidates(docs, "doc_id", "text",
      maxBucket = 10L)
    val cappedPairs = pairsOf(capped)
    cappedPairs.count(p => p._1.startsWith("c")) shouldBe 0
    cappedPairs should contain(("r1", "r2")) // bucket of 2 survives
  }

  test("capped == uncapped when no bucket exceeds the cap (the oracle-" +
      "stability property), and the conf default applies") {
    val docs = (clique(1, 5) ++ realPair ++ noise).toDF("doc_id", "text")
    val uncapped = NearDup.minHashLshCandidates(docs, "doc_id", "text",
      maxBucket = 0L)
    val capped = NearDup.minHashLshCandidates(docs, "doc_id", "text",
      maxBucket = 10L)
    pairsOf(capped) shouldBe pairsOf(uncapped)
    // default argument reads the session conf
    spark.conf.set(NearDup.MaxBandBucketKey, "3")
    try {
      val viaConf = NearDup.minHashLshCandidates(docs, "doc_id", "text")
      pairsOf(viaConf).count(p => p._1.startsWith("c")) shouldBe 0
      pairsOf(viaConf) should contain(("r1", "r2"))
    } finally spark.conf.unset(NearDup.MaxBandBucketKey)
  }

  test("persisted index pins the cap at build: a hot bucket spanning " +
      "batches is dropped at serve time regardless of session conf") {
    val root = java.nio.file.Files.createTempDirectory("graft_ndhb").toString
    spark.conf.set("spark.sql.catalog.graft_ndhb",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ndhb.root", root)
    val base = (clique(1, 15) ++ realPair.take(1) ++ noise)
      .toDF("doc_id", "text")
    val fresh = (clique(16, 30) ++ realPair.drop(1)).toDF("doc_id", "text")
    NearDupIndex.build(spark, "graft_ndhb", "ns", "idx", base, "doc_id",
      "text", maxBucket = 10L)
    NearDupIndex.indexBatch(spark, "graft_ndhb", "ns", "idx", fresh,
      "doc_id", "text", "b1")
    NearDupIndex.pinnedMaxBucket(spark, "graft_ndhb", "ns", "idx") shouldBe 10L
    // bucket counts are over the WHOLE table: 15 base + 15 fresh clique
    // postings saturate every clique bucket even though neither batch
    // alone would; the cross-batch genuine pair survives
    spark.conf.set(NearDup.MaxBandBucketKey, "0") // serve must ignore this
    try {
      val served = pairsOf(NearDupIndex.candidatePairsFor(
        spark, "graft_ndhb", "ns", "idx", "b1"))
      served.count(p => p._1.startsWith("c")) shouldBe 0
      served should contain(("r1", "r2"))
      val all = pairsOf(NearDupIndex.allCandidatePairs(
        spark, "graft_ndhb", "ns", "idx"))
      all.count(p => p._1.startsWith("c")) shouldBe 0
      all should contain(("r1", "r2"))
      // the cap is never silent: the index's audit reports exactly what
      // it discarded — the 30-doc clique's 4 band buckets, 120 postings
      val audit = NearDupIndex.saturationAudit(
        spark, "graft_ndhb", "ns", "idx").collect()(0)
      (audit.getLong(0), audit.getLong(1), audit.getLong(2)) shouldBe
        ((10L, 4L, 120L))
    } finally spark.conf.unset(NearDup.MaxBandBucketKey)
  }

  test("hotBandAudit reports the exact dropped bucket count and " +
      "posting mass; zeros when the cap is off or nothing saturates") {
    val docs = (clique(1, 30) ++ realPair ++ noise).toDF("doc_id", "text")
    val bands = NearDup.bandKeys(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 3)
    // the 30-replica clique fills all 4 of its band buckets (identical
    // text = identical signatures): 4 buckets x 30 postings
    NearDup.saturatedBandBuckets(bands, 10L).count() shouldBe 4L
    val audit = NearDup.hotBandAudit(bands, 10L).collect()(0)
    (audit.getLong(0), audit.getLong(1), audit.getLong(2)) shouldBe
      ((10L, 4L, 120L))
    // cap off: nothing is dropped, and the audit says so
    val off = NearDup.hotBandAudit(bands, 0L).collect()(0)
    (off.getLong(1), off.getLong(2)) shouldBe ((0L, 0L))
    // cap above every bucket: zeros again
    val loose = NearDup.hotBandAudit(bands, 1000L).collect()(0)
    (loose.getLong(1), loose.getLong(2)) shouldBe ((0L, 0L))
  }
}
