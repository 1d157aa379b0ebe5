package graft

import org.apache.spark.sql.functions._

import graft.operators.{NearDup, NearDupIndex}

/** The persisted MinHash-LSH near-dup index: incremental banding of new
  * batches against a maintained catalog band table — candidate pairs for
  * "today vs the whole corpus" without re-shingling the corpus. */
class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cat = {
    val r = java.nio.file.Files.createTempDirectory("graft_ndi").toString
    spark.conf.set("spark.sql.catalog.graft_ndi",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ndi.root", r)
    "graft_ndi"
  }

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "entirely different content about spark catalyst optimizers"),
    (4L, "the quick brown fox jumps over the lazy dog again today"),
    (5L, "completely unrelated text concerning csv ingestion quirks"),
    (6L, "entirely different content about spark catalyst optimizers")
  ).toDF("doc_id", "text")

  test("incremental pairs == in-memory LSH over the union, restricted " +
      "to the new batch; bands stay partition-granular") {
    cat
    val base = docs.filter(col("doc_id") <= 4)
    val fresh = docs.filter(col("doc_id") > 4)
    NearDupIndex.build(spark, cat, "ns", "idx", base, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 3)
    NearDupIndex.indexBatch(spark, cat, "ns", "idx", fresh, "doc_id",
      "text", "b1")
    val served = NearDupIndex.candidatePairsFor(spark, cat, "ns", "idx",
      "b1")
    val twin = NearDup.minHashLshCandidates(
        docs.select(col("doc_id").cast("string").as("doc_id"), col("text")),
        "doc_id", "text", shingleN = 3, numHashes = 12, bandSize = 3)
      .filter(col("a_id").cast("long") > 4 || col("b_id").cast("long") > 4)
    served.exceptAll(twin).count() shouldBe 0
    twin.exceptAll(served).count() shouldBe 0
    // the duplicated text (3 vs 6) crosses the batches and must surface
    served.collect().map(r => (r.getString(0), r.getString(1))) should
      contain(("3", "6"))
    // the full pairing off the index equals the in-memory one outright
    val all = NearDupIndex.allCandidatePairs(spark, cat, "ns", "idx")
    val fullTwin = NearDup.minHashLshCandidates(
      docs.select(col("doc_id").cast("string").as("doc_id"), col("text")),
      "doc_id", "text", shingleN = 3, numHashes = 12, bandSize = 3)
    all.exceptAll(fullTwin).count() shouldBe 0
    fullTwin.exceptAll(all).count() shouldBe 0
  }

  test("re-delivered batch is idempotent; retention drops one partition; " +
      "parameters are pinned") {
    cat
    val base = docs.filter(col("doc_id") <= 4)
    val fresh = docs.filter(col("doc_id") > 4)
    NearDupIndex.build(spark, cat, "ns", "idx2", base, "doc_id", "text")
    NearDupIndex.indexBatch(spark, cat, "ns", "idx2", fresh, "doc_id",
      "text", "b1")
    val before = NearDupIndex.bands(spark, cat, "ns", "idx2")
      .collect().map(_.toString).sorted.toSeq
    // re-delivery: dynamic overwrite of ONE partition, same content
    NearDupIndex.indexBatch(spark, cat, "ns", "idx2", fresh, "doc_id",
      "text", "b1")
    NearDupIndex.bands(spark, cat, "ns", "idx2")
      .collect().map(_.toString).sorted.toSeq shouldBe before
    NearDupIndex.params(spark, cat, "ns", "idx2") shouldBe ((3, 12, 3))
    // retention: DROP PARTITION removes exactly the batch
    NearDupIndex.dropBatch(spark, cat, "ns", "idx2", "b1")
    NearDupIndex.bands(spark, cat, "ns", "idx2")
      .filter(col("batch") === "b1").count() shouldBe 0
    NearDupIndex.bands(spark, cat, "ns", "idx2")
      .filter(col("batch") === "base").count() should be > 0L
    an[Exception] should be thrownBy
      NearDupIndex.build(spark, cat, "ns", "bad", base, "doc_id", "text",
        numHashes = 10, bandSize = 3)
  }
}
