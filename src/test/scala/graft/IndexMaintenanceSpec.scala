package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, NearDup, NearDupIndex, Similarity}
import graft.streaming.IndexMaintenance

/** Streaming maintenance of the persisted similarity indexes: each
  * micro-batch lands as ONE epoch-labeled partition of the catalog
  * index, so the maintained index equals a batch build over the union
  * of arrivals, and an epoch replay (same label, dynamic-partition
  * overwrite) converges instead of duplicating. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft_im").toString
    spark.conf.set("spark.sql.catalog.graft_im",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_im.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_im.ns")
    r
  }

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely different text about spark catalyst optimizer plans"),
    (3L, "rows shuffle when the aggregation keys repartition the table"))
  private val arrive1 = Seq(
    (11L, "the quick brown fox jumps over the lazy dog today"),
    (12L, "a genuinely novel document about distributed joins and shuffles"))
  private val arrive2 = Seq(
    (21L, "rows shuffle when the aggregation keys repartition the data"),
    (22L, "another novel document on watermarks and stateful streaming"))

  test("nearDupIndexStream: the maintained index equals a batch build " +
    "over the union of arrivals; candidates match the in-memory pairing") {
    root
    val dir = Files.createTempDirectory("graft_im_nd").toString
    val (in, ckpt) = (s"$dir/in", s"$dir/ckpt")
    val schema = base.toDF("doc_id", "text").schema
    NearDupIndex.build(spark, "graft_im", "ns", "nd",
      base.toDF("doc_id", "text"), "doc_id", "text")
    arrive1.toDF("doc_id", "text").write.mode("append").parquet(in)
    IndexMaintenance.nearDupIndexStream(spark, in, schema, ckpt,
      "graft_im", "ns", "nd", "doc_id", "text")
    arrive2.toDF("doc_id", "text").write.mode("append").parquet(in)
    IndexMaintenance.nearDupIndexStream(spark, in, schema, ckpt,
      "graft_im", "ns", "nd", "doc_id", "text")
    // the second run processed ONLY the new files (one epoch partition
    // per non-empty batch, labels disjoint)
    val batches = NearDupIndex.bands(spark, "graft_im", "ns", "nd")
      .select("batch").distinct().as[String].collect().toSet
    batches should contain("base")
    batches.count(_.startsWith("epoch-")) shouldBe 2
    // maintained candidates == in-memory pairing over the union corpus
    val union = (base ++ arrive1 ++ arrive2).toDF("doc_id", "text")
    // the index canonicalizes pair ids by STRING order (its persisted
    // key type); re-orient the long-keyed in-memory pairs the same way
    val expected = NearDup.minHashLshCandidates(union, "doc_id", "text")
      .select(least(col("a_id").cast("string"), col("b_id").cast("string"))
          .as("a_id"),
        greatest(col("a_id").cast("string"), col("b_id").cast("string"))
          .as("b_id"))
    val got = NearDupIndex.allCandidatePairs(spark, "graft_im", "ns", "nd")
    got.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(got).count() shouldBe 0
    // epoch replay: re-banding an epoch under its existing label is a
    // dynamic-partition overwrite — content converges, nothing duplicates
    val before = NearDupIndex.bands(spark, "graft_im", "ns", "nd")
      .collect().map(_.toString).sorted
    NearDupIndex.indexBatch(spark, "graft_im", "ns", "nd",
      arrive1.toDF("doc_id", "text"), "doc_id", "text", "epoch-0")
    val after = NearDupIndex.bands(spark, "graft_im", "ns", "nd")
      .collect().map(_.toString).sorted
    after should contain theSameElementsInOrderAs before
  }

  test("nearDupIndexStream into a CO-LOCATED index: streamed epochs " +
      "serve identically and an epoch replay converges (delete+append)") {
    root
    val dir = Files.createTempDirectory("graft_im_ndb").toString
    val (in, ckpt) = (s"$dir/in", s"$dir/ckpt")
    val schema = base.toDF("doc_id", "text").schema
    // joinBuckets: the two-level layout keeps batch as the SECOND
    // partition level, so each streamed epoch lands as ONE
    // overwrite-by-filter commit under its epoch label
    NearDupIndex.build(spark, "graft_im", "ns", "ndb",
      base.toDF("doc_id", "text"), "doc_id", "text", joinBuckets = 4)
    arrive1.toDF("doc_id", "text").write.mode("append").parquet(in)
    IndexMaintenance.nearDupIndexStream(spark, in, schema, ckpt,
      "graft_im", "ns", "ndb", "doc_id", "text")
    arrive2.toDF("doc_id", "text").write.mode("append").parquet(in)
    IndexMaintenance.nearDupIndexStream(spark, in, schema, ckpt,
      "graft_im", "ns", "ndb", "doc_id", "text")
    val union = (base ++ arrive1 ++ arrive2).toDF("doc_id", "text")
    val expected = NearDup.minHashLshCandidates(union, "doc_id", "text")
      .select(least(col("a_id").cast("string"), col("b_id").cast("string"))
          .as("a_id"),
        greatest(col("a_id").cast("string"), col("b_id").cast("string"))
          .as("b_id"))
    val got = NearDupIndex.allCandidatePairs(spark, "graft_im", "ns", "ndb")
    got.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(got).count() shouldBe 0
    // epoch replay on the co-located layout converges to one copy
    val before = NearDupIndex.bands(spark, "graft_im", "ns", "ndb")
      .collect().map(_.toString).sorted
    NearDupIndex.indexBatch(spark, "graft_im", "ns", "ndb",
      arrive1.toDF("doc_id", "text"), "doc_id", "text", "epoch-0")
    val after = NearDupIndex.bands(spark, "graft_im", "ns", "ndb")
      .collect().map(_.toString).sorted
    after should contain theSameElementsInOrderAs before
  }

  test("ivfAssignStream: streamed assignment equals the in-memory " +
    "assignment against the same persisted centroids") {
    root
    val dir = Files.createTempDirectory("graft_im_ivf").toString
    val (in, ckpt) = (s"$dir/in", s"$dir/ckpt")
    val all = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val isNew = col("vec_id") % 5 === 0
    IvfIndex.build(spark, "graft_im", "ns", "ann",
      all.filter(!isNew), "vec_id", "embedding", 4)
    all.filter(isNew).write.mode("append").parquet(in)
    IndexMaintenance.ivfAssignStream(spark, in, all.schema, ckpt,
      "graft_im", "ns", "ann", "vec_id", "embedding")
    val streamed = IvfIndex.assignment(spark, "graft_im", "ns", "ann")
      .filter(col("batch").startsWith("epoch-"))
      .select(col("vec_id"), col("centroid_id"))
    val expected = Similarity.ivfAssign(all.filter(isNew), "vec_id",
        "embedding", IvfIndex.centroids(spark, "graft_im", "ns", "ann"))
      .select(col("vec_id").cast("string"), col("centroid_id").cast("string"))
    streamed.exceptAll(expected).count() shouldBe 0
    expected.exceptAll(streamed).count() shouldBe 0
    // and the drift report covers the streamed epochs like any batch
    val drift = IvfIndex.driftReport(spark, "graft_im", "ns", "ann")
    drift.agg(sum(col("n_new"))).collect()(0).getLong(0) shouldBe
      all.filter(isNew).count()
  }
}
