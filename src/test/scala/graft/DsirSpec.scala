package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance resampling (Dsir.dsirSelect / importanceWeights). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Target corpus: "alpha beta" style docs. Raw pool: half target-like,
  // half disjoint-vocabulary noise.
  private def targetDf = Seq(
    (100L, "alpha beta gamma alpha beta"),
    (101L, "beta gamma alpha beta gamma"),
    (102L, "alpha gamma beta alpha gamma")).toDF("doc_id", "text")

  private def rawDf = Seq(
    (1L, "alpha beta gamma beta alpha"),
    (2L, "gamma alpha beta gamma beta"),
    (3L, "beta alpha gamma alpha"),
    (4L, "zig zag zog zug zeg"),
    (5L, "quux corge grault garply waldo"),
    (6L, "fred plugh xyzzy thud mumble")).toDF("doc_id", "text")

  test("importance weights rank target-like docs above disjoint docs") {
    val lw = Dsir.importanceWeights(rawDf, targetDf, "doc_id", "text", 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val targetLike = Seq(1L, 2L, 3L).map(lw)
    val noise = Seq(4L, 5L, 6L).map(lw)
    targetLike.min should be > noise.max
  }

  test("dsirSelect returns exactly k rows, prefers target-like docs") {
    val sel = Dsir.dsirSelect(rawDf, targetDf, "doc_id", "text",
      k = 3, buckets = 256, seed = "s1")
    val ids = sel.select("doc_id").as[Long].collect().toSet
    ids should have size 3
    // weights dominate the Gumbel noise here by construction (disjoint
    // vocab => hundreds of nats apart), so the target-like half wins
    ids shouldBe Set(1L, 2L, 3L)
  }

  test("selection is deterministic under a fixed seed, varies with seed") {
    val a1 = Dsir.dsirSelect(rawDf, targetDf, "doc_id", "text",
      k = 2, buckets = 64, seed = "x").collect().map(_.getLong(0)).toSeq
    val a2 = Dsir.dsirSelect(rawDf, targetDf, "doc_id", "text",
      k = 2, buckets = 64, seed = "x").collect().map(_.getLong(0)).toSeq
    a1 shouldBe a2
    // sample keys (not necessarily the winners) must move with the seed
    val k1 = Dsir.dsirSelect(rawDf, targetDf, "doc_id", "text",
      k = 6, buckets = 64, seed = "x")
      .select("doc_id", "sample_key_nats").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val k2 = Dsir.dsirSelect(rawDf, targetDf, "doc_id", "text",
      k = 6, buckets = 64, seed = "y")
      .select("doc_id", "sample_key_nats").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    k1 should not equal k2
  }

  test("docs with no tokens are never selected; carryCols carried") {
    val raw = rawDf.union(Seq((7L, ""), (8L, "   ")).toDF("doc_id", "text"))
      .withColumn("src", concat(lit("s"), col("doc_id") % 2))
    val sel = Dsir.dsirSelect(raw, targetDf, "doc_id", "text",
      k = 6, buckets = 64, seed = "z", carryCols = Seq("src"))
    sel.columns.toSeq shouldBe
      Seq("doc_id", "src", "log_weight_nats", "sample_key_nats")
    val ids = sel.select("doc_id").as[Long].collect().toSet
    ids should contain noneOf (7L, 8L)
    ids should have size 6 // the 6 non-empty docs all fit in k
  }

  test("single-token docs featurize (unigram only) without error") {
    val raw = Seq((1L, "alpha"), (2L, "zug")).toDF("doc_id", "text")
    val lw = Dsir.importanceWeights(raw, targetDf, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lw.keySet shouldBe Set(1L, 2L)
    lw(1L) should be > lw(2L) // "alpha" appears in target, "zug" doesn't
  }
}
