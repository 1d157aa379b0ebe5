package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 20 in-vocab tokens with stopwords — long enough for stable SimHash
  private val base =
    "the quick brown fox jumps over the lazy dog and runs to the old mill " +
      "near a river bank"

  private lazy val docs = Seq(
    // 1+2: byte-different, SAME normalized text -> exact-dup, keep id 1
    (1L, base),
    (2L, base.toUpperCase + "  "),
    // 3: near-dup of 1 (one appended token, SimHash Hamming 3) and
    // LONGER -> 3 survives the cluster, 1 drops
    (3L, base + " today"),
    // 4: too short
    (4L, "tiny doc here"),
    // 5: zero stopwords -> quality gate (token count passes)
    (5L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"),
    // 6: verbatim eval text -> decontaminated
    (6L, "which model answers this benchmark question about rivers and " +
      "banks in the north country today exactly right every single time"),
    // 7: clean unrelated survivor
    (7L, "completely different content with the best of and to in is on " +
      "for discussion about spark plans and the shuffles they avoid"))
    .toDF("doc_id", "text")

  private lazy val evalDocs = Seq(
    (100L, "which model answers this benchmark question about rivers and " +
      "banks in the north country today exactly right every single time"))
    .toDF("doc_id", "text")

  private lazy val result = CorpusPipeline.run(spark, docs, "doc_id", "text",
    evalDocs, CorpusPipeline.Config(minTokens = 5L, minStopwordRatio = 0.05))

  test("survivors: one per dup group, gates and decontamination applied") {
    result.corpus.select("doc_id").as[Long].collect().toSeq.sorted shouldBe
      Seq(3L, 7L)
    // text came out normalized, and the longest near-dup won the cluster
    result.corpus.filter(col("doc_id") === 3L)
      .select("text").as[String].head() shouldBe base + " today"
  }

  test("report: per-stage drops land where they should") {
    val rows = result.report
      .as[(Int, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    rows.map(_._2) shouldBe Seq("normalize", "length_gate", "quality_gate",
      "exact_dedup", "near_dedup", "decontaminate")
    rows.map(r => (r._2, r._5)).toMap shouldBe Map(
      "normalize" -> 0L,      // normalization never drops rows
      "length_gate" -> 1L,    // doc 4
      "quality_gate" -> 1L,   // doc 5
      "exact_dedup" -> 1L,    // doc 2
      "near_dedup" -> 1L,     // doc 1 (3 is longer and wins the cluster)
      "decontaminate" -> 1L)  // doc 6
    // flow conservation: each stage's n_in is the previous n_out
    rows.sliding(2).foreach { case Seq(a, b) => b._3 shouldBe a._4 }
    rows.head._3 shouldBe 7L
    rows.last._4 shouldBe 2L
  }

  test("clean corpus keeps original non-text columns") {
    val withMeta = docs.withColumn("source", concat(lit("s"), col("doc_id")))
    val r = CorpusPipeline.run(spark, withMeta, "doc_id", "text", evalDocs,
      CorpusPipeline.Config(minTokens = 5L, minStopwordRatio = 0.05))
    r.corpus.columns.toSet shouldBe Set("doc_id", "text", "source")
    r.corpus.filter(col("doc_id") === 7L)
      .select("source").as[String].head() shouldBe "s7"
  }
}
