package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Corpus}

/** Round-2 wave 2: end-to-end duplicate resolution, paragraph dedup, and
  * text normalization. */
class CorpusDedupSpec extends SparkSpec {
  import spark.implicits._

  test("resolveDuplicates: one survivor per chain component, prefer wins") {
    // chain 1-2-3 (one cluster even though 1 and 3 never pair directly),
    // pair 4-5, singleton 6
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 20L),
      (4L, "d", 5L), (5L, "e", 5L), (6L, "f", 99L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a_id", "b_id")

    val kept = Corpus.resolveDuplicates(docs, "doc_id", pairs, "a_id", "b_id",
        prefer = Some(col("n_chars")))
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // longest in {1,2,3} is doc 2; 4-5 tie on length -> min id 4; 6 alone
    kept shouldBe Seq((2L, 1L, 3L), (4L, 4L, 2L), (6L, 6L, 1L))
  }

  test("resolveDuplicates works with string document ids (URLs, hashes)") {
    val docs = Seq(
      ("url-a", "x", 10L), ("url-b", "y", 30L), ("url-c", "z", 20L),
      ("url-d", "w", 1L))
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq(("url-a", "url-b"), ("url-b", "url-c"))
      .toDF("a_id", "b_id")
    val kept = Corpus.resolveDuplicates(docs, "doc_id", pairs, "a_id", "b_id",
        prefer = Some(col("n_chars")))
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(String, String, Long)].collect().toSeq.sorted
    kept shouldBe Seq(("url-b", "url-a", 3L), ("url-d", "url-d", 1L))
    // no prefer: minimum id survives; nothing silently dropped
    Corpus.resolveDuplicates(docs, "doc_id", pairs, "a_id", "b_id")
      .select("doc_id").as[String].collect().toSeq.sorted shouldBe
      Seq("url-a", "url-d")
  }

  test("resolveDuplicates without prefer keeps the minimum id") {
    val docs = Seq((7L, "x"), (8L, "x"), (9L, "y")).toDF("doc_id", "text")
    val pairs = Seq((8L, 7L)).toDF("a_id", "b_id")
    Corpus.resolveDuplicates(docs, "doc_id", pairs, "a_id", "b_id")
      .select("doc_id").as[Long].collect().toSeq.sorted shouldBe Seq(7L, 9L)
  }

  test("dedupParagraphs: later copies drop, first doc keeps its paragraph") {
    val docs = Seq(
      (1L, "alpha\nshared-boilerplate\nbravo"),
      (2L, "shared-boilerplate\ncharlie"),
      (3L, "shared-boilerplate"),              // loses everything
      (4L, "delta\n\ndelta"))                  // empty para ignored; self-dup drops
      .toDF("doc_id", "text")
    val got = Corpus.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    got shouldBe Seq(
      (1L, "alpha\nshared-boilerplate\nbravo", 3L, 0L),
      (2L, "charlie", 1L, 1L),
      (3L, "", 0L, 1L),
      (4L, "delta", 1L, 1L))
  }

  test("dropBoilerplateParagraphs removes over-df paragraphs EVERYWHERE") {
    val docs = Seq(
      (1L, "banner\nunique-one"),
      (2L, "banner\nunique-two"),
      (3L, "banner\nrepeated\nunique-three"),
      (4L, "repeated\nunique-four"))
      .toDF("doc_id", "text")
    // banner df=3 > 2 -> gone from all; repeated df=2 <= 2 -> stays
    val got = Corpus.dropBoilerplateParagraphs(docs, "doc_id", "text",
        maxDocFrequency = 2)
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    got shouldBe Seq(
      (1L, "unique-one", 1L, 1L),
      (2L, "unique-two", 1L, 1L),
      (3L, "repeated\nunique-three", 2L, 1L),
      (4L, "repeated\nunique-four", 2L, 0L))
  }

  test("dropBoilerplateParagraphs counts DOCUMENT frequency, not copies") {
    // para appears twice in ONE doc: df=1, survives a maxDf=1 filter
    val docs = Seq((1L, "twice\ntwice")).toDF("doc_id", "text")
    Corpus.dropBoilerplateParagraphs(docs, "doc_id", "text", 1)
      .as[(Long, String, Long, Long)].head() shouldBe
      (1L, "twice\ntwice", 2L, 0L)
  }

  test("dedupParagraphs keeps the FIRST occurrence by (doc_id, idx) order") {
    val docs = Seq(
      (10L, "z\ncommon"),     // common at idx 1 of the smallest doc id
      (11L, "common\nz2"))
      .toDF("doc_id", "text")
    val got = Corpus.dedupParagraphs(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    got.head._2 shouldBe "z\ncommon"
    got(1)._2 shouldBe "z2"
  }

  test("normalizeText: composed and decomposed forms converge; idempotent") {
    GraftExtensions.register(spark)
    val df = Seq(
      // composed U+00E9 vs decomposed e+U+0301, plus messy whitespace
      ("café au lait", "café  au\tlait "),
      ("HELLO", "hello"))
      .toDF("a", "b")
    val out = df.select(
      Cleaning.normalizeText(col("a")).as("na"),
      Cleaning.normalizeText(col("b")).as("nb")).collect()
    out(0).getString(0) shouldBe "cafe au lait"
    out(0).getString(1) shouldBe "cafe au lait"
    out(1).getString(0) shouldBe "hello"
    out(1).getString(1) shouldBe "hello"
    // idempotence on already-normal text
    val once = Seq("plain text here").toDF("t")
      .select(Cleaning.normalizeText(col("t")).as("n"))
    once.select(Cleaning.normalizeText(col("n")) === col("n"))
      .as[Boolean].head() shouldBe true
  }

  test("unicode_normalize registers as a SQL function and checks its form") {
    GraftExtensions.register(spark)
    spark.sql("SELECT unicode_normalize('é', 'NFC') AS s")
      .as[String].head() shouldBe "é"
    an[Exception] should be thrownBy
      spark.sql("SELECT unicode_normalize('x', 'NOPE')").collect()
  }
}
