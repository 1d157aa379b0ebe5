package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** Aho-Corasick phrase counting (expressions/PhraseMatchCount). */
class PhraseCountSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, phrases: Seq[String]): Long = {
    val df = Corpus.blocklistHits(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", phrases)
    df.collect()(0).getLong(1)
  }

  test("overlapping occurrences all count") {
    count("aaaa", Seq("aa")) shouldBe 3
    count("ababab", Seq("abab")) shouldBe 2
  }

  test("a phrase that is a substring of another counts independently") {
    // "ab" at 1 and 4; "abc" at 1
    count("zabcab", Seq("ab", "abc")) shouldBe 3
  }

  test("zero matches, empty text, and NULL text") {
    count("xyz", Seq("ab")) shouldBe 0
    count("", Seq("ab")) shouldBe 0
    val df = Corpus.blocklistHits(
      Seq((1L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text", Seq("ab"))
    df.collect()(0).isNullAt(1) shouldBe true
  }

  test("duplicate list entries each contribute") {
    count("xaax", Seq("aa", "aa")) shouldBe 2
  }

  test("matches a brute-force scan on mixed phrases") {
    val phrases = Seq("the quick", "ick bro", "fox", "o", "brown fox")
    val text = "the quick brown fox jumps over the quick brown fox o o"
    val brute = phrases.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }.sum
    count(text, phrases) shouldBe brute
  }

  test("SQL path with an array literal; blocked flag") {
    graft.GraftExtensions.register(spark)
    Seq((1L, "a row scan here"), (2L, "nothing")).toDF("doc_id", "text")
      .createOrReplaceTempView("pc_docs")
    val rows = spark.sql(
      "SELECT doc_id, phrase_count(text, array('row scan', 'noth')) AS n " +
        "FROM pc_docs ORDER BY doc_id").collect()
    rows.map(_.getLong(1)).toSeq shouldBe Seq(1L, 1L)
    val gate = Corpus.blocklistHits(
      Seq((1L, "a row scan"), (2L, "clean")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("row scan"))
    gate.filter(col("blocked")).select("doc_id").as[Long].collect()
      .toSeq shouldBe Seq(1L)
  }
}
