package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.BpeEncode
import graft.operators.Corpus

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(tok: String, merges: String*): String =
    BpeEncode.encode(UTF8String.fromString(tok), merges.toArray).toString

  // -------------------------------------------- scalar semantics

  test("no applicable merges leaves single characters") {
    enc("abc") shouldBe "a b c"
    enc("abc", "xy") shouldBe "a b c"
  }

  test("a single merge applies at every disjoint occurrence") {
    enc("abab", "ab") shouldBe "ab ab"
  }

  test("lower rank wins when merges compete for a character") {
    // "bc" (rank 0) beats "ab" (rank 1) for the shared 'b'
    enc("abc", "bc", "ab") shouldBe "a bc"
    enc("abc", "ab", "bc") shouldBe "ab c"
  }

  test("leftmost occurrence merges first on rank ties") {
    // after merging the leftmost "aa" of "aaa", the rest is "a"
    enc("aaa", "aa") shouldBe "aa a"
  }

  test("merged symbols do not chain without a matching longer merge") {
    // "ab"+"ab" concat "abab" is not in the table -> stays two symbols
    enc("abab", "ab") shouldBe "ab ab"
  }

  test("empty and single-char tokens pass through") {
    enc("", "ab") shouldBe ""
    enc("x", "ab") shouldBe "x"
  }

  test("interpreted and codegen paths agree") {
    val merges = Seq("ab", "bc", "ca")
    val df = Seq("abcabc", "aabbcc", "xyz", "b").toDF("t")
    val viaExpr = df.select(
      call_function("bpe_encode", col("t"), typedLit(merges)).as("e"))
      .collect().map(_.getString(0))
    val direct = df.collect().map(r =>
      BpeEncode.encode(UTF8String.fromString(r.getString(0)),
        merges.toArray).toString)
    viaExpr shouldBe direct
  }

  // -------------------------------------------- corpus operators

  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the bat sat sat")).toDF("doc_id", "text")

  test("bpeEncodeVocab encodes each distinct token once") {
    val got = Corpus.bpeEncodeVocab(docs, "text", topK = 3).collect()
      .map(r => r.getAs[String]("token") ->
        (r.getAs[String]("encoded"), r.getAs[Long]("n_symbols"))).toMap
    got.keySet shouldBe Set("the", "cat", "sat", "bat")
    // "at" is the most frequent pair (cat, sat x3, bat) -> a merge
    got("cat")._1 shouldBe "c at"
    got("cat")._2 shouldBe 2L
  }

  test("bpeTokenCounts sums symbol counts per document") {
    val vocab = Corpus.bpeEncodeVocab(docs, "text", topK = 3).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("n_symbols"))
      .toMap
    val got = Corpus.bpeTokenCounts(docs, "doc_id", "text", topK = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_bpe_symbols"))).toMap
    got(1L)._1 shouldBe 3L
    got(1L)._2 shouldBe vocab("the") + vocab("cat") + vocab("sat")
    got(2L)._1 shouldBe 4L
    got(2L)._2 shouldBe vocab("the") + vocab("bat") + 2 * vocab("sat")
  }
}
