package graft

import graft.operators.Corpus

class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "short", "en", "s1", 5L),
    (2L, "a much longer text body", "fr", "s2", 23L),
    (3L, "medium text", "fr", "s1", 11L),
    (9L, "solo doc", "de", "s3", 8L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val labels = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
    .toDF("doc_id", "cluster_id")

  test("fields merge from different members under their own rules") {
    val got = Corpus.goldenRecords(docs, "doc_id", "text", "lang",
      "source", "n_chars", labels).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    val c = got(1L)
    c.getAs[Long]("representative_id") shouldBe 2L // longest text
    c.getAs[String]("golden_lang") shouldBe "fr"   // majority language
    c.getAs[Long]("n_members") shouldBe 3L
    c.getAs[Long]("n_sources") shouldBe 2L
    c.getAs[Long]("total_chars") shouldBe 39L
  }

  test("language ties break to the lexicographically lowest") {
    val tied = Seq(
      (1L, "aaaa", "fr", "s", 4L), (2L, "bbb", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val lbl = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    Corpus.goldenRecords(tied, "doc_id", "text", "lang", "source",
      "n_chars", lbl).collect().head
      .getAs[String]("golden_lang") shouldBe "en"
  }

  test("singleton clusters are their own golden record") {
    val got = Corpus.goldenRecords(docs, "doc_id", "text", "lang",
      "source", "n_chars", labels).collect()
      .find(_.getAs[Long]("cluster_id") == 9L).get
    got.getAs[Long]("representative_id") shouldBe 9L
    got.getAs[Long]("n_members") shouldBe 1L
  }
}
