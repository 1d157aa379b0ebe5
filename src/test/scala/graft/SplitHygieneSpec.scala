package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, NearDup}

class SplitHygieneSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- selfRepeatRuns

  test("a doc with one long internal repeat reports its run length") {
    val docs = Seq(
      (1L, "aa bb cc dd zz yy xx aa bb cc dd"), // 'aa bb cc dd' twice
      (2L, "p q r s t u v w")) // no repeats
      .toDF("doc_id", "text")
    val got = NearDup.selfRepeatRuns(docs, "doc_id", "text").collect()
    got.length shouldBe 1
    got.head.getAs[Long]("doc_id") shouldBe 1L
    got.head.getAs[Long]("max_run") shouldBe 2L // 4 tokens = 2 tri-shingles
  }

  test("periodic spam yields many matches on multiple diagonals") {
    val docs = Seq((1L, "buy now buy now buy now buy now"))
      .toDF("doc_id", "text")
    val got = NearDup.selfRepeatRuns(docs, "doc_id", "text").collect().head
    got.getAs[Long]("max_run") should be >= 4L
    got.getAs[Long]("n_self_matches") should be >= 6L
  }

  // -------------------------------------------- stratifiedFolds

  test("folds balance to +-1 within every stratum") {
    val df = ((1 to 103).map(i => (i.toLong, "en")) ++
      (1000 to 1016).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val got = Corpus.stratifiedFolds(df, "doc_id", "lang", k = 5)
      .groupBy("stratum", "fold").count().collect()
      .map(r => (r.getString(0), r.getAs[Int]("fold")) -> r.getLong(2))
      .toMap
    val en = (0 until 5).map(f => got(("en", f)))
    en.max - en.min should be <= 1L
    en.sum shouldBe 103L
    val fr = (0 until 5).map(f => got.getOrElse(("fr", f), 0L))
    fr.max - fr.min should be <= 1L
  }

  // -------------------------------------------- clusterSplit

  test("cluster members always land in the same split") {
    val labels = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), // one cluster
      (4L, 200L), (5L, 200L),
      (6L, 300L)).toDF("doc_id", "cluster_id")
    val got = Corpus.clusterSplit(labels, "doc_id").collect()
      .groupBy(_.getLong(1)).map { case (c, rows) =>
        c -> rows.map(_.getAs[String]("split")).distinct.length }
    all(got.values) shouldBe 1
  }

  test("cluster split fractions roughly follow the percentages") {
    val labels = (1 to 2000).map(i => (i.toLong, i.toLong))
      .toDF("doc_id", "cluster_id")
    val got = Corpus.clusterSplit(labels, "doc_id", 80, 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got("train").toDouble / 2000 shouldBe 0.8 +- 0.05
    got("val").toDouble / 2000 shouldBe 0.1 +- 0.03
    got("test").toDouble / 2000 shouldBe 0.1 +- 0.03
  }
}
