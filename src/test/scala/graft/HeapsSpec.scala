package graft

import graft.operators.Stats

class HeapsSpec extends SparkSpec {
  import spark.implicits._

  test("repeating the same vocabulary drives beta toward zero") {
    val docs = (1 to 50).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val got = Stats.heapsFit(docs, "doc_id", "text").collect().head
    got.getAs[Long]("n_points") shouldBe 50L
    got.getAs[Double]("beta") should be < 0.2
  }

  test("all-new vocabulary per doc fits beta near one") {
    val docs = (1 to 50).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val got = Stats.heapsFit(docs, "doc_id", "text").collect().head
    got.getAs[Double]("beta") shouldBe 1.0 +- 0.05
  }

  test("sublinear growth lands between the extremes") {
    // doc i introduces one new word among four repeated ones
    val docs = (1 to 60).map(i =>
      (i.toLong, s"the of and to new$i")).toDF("doc_id", "text")
    val beta = Stats.heapsFit(docs, "doc_id", "text").collect()
      .head.getAs[Double]("beta")
    beta should be > 0.2
    beta should be < 1.0
  }

  test("empty documents are excluded from the curve") {
    val docs = Seq((1L, ""), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    Stats.heapsFit(docs, "doc_id", "text").collect()
      .head.getAs[Long]("n_points") shouldBe 2L
  }
}
