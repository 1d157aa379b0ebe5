package graft

import graft.operators.Baskets

class TriplesSpec extends SparkSpec {
  import spark.implicits._

  private def baskets(rows: (Long, String)*) = rows.toDF("g", "item")

  test("frequentTriples counts triples meeting the support threshold") {
    val df = baskets(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "c"), (3L, "d"),
      (4L, "a"), (4L, "d"))
    val got = Baskets.frequentTriples(df, "g", "item", 10, 2L).collect()
    got.length shouldBe 1
    val r = got.head
    (r.getString(0), r.getString(1), r.getString(2)) shouldBe ("a", "b", "c")
    r.getAs[Long]("n_groups") shouldBe 3L
    r.getAs[Double]("support") shouldBe 0.75 // 3 of 4 baskets
  }

  test("a-priori pruning: no triple without all three frequent pairs") {
    // (a,b) frequent, (a,c) frequent, but (b,c) occurs only once
    val df = baskets(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "a"), (4L, "c"),
      (5L, "a"), (5L, "b"), (5L, "c"))
    Baskets.frequentTriples(df, "g", "item", 10, 2L).count() shouldBe 0L
  }

  test("over-cap baskets are dropped whole") {
    val big = (1 to 12).map(i => (1L, s"i$i"))
    val small = Seq((2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "c"))
    val got = Baskets.frequentTriples((big ++ small).toDF("g", "item"),
      "g", "item", maxItemsPerGroup = 10, minSupport = 2L).collect()
    got.length shouldBe 1
    // support denominator counts only retained baskets
    got.head.getAs[Double]("support") shouldBe 1.0
  }

  test("duplicate (group,item) rows count once") {
    val df = baskets(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"))
    val got = Baskets.frequentTriples(df, "g", "item", 10, 2L).collect()
    got.head.getAs[Long]("n_groups") shouldBe 2L
  }
}
