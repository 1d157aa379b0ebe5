package graft

import graft.functions.TopKAggregator
import graft.functions.TopKAggregator.ScoredId

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps the k best with deterministic tie-breaks") {
    val agg = TopKAggregator.topK(2)
    val rows = Seq(ScoredId(5.0, 10), ScoredId(7.0, 3), ScoredId(5.0, 2),
      ScoredId(1.0, 99))
    val result = rows.foldLeft(agg.zero)(agg.reduce)
    result shouldBe Seq(ScoredId(7.0, 3), ScoredId(5.0, 2)) // tie: lower id wins
  }

  test("merge is order-insensitive (partial aggregation correctness)") {
    val agg = TopKAggregator.topK(3)
    val a = Seq(ScoredId(9.0, 1), ScoredId(8.0, 2))
    val b = Seq(ScoredId(10.0, 3), ScoredId(7.0, 4))
    agg.merge(a, b) shouldBe agg.merge(b, a)
    agg.merge(a, b) shouldBe
      Seq(ScoredId(10.0, 3), ScoredId(9.0, 1), ScoredId(8.0, 2))
  }

  test("end-to-end over a Dataset matches the window formulation") {
    val df = Seq(("g1", 5.0, 1L), ("g1", 9.0, 2L), ("g1", 7.0, 3L),
      ("g1", 9.0, 4L), ("g2", 1.0, 5L)).toDF("g", "score", "id")
    val viaAgg = df.as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => ScoredId(r._2, r._3))
      .agg(TopKAggregator.topK(2).toColumn.name("top"))
      .flatMap { case (g, top) => top.map(t => (g, t.score, t.id)) }
      .collect().toSet
    viaAgg shouldBe Set(("g1", 9.0, 2L), ("g1", 9.0, 4L), ("g2", 1.0, 5L))
  }
}
