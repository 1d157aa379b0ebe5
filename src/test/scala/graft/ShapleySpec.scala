package graft

import java.sql.Timestamp

import graft.operators.EventOps

class ShapleySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def ev(rows: (Long, Int, String)*) =
    rows.map { case (u, m, t) => (u, ts(m), t) }
      .toDF("user_id", "ts", "event_type")

  test("single-channel conversions credit that channel fully") {
    // every converter touched only A; B never appears before conversion
    val df = ev(
      (1L, 1, "A"), (1L, 2, "buy"),
      (2L, 1, "A"), (2L, 2, "buy"),
      (3L, 1, "B")) // B touch, no conversion
    val got = EventOps.shapleyAttribution(df, "user_id", "ts",
      "event_type", "buy", Seq("A", "B")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    got("A") should be > 0.0
    got("B") should be <= 0.0
  }

  test("efficiency: shapley values sum to v(full) - v(empty)") {
    val df = ev(
      (1L, 1, "A"), (1L, 2, "buy"),
      (2L, 1, "B"), (2L, 2, "buy"),
      (3L, 1, "A"), (3L, 2, "B"),
      (4L, 1, "B"),
      (5L, 1, "buy")) // conversion with no prior channel touch
    val got = EventOps.shapleyAttribution(df, "user_id", "ts",
      "event_type", "buy", Seq("A", "B")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    // v(empty): users with mask 0 = user 5 (conv, no touches) => 1.0
    // v(full): all 5 users, 3 conversions => 0.6
    (got("A") + got("B")) shouldBe (0.6 - 1.0) +- 1e-12
  }

  test("symmetry: interchangeable channels get equal credit") {
    val df = ev(
      (1L, 1, "A"), (1L, 2, "buy"),
      (2L, 1, "B"), (2L, 2, "buy"),
      (3L, 1, "A"),
      (4L, 1, "B"))
    val got = EventOps.shapleyAttribution(df, "user_id", "ts",
      "event_type", "buy", Seq("A", "B")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    got("A") shouldBe got("B")
  }

  test("touches after the first conversion do not count as exposure") {
    val df = ev(
      (1L, 1, "A"), (1L, 2, "buy"), (1L, 3, "B"),
      (2L, 1, "A"))
    val got = EventOps.shapleyAttribution(df, "user_id", "ts",
      "event_type", "buy", Seq("A", "B")).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_users_touched"), r.getAs[Double]("shapley")))
      .toMap
    got("B")._1 shouldBe 0L // post-conversion B touch excluded
    got("B")._2 shouldBe 0.0
  }

  test("dummy axiom: a never-touched channel gets zero") {
    val df = ev((1L, 1, "A"), (1L, 2, "buy"), (2L, 1, "A"))
    val got = EventOps.shapleyAttribution(df, "user_id", "ts",
      "event_type", "buy", Seq("A", "B", "C")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    got("C") shouldBe 0.0
  }
}
