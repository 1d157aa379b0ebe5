package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Quality, Scale}

/** Round-5 wave-6 operators: interval coverage, FK conformance, and the
  * top-N-plus-other relabeling. */
class R5fOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- intervalCoverage ---------------------------------------------------

  test("intervalCoverage counts overlap once and bridges chains") {
    val spans = Seq(
      // k1: [0,10) and [5,15) overlap -> union 15 min; naive 20
      ("k1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      ("k1", ts("2024-01-01 10:05:00"), ts("2024-01-01 10:15:00")),
      // k2: disjoint [0,1) and [2,3) -> union 2
      ("k2", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:01:00")),
      ("k2", ts("2024-01-01 09:02:00"), ts("2024-01-01 09:03:00")),
      // k3: contained interval adds nothing
      ("k3", ts("2024-01-01 08:00:00"), ts("2024-01-01 09:00:00")),
      ("k3", ts("2024-01-01 08:10:00"), ts("2024-01-01 08:20:00")))
      .toDF("k", "s", "e")
    val out = EventOps.intervalCoverage(spans, Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val min = 60L * 1000000L
    out("k1") shouldBe ((2L, 15 * min, 20 * min))
    out("k2") shouldBe ((2L, 2 * min, 2 * min))
    out("k3") shouldBe ((2L, 60 * min, 70 * min))
  }

  test("intervalCoverage: same-start spans and zero-length spans") {
    val spans = Seq(
      ("k", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00")),
      ("k", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")),
      ("k", ts("2024-01-01 10:07:00"), ts("2024-01-01 10:07:00")))
      .toDF("k", "s", "e")
    val out = EventOps.intervalCoverage(spans, Seq("k"), "s", "e")
      .collect()(0)
    out.getLong(1) shouldBe 3L
    out.getLong(2) shouldBe 5L * 60L * 1000000L // union = the longer span
  }

  // ---- fkConformance ------------------------------------------------------

  test("fkConformance splits clean rows, null FKs, and orphans") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val out = Quality.fkConformance(Seq(
      Quality.FkRelation("child->parent", child, "fk", parent, "pk")))
      .collect()(0)
    out.getString(0) shouldBe "child->parent"
    out.getLong(1) shouldBe 4L // child rows
    out.getLong(2) shouldBe 1L // null fk
    out.getLong(3) shouldBe 1L // orphan (99)
  }

  test("fkConformance emits one row per relation") {
    val p = Seq(1L).toDF("pk")
    val c = Seq(1L).toDF("fk")
    Quality.fkConformance(Seq(
      Quality.FkRelation("a", c, "fk", p, "pk"),
      Quality.FkRelation("b", c, "fk", p, "pk")))
      .count() shouldBe 2L
  }

  // ---- associationRules ---------------------------------------------------

  test("associationRules computes support/confidence/lift by hand") {
    // baskets: {a,b}, {a,b}, {a}, {b,c}  -> N=4, n_a=3, n_b=3, n_c=1
    val rows = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
      (4, "b"), (4, "c")).toDF("g", "item")
    val out = graft.operators.Baskets.associationRules(rows, "g", "item",
      maxItemsPerGroup = 10)
      .collect().map(r => (r.getString(1), r.getString(0)) ->
        (r.getLong(2), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toMap
    // a->b: n_both=2, support 0.5, confidence 2/3, lift 2*4/(3*3)
    out(("b", "a")) shouldBe ((2L, 0.5, 2.0 / 3.0, 8.0 / 9.0))
    // c->b: confidence 1.0, lift 4/3
    out(("b", "c")) shouldBe ((1L, 0.25, 1.0, 4.0 / 3.0))
    // both directions emitted
    out.keySet should contain(("a", "b"))
    out.size shouldBe 4 // a↔b and b↔c; NOT a↔c (never co-occur)
  }

  test("associationRules drops over-cap baskets entirely") {
    val rows = Seq((1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"))
      .toDF("g", "item")
    val out = graft.operators.Baskets.associationRules(rows, "g", "item",
      maxItemsPerGroup = 2)
    // basket 1 (3 items) dropped: only {a,b} remains, N=1
    out.count() shouldBe 2L
    out.filter($"antecedent" === "a").collect()(0)
      .getAs[Long]("n_baskets") shouldBe 1L
  }

  // ---- topNOther ----------------------------------------------------------

  test("topNOther keeps the global top n and relabels the rest") {
    val rows = Seq(("a", 100.0), ("a", 50.0), ("b", 60.0), ("c", 10.0),
      ("d", 5.0)).toDF("ent", "v")
    val out = Scale.topNOther(rows, "ent", "v", 2)
      .groupBy($"entity_label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a" -> 2L, "b" -> 1L, "other" -> 2L)
  }

  test("topNOther breaks total ties by entity name") {
    val rows = Seq(("x", 10.0), ("y", 10.0), ("z", 10.0)).toDF("ent", "v")
    val labels = Scale.topNOther(rows, "ent", "v", 2)
      .select($"entity_label").as[String].collect().sorted
    labels shouldBe Array("other", "x", "y") // x,y win the tie over z
  }
}
