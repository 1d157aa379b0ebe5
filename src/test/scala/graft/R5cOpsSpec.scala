package graft

import org.apache.spark.sql.functions._

import graft.operators.{Scale, Sketches}

/** Round-5 wave-3 operators: Misra-Gries-pruned exact heavy hitters and
  * dirty-partition incremental rollup refresh. */
class R5cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- heavyHitters -------------------------------------------------------

  test("heavyHitters equals the exact groupBy answer") {
    // 60×a, 30×b, 9×c, singles: N=109, k=4 -> threshold 27.25
    val vals = Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(9)("c") ++
      (1 to 10).map(i => s"x$i")
    val out = Sketches.heavyHitters(vals.toDF("v"), "v", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a" -> 60L, "b" -> 30L)
  }

  test("heavyHitters is lossless under adversarial interleaving") {
    // the heavy item arrives LAST, after the sketch saturates with noise
    // — decrements must never evict a true heavy hitter for good
    val vals = (1 to 80).map(i => s"noise$i") ++ Seq.fill(40)("hot")
    val df = vals.toDF("v").repartition(3) // force multiple sketches
    val out = Sketches.heavyHitters(df, "v", 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N=120, threshold N/5=24: only "hot" (40) qualifies
    out shouldBe Map("hot" -> 40L)
  }

  test("heavyHitters: nothing qualifies when mass is uniform") {
    val vals = (1 to 50).map(i => s"v${i % 25}") // every value count 2
    Sketches.heavyHitters(vals.toDF("v"), "v", 10)
      .count() shouldBe 0L // threshold 50/10 = 5 > 2
  }

  // ---- incrementalRollup --------------------------------------------------

  private def mkFacts(rows: Seq[(String, String, Double)]) =
    rows.toDF("day", "g", "v").withColumn("day", to_date($"day"))

  test("incrementalRollup == full recompute across dirty/clean/new days") {
    val base = mkFacts(Seq(
      ("2024-01-01", "a", 10.0), ("2024-01-01", "b", 1.0),
      ("2024-01-02", "a", 20.0),
      ("2024-01-03", "a", 30.0)))
    val late = mkFacts(Seq(
      ("2024-01-02", "a", 5.0),   // dirty existing day
      ("2024-01-04", "b", 7.5)))  // brand-new day
    val baseAgg = Scale.rollup(base, "day", Seq("g"), "v")
    val inc = Scale.incrementalRollup(baseAgg, base, late, "day",
      Seq("g"), "v")
    val full = Scale.rollup(base.unionByName(late), "day", Seq("g"), "v")
    rowsAsStrings(inc) shouldBe rowsAsStrings(full)
    // clean days must come from baseAgg untouched: day 1 and 3 rows exist
    inc.filter($"day" === "2024-01-03").count() shouldBe 1L
  }

  test("incrementalRollup with no late rows returns baseAgg as-is") {
    val base = mkFacts(Seq(("2024-01-01", "a", 1.0)))
    val baseAgg = Scale.rollup(base, "day", Seq("g"), "v")
    val inc = Scale.incrementalRollup(baseAgg, base,
      mkFacts(Seq.empty), "day", Seq("g"), "v")
    rowsAsStrings(inc) shouldBe rowsAsStrings(baseAgg)
  }

  test("incrementalRollup recomputes dirty days from scratch (rewrite-safe)") {
    // late data REPLACES nothing here, but the dirty day's base facts are
    // re-read: a base fact on the dirty day must appear exactly once
    val base = mkFacts(Seq(("2024-01-01", "a", 10.0)))
    val late = mkFacts(Seq(("2024-01-01", "a", 1.0)))
    val baseAgg = Scale.rollup(base, "day", Seq("g"), "v")
    val out = Scale.incrementalRollup(baseAgg, base, late, "day",
      Seq("g"), "v").collect()
    out.length shouldBe 1
    out(0).getAs[Long]("n_rows") shouldBe 2L
    out(0).getDecimal(3).doubleValue() shouldBe 11.0
  }
}
