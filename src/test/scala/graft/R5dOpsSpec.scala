package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Windows}

/** Round-5 wave-4 operators: split-leakage audit and daily gap
  * interpolation. */
class R5dOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- splitLeakageAudit --------------------------------------------------

  test("splitLeakageAudit counts only cross-split near-dup pairs") {
    val dup = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, dup, "train"),
      (2L, dup, "test"),             // leaks train<->test
      (3L, dup, "train"),            // 1-3 same split: NOT leakage
      (4L, "totally different words here entirely", "val"))
      .toDF("doc_id", "text", "split")
    val out = Corpus.splitLeakageAudit(docs, "doc_id", "text", "split",
      n = 3, threshold = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    out shouldBe Map(("test", "train") -> 2L) // pairs (1,2) and (2,3)
  }

  test("splitLeakageAudit canonicalizes the split pair ordering") {
    val dup = "one two three four five six"
    // a-b and b-a orderings of the same split pair must merge to one row
    val docs = Seq((1L, dup, "test"), (2L, dup, "train"),
      (5L, dup + " seven", "train"))
      .toDF("doc_id", "text", "split")
    val rows = Corpus.splitLeakageAudit(docs, "doc_id", "text", "split",
      n = 3, threshold = 0.5).collect()
    rows.length shouldBe 1
    rows(0).getString(0) shouldBe "test"
    rows(0).getString(1) shouldBe "train"
  }

  // ---- interpolateDaily ---------------------------------------------------

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("interpolateDaily fills gaps on the straight line") {
    val rows = Seq(("k", d("2024-01-01"), 10.0), ("k", d("2024-01-04"), 40.0))
      .toDF("g", "day", "v")
    val out = Windows.interpolateDaily(rows, Seq("g"), "day", "v")
      .orderBy("day")
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2),
        r.getBoolean(3)))
    out shouldBe Array(
      ("2024-01-01", 10.0, false),
      ("2024-01-02", 20.0, true),
      ("2024-01-03", 30.0, true),
      ("2024-01-04", 40.0, false))
  }

  test("interpolateDaily: observed days pass through; no fill past last") {
    val rows = Seq(("k", d("2024-01-01"), 5.5), ("k", d("2024-01-02"), 7.25))
      .toDF("g", "day", "v")
    val out = Windows.interpolateDaily(rows, Seq("g"), "day", "v")
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1)
    out shouldBe Array(("2024-01-01", 5.5, false), ("2024-01-02", 7.25, false))
  }

  test("interpolateDaily keeps keys independent") {
    val rows = Seq(("a", d("2024-01-01"), 0.0), ("a", d("2024-01-03"), 2.0),
      ("b", d("2024-01-02"), 9.0))
      .toDF("g", "day", "v")
    val out = Windows.interpolateDaily(rows, Seq("g"), "day", "v")
    out.count() shouldBe 4L // a: 3 days, b: 1 day — no cross-key bridging
    out.filter($"g" === "b").count() shouldBe 1L
  }

  // ---- weightedPercentiles ------------------------------------------------

  test("weightedPercentiles: weight mass, not row count, picks the value") {
    // values 1..4 with weights 1,1,1,7: total 10 — the weighted median
    // is 4 (cum 3 < 5 until the heavy row), though the ROW median is 2
    val rows = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
      ("g", 4.0, 7.0)).toDF("g", "v", "w")
    val out = graft.operators.Quality.weightedPercentiles(rows, Seq("g"),
      "v", "w", Seq(("wp50", 1, 2))).collect()(0)
    out.getDouble(1) shouldBe 10.0
    out.getDouble(2) shouldBe 4.0
  }

  test("weightedPercentiles with unit weights == nearest-rank percentile") {
    val vals = (1 to 100).map(i => ("g", i.toDouble, 1.0))
    val out = graft.operators.Quality.weightedPercentiles(
      vals.toDF("g", "v", "w"), Seq("g"), "v", "w",
      Seq(("wp50", 1, 2), ("wp90", 9, 10), ("wp100", 1, 1))).collect()(0)
    out.getDouble(2) shouldBe 50.0  // cum 50 >= 100/2
    out.getDouble(3) shouldBe 90.0
    out.getDouble(4) shouldBe 100.0
  }

  test("weightedPercentiles: exact boundary crossing is inclusive") {
    // two equal weights: wp50 crosses exactly at the first value
    val rows = Seq(("g", 10.0, 5.0), ("g", 20.0, 5.0)).toDF("g", "v", "w")
    val out = graft.operators.Quality.weightedPercentiles(rows, Seq("g"),
      "v", "w", Seq(("wp50", 1, 2))).collect()(0)
    out.getDouble(2) shouldBe 10.0 // 2*5 >= 10 exactly — inclusive
  }

  test("interpolateDaily works when the day column is not named 'day'") {
    // regression: the generated spine column is named "day" and must not
    // clobber (or be confused with) an observation column of any name
    val rows = Seq(("k", d("2024-01-01"), 1.0), ("k", d("2024-01-03"), 3.0))
      .toDF("g", "obs_date", "v")
    val out = Windows.interpolateDaily(rows, Seq("g"), "obs_date", "v")
      .orderBy("day")
      .select($"value").as[Double].collect()
    out shouldBe Array(1.0, 2.0, 3.0)
  }
}
