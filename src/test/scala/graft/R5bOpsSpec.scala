package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, EventOps, NearDup, Sketches, Windows}

/** Round-5 wave-2 operators: unigram cross-entropy, bottom-k pairwise
  * overlap, LSH recall report, growth accounting, attribution, top paths,
  * and the trailing OLS slope. */
class R5bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- unigramCrossEntropy ------------------------------------------------

  test("unigramCrossEntropy matches the closed-form hand computation") {
    // corpus: doc1 = "a a b", doc2 = "b c" -> p(a)=2/5, p(b)=2/5, p(c)=1/5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Corpus.unigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val sc = 1073741824.0 // 2^30 — replicate the scaled-integer grid
    def lp(p: Double): Long = math.floor(math.log(p) * sc).toLong
    val ce1 = -((2 * lp(0.4) + lp(0.4)).toDouble / sc) / 3.0
    val ce2 = -((lp(0.4) + lp(0.2)).toDouble / sc) / 2.0
    out(1L)._1 shouldBe 3L
    out(1L)._2 shouldBe ce1
    out(2L)._2 shouldBe ce2
    // rare-token doc scores strictly higher (worse) than common-token doc
    out(2L)._2 should be > out(1L)._2
  }

  test("unigramCrossEntropy: empty docs emit no row") {
    val docs = Seq((1L, "x y"), (2L, "")).toDF("doc_id", "text")
    Corpus.unigramCrossEntropy(docs, "doc_id", "text")
      .count() shouldBe 1L
  }

  // ---- kmvPairwiseOverlap -------------------------------------------------

  test("kmvPairwiseOverlap is exact when k covers the union") {
    // A = {1..4}, B = {3..6}: J = 2/6; k=16 >> |union| -> estimate exact
    val rows = (1 to 4).map(v => ("A", v)) ++ (3 to 6).map(v => ("B", v))
    val out = Sketches.kmvPairwiseOverlap(rows.toDF("g", "v"), "g", "v", 16)
      .collect()
    out.length shouldBe 1
    val r = out(0)
    (r.getString(0), r.getString(1)) shouldBe (("A", "B"))
    r.getLong(2) shouldBe 6L            // k_used = |union| < k
    r.getLong(3) shouldBe 2L            // both shared values in union set
    r.getDouble(4) shouldBe 2.0 / 6.0
  }

  test("kmvPairwiseOverlap estimate converges near truth for large k") {
    // two 1000-value sets sharing 500: J = 500/1500 = 1/3
    val rows = (1 to 1000).map(v => ("A", v)) ++
      (501 to 1500).map(v => ("B", v))
    val est = Sketches.kmvPairwiseOverlap(rows.toDF("g", "v"), "g", "v", 256)
      .collect()(0).getDouble(4)
    est should be(1.0 / 3.0 +- 0.08) // ~1/sqrt(k) sampling error band
  }

  test("kmvPairwiseOverlap emits every pair for >2 groups") {
    val rows = Seq(("A", 1), ("B", 1), ("C", 2))
    Sketches.kmvPairwiseOverlap(rows.toDF("g", "v"), "g", "v", 8)
      .count() shouldBe 3L // AB, AC, BC
  }

  // ---- lshRecallReport ----------------------------------------------------

  test("lshRecallReport: identical docs give recall 1 at high threshold") {
    val t = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, t), (2L, t), (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val r = NearDup.lshRecallReport(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 3, threshold = 0.9)
      .collect()(0)
    r.getAs[Long]("n_true_pairs") shouldBe 1L
    r.getAs[Long]("n_hits") shouldBe 1L
    r.getAs[Double]("recall") shouldBe 1.0
  }

  test("lshRecallReport: low-jaccard pairs below the s-curve are missed") {
    // Every doc = 5 shared tokens + 8 unique fillers: any two docs share
    // exactly the 3 shared-prefix shingles of their 11 -> J = 3/19 ~
    // 0.158, barely over the 0.15 threshold but far below the banding's
    // s-curve midpoint (~0.63): P(candidate) = 1-(1-J^3)^4 ~ 1.6% per
    // pair. 276 true pairs, so this deterministic (md5-seeded) instance
    // certainly leaves misses — asserting the report measures < 1.
    // n_true > 0 guards the fixture itself.
    val shared = "alpha beta gamma delta epsilon"
    val docs = (0 until 24).map { i =>
      val fill = (1 to 8).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$shared $fill")
    }.toDF("doc_id", "text")
    val r = NearDup.lshRecallReport(docs, "doc_id", "text",
      shingleN = 3, numHashes = 12, bandSize = 3, threshold = 0.15)
      .collect()(0)
    r.getAs[Long]("n_true_pairs") should be > 0L
    r.getAs[Double]("recall") should be < 1.0
  }

  // ---- growthAccounting ---------------------------------------------------

  test("growthAccounting classifies new/retained/resurrected/churned") {
    // u1: d1, d2, d4; u2: d2 only; corpus ends d4
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-04 10:00:00")),
      (2L, ts("2024-01-02 09:00:00")),
      (2L, ts("2024-01-02 11:00:00"))) // same-day double counts once
      .toDF("user_id", "ts")
    val out = EventOps.growthAccounting(ev, col("user_id"), col("ts"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    //                        active new retained resurrected churned
    out("2024-01-01") shouldBe ((1L, 1L, 0L, 0L, 0L))
    out("2024-01-02") shouldBe ((2L, 1L, 1L, 0L, 0L))
    // d3: nobody active; u1 (last d2) and u2 (last d2) both churn
    out("2024-01-03") shouldBe ((0L, 0L, 0L, 0L, 2L))
    // d4: u1 resurrects; no churn row past the corpus end
    out("2024-01-04") shouldBe ((1L, 0L, 0L, 1L, 0L))
    out.size shouldBe 4
  }

  // ---- lastTouchAttribution -----------------------------------------------

  test("lastTouchAttribution credits the latest in-window touch") {
    val ev = Seq(
      // u1: view then purchase 1h later -> view
      (1L, 10L, ts("2024-01-01 10:00:00"), "view", 0.0),
      (1L, 11L, ts("2024-01-01 11:00:00"), "purchase", 10.0),
      // u1: second purchase 3 days later -> outside 24h -> direct
      (1L, 12L, ts("2024-01-04 11:00:00"), "purchase", 20.0),
      // u2: click overrides earlier view (latest touch wins)
      (2L, 20L, ts("2024-01-02 09:00:00"), "view", 0.0),
      (2L, 21L, ts("2024-01-02 10:00:00"), "click", 0.0),
      (2L, 22L, ts("2024-01-02 10:30:00"), "purchase", 5.5),
      // u3: purchase with no touch ever -> direct
      (3L, 30L, ts("2024-01-03 10:00:00"), "purchase", 1.25),
      // error events must not count as touches
      (3L, 29L, ts("2024-01-03 09:59:00"), "error", 0.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = EventOps.lastTouchAttribution(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), Seq("view", "click"), "purchase",
      col("value"), windowSec = 86400L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    out("view") shouldBe ((1L, 10.0))
    out("click") shouldBe ((1L, 5.5))
    out("direct") shouldBe ((2L, 21.25))
  }

  // ---- topPaths -----------------------------------------------------------

  test("topPaths orders steps in time and ranks by session count") {
    val ev = Seq(
      // u1 session 1: view > click > purchase
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "click"),
      (1L, 3L, ts("2024-01-01 10:10:00"), "purchase"),
      // u1 session 2 (gap > 30 min): view > click > purchase again
      (1L, 4L, ts("2024-01-01 12:00:00"), "view"),
      (1L, 5L, ts("2024-01-01 12:01:00"), "click"),
      (1L, 6L, ts("2024-01-01 12:02:00"), "purchase"),
      // u2: lone view
      (2L, 7L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventOps.topPaths(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), gapSec = 1800, maxSteps = 5,
      k = 10).collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2)))
    out(0) shouldBe (("view>click>purchase", 2L, 1))
    out(1) shouldBe (("view", 1L, 2))
  }

  test("topPaths truncates sessions at maxSteps") {
    val ev = (1 to 6).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 10:0$i%d:00"), s"view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = EventOps.topPaths(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), gapSec = 1800, maxSteps = 3,
      k = 5).collect()
    out.length shouldBe 1
    out(0).getString(0) shouldBe "view>view>view"
  }

  // ---- trailingSlope ------------------------------------------------------

  test("trailingSlope recovers a known linear trend exactly") {
    // y = 10x + 3 on three consecutive days: slope exactly 10
    val rows = Seq(("k", java.sql.Date.valueOf("2024-01-01"), 100.0),
      ("k", java.sql.Date.valueOf("2024-01-02"), 110.0),
      ("k", java.sql.Date.valueOf("2024-01-03"), 120.0))
      .toDF("g", "day", "y")
    val out = Windows.trailingSlope(rows, Seq("g"), "day", "y", 7)
      .orderBy("day").select($"slope").as[Option[Double]].collect()
    out(0) shouldBe None // single-day window: denominator 0
    out(1) shouldBe Some(10.0)
    out(2) shouldBe Some(10.0)
  }

  test("trailingSlope windows by calendar range, not row count") {
    // days 1 and 30: the 7-day range window never sees both rows
    val rows = Seq(("k", java.sql.Date.valueOf("2024-01-01"), 1.0),
      ("k", java.sql.Date.valueOf("2024-01-30"), 500.0))
      .toDF("g", "day", "y")
    val out = Windows.trailingSlope(rows, Seq("g"), "day", "y", 7)
      .select($"slope").as[Option[Double]].collect()
    out.forall(_.isEmpty) shouldBe true
  }
}
