package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Corpus, EventOps, NearDup, Quality, Scale, Sketches}

/** Round-5 wave-1 operators: KMV sketches, rolling distinct, the
  * distributed sweep line, and change-log compaction. */
class R5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- kmvDistinct --------------------------------------------------------

  test("kmvDistinct: below-k groups are exact; above-k groups estimate") {
    val df = (1 to 500).map(i => ("big", s"v$i")) ++
      (1 to 5).map(i => ("small", s"v$i"))
    val out = Sketches.kmvDistinct(df.toDF("g", "v"), Seq("g"), "v", k = 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.getString(2)), r.getDouble(3))).toMap
    val (nSmall, kthSmall, estSmall) = out("small")
    nSmall shouldBe 5L
    kthSmall shouldBe None          // sketch not full -> exact path
    estSmall shouldBe 5.0
    val (nBig, kthBig, estBig) = out("big")
    nBig shouldBe 500L
    kthBig.isDefined shouldBe true
    // KMV with k=32 has relative stderr ~ 1/sqrt(k-2) ~ 18%; allow 4 sigma
    estBig shouldBe 500.0 +- 360.0
  }

  test("kmvDistinct: merge = union then re-take k smallest (mergeable)") {
    val all = (1 to 400).map(i => ("g", s"v$i")).toDF("g", "v")
    val h1 = (1 to 250).map(i => ("g", s"v$i")).toDF("g", "v")
    val h2 = (200 to 400).map(i => ("g", s"v$i")).toDF("g", "v") // overlap
    val whole = Sketches.kmvDistinct(all, Seq("g"), "v", k = 16).collect()(0)
    val merged = Sketches.kmvDistinct(h1.union(h2), Seq("g"), "v", k = 16)
      .collect()(0)
    // the k smallest hashes of a union are the k smallest of the merged
    // partial sketches, so estimates agree exactly
    merged.getString(2) shouldBe whole.getString(2)
    merged.getDouble(3) shouldBe whole.getDouble(3)
  }

  // ---- rollingDistinct ----------------------------------------------------

  test("rollingDistinct matches a brute-force trailing window") {
    val d0 = Date.valueOf("2024-01-01")
    def day(i: Int) = new Date(d0.getTime + i * 86400000L)
    // entity 1 active days 0,1; entity 2 day 3; entity 3 days 0 and 9
    val df = Seq(("k", 1L, day(0)), ("k", 1L, day(1)), ("k", 2L, day(3)),
      ("k", 3L, day(0)), ("k", 3L, day(9)), ("k", 1L, day(0)))
      .toDF("g", "e", "d")
    val out = EventOps.rollingDistinct(df, Seq("g"), "e", "d", windowDays = 3)
      .collect().map(r => r.getDate(1).toString -> r.getLong(2)).toMap
    // brute force: day X counts entities active in [X-2, X]
    out("2024-01-01") shouldBe 2L // e1@d0, e3@d0
    out("2024-01-02") shouldBe 2L // e1@{d0,d1}, e3@d0
    out("2024-01-03") shouldBe 2L // window [d0..d2]: e1, e3
    out("2024-01-04") shouldBe 2L // window [d1..d3]: e1@d1, e2@d3
    out("2024-01-05") shouldBe 1L // window [d2..d4]: e2 only
    out("2024-01-10") shouldBe 1L // e3(d9)
    out.keySet should not contain "2024-01-08"
  }

  test("rollingDistinct covers exactly windowDays days per activity") {
    val df = Seq(("g", 7L, Date.valueOf("2024-03-10"))).toDF("g", "e", "d")
    val out = EventOps.rollingDistinct(df, Seq("g"), "e", "d", 7)
    out.count() shouldBe 7L
    out.agg(min("day"), max("day")).collect()(0).toSeq.map(_.toString) shouldBe
      Seq("2024-03-10", "2024-03-16")
  }

  // ---- peakConcurrencyDaily -----------------------------------------------

  test("peakConcurrencyDaily matches the single-partition global sweep") {
    val spans = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00")),
      (3L, ts("2024-01-01 10:40:00"), ts("2024-01-02 09:00:00")), // overnight
      (4L, ts("2024-01-02 08:00:00"), ts("2024-01-02 08:30:00")),
      (5L, ts("2024-01-03 01:00:00"), ts("2024-01-03 02:00:00")),
      // zero-width adjacency: 6 ends exactly when 7 starts -> no overlap
      (6L, ts("2024-01-03 01:10:00"), ts("2024-01-03 01:20:00")),
      (7L, ts("2024-01-03 01:20:00"), ts("2024-01-03 01:30:00")))
      .toDF("id", "t0", "t1")
    val out = EventOps.peakConcurrencyDaily(spans, "t0", "t1", "id")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    out("2024-01-01") shouldBe 3L // spans 1,2,3 at 10:40-10:45
    out("2024-01-02") shouldBe 2L // overnight span 3 + span 4
    out("2024-01-03") shouldBe 2L // 5+6 or 5+7, never 3
  }

  test("peakConcurrencyDaily: overnight offset carries across empty gap") {
    // one span covering 3 days; only its endpoints' days emit rows, but
    // day-2's offset must still see day-1's +1
    val spans = Seq((1L, ts("2024-05-01 12:00:00"), ts("2024-05-03 12:00:00")),
      (2L, ts("2024-05-03 11:00:00"), ts("2024-05-03 13:00:00")))
      .toDF("id", "t0", "t1")
    val out = EventOps.peakConcurrencyDaily(spans, "t0", "t1", "id")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    out("2024-05-01") shouldBe 1L
    out("2024-05-03") shouldBe 2L // span 1 still open when span 2 starts
  }

  // ---- compactLog ---------------------------------------------------------

  test("compactLog: latest wins, deletes drop keys, n_changes counts all") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "U", "a"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "U", "b"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "U", "x"),
      (2L, ts("2024-01-03 00:00:00"), 4L, "D", "x"),
      (3L, ts("2024-01-01 00:00:00"), 5L, "D", "y"),
      (3L, ts("2024-01-02 00:00:00"), 6L, "U", "z"))
      .toDF("k", "ts", "seq", "op", "payload")
    val out = Cdc.compactLog(log, Seq("k"), Seq(col("ts"), col("seq")),
        "op", "D")
      .select($"k", $"payload", $"n_changes").as[(Long, String, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    out shouldBe Map(1L -> ("b", 2L), 3L -> ("z", 2L)) // key 2 deleted
  }

  test("compactLog: tiebreak column decides same-timestamp order") {
    val t = ts("2024-01-01 00:00:00")
    val log = Seq((1L, t, 10L, "U", "first"), (1L, t, 11L, "U", "second"))
      .toDF("k", "ts", "seq", "op", "payload")
    val out = Cdc.compactLog(log, Seq("k"), Seq(col("ts"), col("seq")),
      "op", "D")
    out.select($"payload").as[String].collect() shouldBe Array("second")
  }

  // ---- mergePartials ------------------------------------------------------

  // ---- ngramContainmentPairs ----------------------------------------------

  test("containment flags a subset doc that jaccard would miss") {
    val short = "alpha beta gamma delta epsilon"
    val long = ("alpha beta gamma delta epsilon " +
      (1 to 60).map(i => s"filler$i").mkString(" "))
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val cont = NearDup.ngramContainmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.9, maxDf = 0, uncapped = true).collect()
    cont.length shouldBe 1
    cont(0).getDouble(3) shouldBe 1.0 // all 3 shingles of doc1 inside doc2
    // jaccard on the same pair is ~3/63 — far below any usable threshold
    val jac = NearDup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.2, maxDf = 0, uncapped = true)
    jac.count() shouldBe 0L
  }

  // ---- keySkewProfile -----------------------------------------------------

  test("keySkewProfile buckets counts at exact powers of two") {
    // keys with 1, 2, 3, 4, 8 rows -> buckets 0, 1, 1, 2, 3
    val df = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(4)("d") ++ Seq.fill(8)("e")
    val out = Scale.keySkewProfile(df.toDF("k"), Seq("k"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out(0) shouldBe ((1L, 1L, 1L, 1L))
    out(1) shouldBe ((2L, 5L, 2L, 3L)) // keys b,c; 5 rows; counts 2..3
    out(2) shouldBe ((1L, 4L, 4L, 4L))
    out(3) shouldBe ((1L, 8L, 8L, 8L))
  }

  // ---- lexicalDiversity ---------------------------------------------------

  test("lexicalDiversity: TTR and hapax ratio on a known distribution") {
    val docs = Seq(
      (1L, "a a a b b c"),      // 6 tokens, 3 types, 1 hapax (c)
      (2L, "x y z"),            // all distinct, all hapax
      (3L, ""))                 // no tokens -> no row
      .toDF("doc_id", "text")
    val out = Corpus.lexicalDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    out(1L) shouldBe ((6L, 3L, 1L, 0.5, 1.0 / 3.0))
    out(2L) shouldBe ((3L, 3L, 3L, 1.0, 1.0))
    out.keySet should not contain 3L
  }

  // ---- madOutliers --------------------------------------------------------

  test("madOutliers: fence is not dragged by the planted outlier") {
    // 8 tight values + one monster; median/MAD ignore the monster
    val vals = (1 to 8).map(i => ("g", i.toDouble)) :+ (("g", 1e6))
    val out = Quality.madOutliers(vals.toDF("g", "v"), Seq("g"), "v", 3.0)
    out.count() shouldBe 1L
    out.select($"v").as[Double].collect() shouldBe Array(1e6)
    // a 3-sigma mean/stddev fence on the same data flags NOTHING: with
    // n = 9 points the largest achievable sample z is (n-1)/sqrt(n) ≈
    // 2.67 < 3 — the monster inflates the stddev past its own deviation
    val stats = vals.toDF("g", "v")
      .agg(avg($"v").as("m"), stddev($"v").as("s")).collect()(0)
    val fenced = vals.count(_._2 > stats.getDouble(0) + 3 * stats.getDouble(1))
    fenced shouldBe 0
  }

  test("madOutliers: all-identical group (MAD=0) flags only deviants") {
    val vals = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 7.0))
    val out = Quality.madOutliers(vals.toDF("g", "v"), Seq("g"), "v", 3.0)
    out.select($"v").as[Double].collect() shouldBe Array(7.0)
  }

  test("mergePartials == re-aggregating the union of raw data") {
    val raw1 = Seq(("a", 1L, 10.0), ("a", 1L, 5.0), ("b", 1L, 2.0))
      .toDF("k", "cnt", "amt")
    val raw2 = Seq(("a", 1L, 1.0), ("c", 1L, 7.0)).toDF("k", "cnt", "amt")
    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(sum($"cnt").as("cnt"), sum($"amt").as("amt"))
    val merged = Cdc.mergePartials(partial(raw1), partial(raw2),
      Seq("k"), Seq("cnt", "amt"))
    val direct = partial(raw1.union(raw2))
    rowsAsStrings(merged) shouldBe rowsAsStrings(direct)
  }
}
