package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- KS test

  test("ksTest identical samples give D = 0 and p = 1") {
    val df = (1 to 50).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
      .toDF("v", "a")
    val got = Stats.ksTest(df, col("v"), col("a")).collect().head
    got.getAs[Long]("n_a") shouldBe 50L
    got.getAs[Long]("n_b") shouldBe 50L
    got.getAs[Double]("ks_d") shouldBe 0.0
    got.getAs[Double]("p_value") shouldBe 1.0
  }

  test("ksTest disjoint samples give D = 1 at the last A value") {
    val df = ((1 to 20).map(i => (i.toDouble, true)) ++
      (21 to 40).map(i => (i.toDouble, false))).toDF("v", "a")
    val got = Stats.ksTest(df, col("v"), col("a")).collect().head
    got.getAs[Double]("ks_d") shouldBe 1.0
    got.getAs[Double]("ks_at_value") shouldBe 20.0
    got.getAs[Double]("p_value") should be < 1e-6
  }

  test("ksTest matches the hand-computed D on a small asymmetric case") {
    // A = {1,2,3,4}, B = {3,4,5,6}: D attained at v=2 (and v=4): |2/4-0|=0.5
    val df = (Seq(1, 2, 3, 4).map(v => (v.toDouble, true)) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, false))).toDF("v", "a")
    val got = Stats.ksTest(df, col("v"), col("a")).collect().head
    got.getAs[Double]("ks_d") shouldBe 0.5
    got.getAs[Double]("ks_at_value") shouldBe 2.0 // smallest argmax wins
  }

  test("ksTest ignores NULL values and NULL sample flags") {
    val df = Seq[(java.lang.Double, java.lang.Boolean)](
      (1.0, true), (2.0, false), (null, true), (3.0, null))
      .toDF("v", "a")
    val got = Stats.ksTest(df, col("v"), col("a")).collect().head
    got.getAs[Long]("n_a") shouldBe 1L
    got.getAs[Long]("n_b") shouldBe 1L
  }

  test("ksTest telescoped cumulative path equals the plain-window path") {
    val df = (1 to 500).map { i =>
      (math.sin(i.toDouble) * 100, i % 3 == 0)
    }.toDF("v", "a")
    val plain = Stats.ksTest(df, col("v"), col("a")).collect().head
    // cap 0 forces the bucketed prefix-sum path on the same data
    val forced = Stats.ksTest(df, col("v"), col("a"),
      smallInputMaxRows = 0L).collect().head
    forced.getAs[Double]("ks_d") shouldBe plain.getAs[Double]("ks_d")
    forced.getAs[Double]("ks_at_value") shouldBe
      plain.getAs[Double]("ks_at_value")
    forced.getAs[Double]("p_value") shouldBe plain.getAs[Double]("p_value")
  }

  // -------------------------------------------- Mann–Whitney

  test("mannWhitney no-tie case matches the textbook U") {
    // A = {1,2,3}, B = {4,5,6}: R_A = 6, U_A = 0, U_B = 9
    val df = (Seq(1, 2, 3).map(v => (v.toDouble, true)) ++
      Seq(4, 5, 6).map(v => (v.toDouble, false))).toDF("v", "a")
    val got = Stats.mannWhitney(df, col("v"), col("a")).collect().head
    got.getAs[Double]("u_a") shouldBe 0.0
    got.getAs[Double]("u_b") shouldBe 9.0
    got.getAs[Double]("z") should be < 0.0
  }

  test("mannWhitney U_A + U_B = n_a * n_b under heavy ties") {
    val df = (Seq.fill(10)((2.0, true)) ++ Seq.fill(8)((2.0, false)) ++
      Seq.fill(5)((7.0, true)) ++ Seq.fill(7)((7.0, false))).toDF("v", "a")
    val got = Stats.mannWhitney(df, col("v"), col("a")).collect().head
    val na = got.getAs[Long]("n_a"); val nb = got.getAs[Long]("n_b")
    (got.getAs[Double]("u_a") + got.getAs[Double]("u_b")) shouldBe
      (na * nb).toDouble
  }

  test("mannWhitney symmetric samples give z = 0") {
    val df = (Seq(1, 2, 3, 4).map(v => (v.toDouble, true)) ++
      Seq(1, 2, 3, 4).map(v => (v.toDouble, false))).toDF("v", "a")
    val got = Stats.mannWhitney(df, col("v"), col("a")).collect().head
    got.getAs[Double]("u_a") shouldBe 8.0
    got.getAs[Double]("z") shouldBe 0.0
  }

  test("mannWhitney telescoped cumulative path equals the plain path") {
    val df = (1 to 400).map { i =>
      ((i % 37).toDouble + (if (i % 2 == 0) 0.5 else 0.0), i % 5 != 0)
    }.toDF("v", "a")
    val plain = Stats.mannWhitney(df, col("v"), col("a")).collect().head
    val forced = Stats.mannWhitney(df, col("v"), col("a"),
      smallInputMaxRows = 0L).collect().head
    forced.getAs[Double]("u_a") shouldBe plain.getAs[Double]("u_a")
    forced.getAs[Double]("z") shouldBe plain.getAs[Double]("z")
  }

  test("mannWhitney all-ties average rank: U_A = n_a*n_b/2") {
    val df = (Seq.fill(4)((5.0, true)) ++ Seq.fill(6)((5.0, false)))
      .toDF("v", "a")
    val got = Stats.mannWhitney(df, col("v"), col("a")).collect().head
    got.getAs[Double]("u_a") shouldBe 12.0 // 4*6/2
  }

  // -------------------------------------------- JS divergence

  test("jsDivergence identical distributions score 0 bits") {
    val df = Seq(("s1", "a b c"), ("s2", "a b c")).toDF("src", "text")
    val got = Stats.jsDivergence(df, "text", "src").collect().head
    got.getAs[Double]("jsd_bits") shouldBe 0.0 +- 1e-8
    got.getAs[Long]("n_shared_terms") shouldBe 3L
  }

  test("jsDivergence disjoint vocabularies score 1 bit") {
    val df = Seq(("s1", "a b"), ("s2", "x y z")).toDF("src", "text")
    val got = Stats.jsDivergence(df, "text", "src").collect().head
    got.getAs[Double]("jsd_bits") shouldBe 1.0 +- 1e-9
    got.getAs[Long]("n_shared_terms") shouldBe 0L
  }

  test("jsDivergence emits every unordered pair exactly once") {
    val df = Seq(("s1", "a"), ("s2", "a"), ("s3", "b")).toDF("src", "text")
    val got = Stats.jsDivergence(df, "text", "src").collect()
    got.map(r => (r.getAs[String]("group_a"), r.getAs[String]("group_b")))
      .sorted shouldBe Array(("s1", "s2"), ("s1", "s3"), ("s2", "s3"))
  }

  test("jsDivergence is symmetric in the two distributions") {
    // swap which source carries which text: jsd must be identical
    val d1 = Seq(("aa", "a a b"), ("bb", "b c c")).toDF("src", "text")
    val d2 = Seq(("aa", "b c c"), ("bb", "a a b")).toDF("src", "text")
    val j1 = Stats.jsDivergence(d1, "text", "src").collect()
      .head.getAs[Double]("jsd_bits")
    val j2 = Stats.jsDivergence(d2, "text", "src").collect()
      .head.getAs[Double]("jsd_bits")
    j1 shouldBe j2 +- 1e-12
    j1 should be > 0.0
    j1 should be < 1.0
  }

  test("logBucketQuantiles: bucket bounds bracket the exact quantile " +
    "and error is within 1/subBuckets") {
    import spark.implicits._
    // group a: 1..1000 (p50=500, p90=900, p99=990); group b: all 7s
    val df = ((1L to 1000L).map(v => ("a", v)) ++
      Seq.fill(10)(("b", 7L))).toDF("g", "v")
    val out = graft.operators.Stats.logBucketQuantiles(df, Seq("g"), "v",
        subBuckets = 16, qs = Seq(0.5, 0.9, 0.99))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Double]("q")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("est_lo"),
          r.getAs[Long]("est_hi")))).toMap
    val exact = Map(0.5 -> 500L, 0.9 -> 900L, 0.99 -> 990L)
    exact.foreach { case (q, want) =>
      val (n, lo, hi) = out(("a", q))
      n shouldBe 1000L
      assert(lo <= want && want < hi, s"q=$q: [$lo,$hi) misses $want")
      // relative width of the bucket is bounded by 1/subBuckets
      (hi - lo).toDouble / lo.toDouble should be <= (1.0 / 16 + 1e-9)
    }
    // a constant group: every quantile lands in 7's bucket
    out(("b", 0.5))._2 should be <= 7L
    out(("b", 0.5))._3 should be > 7L
  }

  test("logBucketQuantiles: non-positive values land in the underflow " +
    "bucket [0, 1)") {
    import spark.implicits._
    val df = Seq(("z", 0L), ("z", 0L), ("z", 5L)).toDF("g", "v")
    val out = graft.operators.Stats.logBucketQuantiles(df, Seq("g"), "v",
        subBuckets = 16, qs = Seq(0.5))
      .collect().head
    out.getAs[Long]("est_lo") shouldBe 0L
    out.getAs[Long]("est_hi") shouldBe 1L
  }

  test("logBucketQuantiles: no Long overflow near Long.MaxValue " +
    "(divide-first sub-bucket math)") {
    import spark.implicits._
    // e = 62 values: the old (x-base)*subBuckets form wraps negative for
    // e >= 59 with subBuckets=16; the exact divide-first form must keep
    // bucket ids in [0, 16) and bounds that bracket the value, with the
    // top sub-bucket's exclusive 2^63 bound clamped to Long.MaxValue
    val big = Seq(
      ("h", Long.MaxValue), ("h", Long.MaxValue - 1),
      ("h", (1L << 62) + 5L), ("h", 3L << 61) // 3·2^61 = mid of [2^62, 2^63)
    ).toDF("g", "v")
    val sk = graft.operators.Stats.logBucketSketch(big, Seq("g"), "v")
      .collect()
    sk.foreach { r =>
      val sub = r.getAs[Long]("__sub")
      assert(sub >= 0 && sub < 16, s"sub-bucket out of range: $r")
      r.getAs[Int]("__e") shouldBe 62
    }
    val out = graft.operators.Stats.logBucketQuantiles(big, Seq("g"), "v",
        subBuckets = 16, qs = Seq(0.99))
      .collect().head
    val (lo, hi) = (out.getAs[Long]("est_lo"), out.getAs[Long]("est_hi"))
    assert(lo > 0 && hi > lo, s"overflowed bounds: [$lo, $hi)")
    assert(lo <= Long.MaxValue && Long.MaxValue <= hi,
      s"p99 bucket [$lo, $hi] misses Long.MaxValue")
  }

  test("logBucketSketch is exactly mergeable: sketch(A ++ B) == " +
    "merge(sketch(A), sketch(B)), and quantiles agree") {
    import spark.implicits._
    val a = (1L to 400L).map(v => ("g", v)).toDF("g", "v")
    val b = (300L to 1000L).map(v => ("g", v)).toDF("g", "v")
    val S = graft.operators.Stats
    val merged = S.mergeLogBucketSketches(
      S.logBucketSketch(a, Seq("g"), "v"),
      S.logBucketSketch(b, Seq("g"), "v"), Seq("g"))
    val whole = S.logBucketSketch(a.unionByName(b), Seq("g"), "v")
    merged.collect().map(_.toSeq).toSet shouldBe
      whole.collect().map(_.toSeq).toSet
    val qm = S.logBucketQuantilesFromSketch(merged, Seq("g"), 16, Seq(0.5))
      .collect().map(_.toSeq)
    val qw = S.logBucketQuantiles(a.unionByName(b), Seq("g"), "v",
      16, Seq(0.5)).collect().map(_.toSeq)
    qm shouldBe qw
  }
}
