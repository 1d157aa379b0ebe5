package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Quality}

/** Round-4 wave-5 operators: winsorized/trimmed stats, URL canonical
  * dedup, temperature mixing, fixed-range histograms. */
class R4eOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- winsorizedStats ----------------------------------------------------

  test("winsorizedStats: cutoffs clamp the outlier, trimmed mean drops it") {
    // 10 values 1..9 plus outlier 1000; p10/p90 -> klo=1, khi=9
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("G", _)).toDF("g", "v")
    val r = Quality.winsorizedStats(df, Seq("g"), "v", 0.1, 0.9)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    r._2 shouldBe 10L
    r._3 shouldBe 1.0 // low cut = value at rank 1
    r._4 shouldBe 9.0 // high cut = value at rank 9
    // winsorized: 1 + (1..9 clamped is itself) + outlier -> 9  = 54 total
    r._5 shouldBe (45.0 + 9.0) / 10.0
    // trimmed: ranks 2..9 = 2..9 -> mean 5.5
    r._6 shouldBe 44.0 / 8.0
  }

  test("winsorizedStats: tie-straddling cut leaves sums invariant") {
    // ties at the cut boundary: which tied row is trimmed cannot matter
    val base = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0)
    val a = base.map(("G", _)).toDF("g", "v").repartition(1)
    val b = base.reverse.map(("G", _)).toDF("g", "v").repartition(7)
    val ra = Quality.winsorizedStats(a, Seq("g"), "v", 0.2, 0.8)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    val rb = Quality.winsorizedStats(b, Seq("g"), "v", 0.2, 0.8)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    ra shouldBe rb
  }

  test("winsorizedStats: singleton group yields NULL trimmed mean, no abort") {
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0), ("b", 3.0),
      ("b", 4.0), ("b", 5.0)).toDF("g", "v")
    val out = Quality.winsorizedStats(df, Seq("g"), "v", 0.2, 0.8)
      .select($"g", $"trimmed_mean").as[(String, Option[Double])]
      .collect().toMap
    out("a") shouldBe None // klo == khi == 1: empty trim window
    out("b").isDefined shouldBe true
  }

  // ---- canonicalUrl / urlResolve ------------------------------------------

  test("canonicalUrl: scheme/host case, www, default ports, junk stripped") {
    val in = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?utm=1#frag",
      "http://example.com/a/b",
      "https://example.com:443/a/b",
      "https://example.com:8443/a/b",
      "http://example.com",
      "http://example.com/")
    val out = in.toDF("u").select(Corpus.canonicalUrl($"u")).as[String]
      .collect().toList
    out shouldBe List(
      "http://example.com/a/b",
      "http://example.com/a/b",
      "https://example.com/a/b",
      "https://example.com:8443/a/b",
      "http://example.com",
      "http://example.com")
  }

  test("urlResolve: variants collapse to one keeper per canonical url") {
    val df = Seq(
      (3L, "http://www.site.com/x"),
      (1L, "HTTP://SITE.com/x/"),
      (2L, "http://site.com:80/x?q=1"),
      (9L, "https://site.com/x") // different scheme -> different group
    ).toDF("id", "url")
    val out = Corpus.urlResolve(df, "id", "url")
      .as[(String, Long, Long)].collect().toSet
    out shouldBe Set(
      ("http://site.com/x", 3L, 1L),
      ("https://site.com/x", 1L, 9L))
  }

  // ---- temperatureMix -----------------------------------------------------

  test("temperatureMix: quotas sum to budget, alpha=2 up-weights big sources") {
    val docs = (1 to 60).map(i =>
      (i.toLong, if (i <= 30) "big" else if (i <= 50) "mid" else "small"))
      .toDF("id", "source")
    val out = Corpus.temperatureMix(docs, "source", alpha = 2, budget = 100L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    out.values.map(_._4).sum shouldBe 100L
    // weights 900/400/100, W=1400: floors 64/28/7, remainders 400/800/200
    // -> the one leftover slot goes to `mid` (largest remainder)
    out("big")._4 shouldBe 64L
    out("mid")._4 shouldBe 29L
    out("small")._4 shouldBe 7L
    // alpha=2 gives `big` more than its 50% count share
    out("big")._4.toDouble / 100 should be > 0.5
  }

  test("temperatureMix: alpha=1 is plain proportional apportionment") {
    val docs = (1 to 10).map(i => (i.toLong, if (i <= 7) "a" else "b"))
      .toDF("id", "source")
    val out = Corpus.temperatureMix(docs, "source", alpha = 1, budget = 10L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    out shouldBe Map("a" -> 7L, "b" -> 3L)
  }

  // ---- histogram ----------------------------------------------------------

  test("histogram: bucket edges, clamping, and empty buckets omitted") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.9, 100.0, 250.0)
      .map(("G", _)).toDF("g", "v")
    val out = Quality.histogram(df, Seq("g"), "v",
        nBuckets = 10, lo = 0.0, hi = 100.0)
      .select($"bucket", $"n_rows", $"bucket_lo")
      .as[(Int, Long, Double)].collect().toSet
    out shouldBe Set(
      (0, 3L, 0.0),   // -5 clamps up, 0.0 and 9.9 in bucket 0
      (1, 1L, 10.0),
      (2, 1L, 25.0 - 5.0), // 25.0 -> bucket 2, lo 20
      (9, 3L, 90.0))  // 99.9, plus 100 and 250 clamp down
  }
}
