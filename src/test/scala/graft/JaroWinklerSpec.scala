package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.JaroWinklerPpm
import graft.operators.Linkage

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Long =
    JaroWinklerPpm.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  // -------------------------------------------- scalar semantics

  test("identical strings score exactly 1.0 (1,000,000 ppm)") {
    jw("martha", "martha") shouldBe 1000000L
  }

  test("textbook MARTHA/MARHTA value") {
    // jaro = 0.944..., prefix 3 => jw = 0.9611...; exact rational
    // floor(ppm): m=6, t=1 (one transposed pair counts two mismatched
    // positions under the doubled-t convention folded into the formula)
    val got = jw("MARTHA", "MARHTA")
    got shouldBe 961111L
  }

  test("disjoint alphabets score 0") {
    jw("abc", "xyz") shouldBe 0L
  }

  test("empty strings score 0 by contract") {
    jw("", "abc") shouldBe 0L
    jw("abc", "") shouldBe 0L
    jw("", "") shouldBe 0L
  }

  test("prefix boost rewards shared prefixes, capped at 4 chars") {
    val short = jw("prefix_aaa", "prefix_bbb")
    val noPre = jw("aaa_prefix", "bbb_prefix")
    short should be > noPre
  }

  test("symmetry") {
    jw("dwayne", "duane") shouldBe jw("duane", "dwayne")
    jw("dwayne", "duane") shouldBe 840000L // classic example: 0.84 exactly
  }

  test("interpreted and codegen paths agree") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("apple", "aple"), ("", "x")).toDF("a", "b")
    val viaExpr = df.select(
      call_function("jaro_winkler_ppm", col("a"), col("b")).as("p"))
      .collect().map(_.getLong(0))
    val direct = df.collect().map(r => jw(r.getString(0), r.getString(1)))
    viaExpr shouldBe direct
  }

  test("null propagates") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
    df.select(call_function("jaro_winkler_ppm", col("a"), col("b")))
      .collect().head.isNullAt(0) shouldBe true
  }

  // -------------------------------------------- blocked pairing

  test("jaroWinklerPairs blocks on prefix and respects minPpm") {
    val df = Seq("martha", "marhta", "maxwell", "zebra", "zebrb")
      .toDF("name")
    val got = Linkage.jaroWinklerPairs(df, "name", blockLen = 2,
      maxLenDiff = 2, minPpm = 900000L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got.map(x => (x._1, x._2)).toSet shouldBe
      Set(("marhta", "martha"), ("zebra", "zebrb"))
    all(got.map(_._3)) should be >= 900000L
  }

  test("jaroWinklerPairs never crosses blocks") {
    val df = Seq("abcdef", "abcdeg", "xbcdef").toDF("name")
    val got = Linkage.jaroWinklerPairs(df, "name", blockLen = 2,
      maxLenDiff = 2, minPpm = 0L).collect()
    got.length shouldBe 1 // xbcdef is 93% similar but in another block
  }

  // -------------------------------------------- reciprocal best match

  test("reciprocalBestMatch keeps only mutual argmax pairs") {
    // a's best is b (95); b's best is a (95); c's best is b (90) but
    // b prefers a => (b,c) dropped
    val pairs = Seq(("a", "b", 95L), ("b", "c", 90L), ("a", "c", 10L))
      .toDF("a_value", "b_value", "jw_ppm")
    val got = Linkage.reciprocalBestMatch(pairs).collect()
      .map(r => (r.getString(0), r.getString(1)))
    got.toSet shouldBe Set(("a", "b"))
  }

  test("reciprocalBestMatch tie-breaks deterministically to the " +
    "lexicographically smallest partner") {
    val pairs = Seq(("a", "b", 90L), ("a", "c", 90L))
      .toDF("a_value", "b_value", "jw_ppm")
    // a's best: tie b/c -> b; b's best: a; c's best: a but a chose b
    Linkage.reciprocalBestMatch(pairs).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("a", "b"))
  }
}
