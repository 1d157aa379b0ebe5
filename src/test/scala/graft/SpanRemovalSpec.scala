package graft

import graft.operators.Corpus

/** Exact-substring dedup with removal (Corpus.removeDuplicatedSpans). */
class SpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], spanLen: Int)
  : Map[Long, (Int, Long, String)] =
    Corpus.removeDuplicatedSpans(
      docs.toDF("doc_id", "text"), "doc_id", "text", spanLen)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cross-document repeated span: first doc keeps it, later doc loses it") {
    val shared = "a b c d" // 4-token span, spanLen = 4
    val out = run(Seq(
      1L -> s"x1 $shared y1",
      2L -> s"x2 $shared y2 z2"), spanLen = 4)
    out(1L) shouldBe ((6, 0L, s"x1 $shared y1"))
    // doc 2: positions 1..4 removed
    out(2L) shouldBe ((7, 4L, "x2 y2 z2"))
  }

  test("within-document repeat: only the first occurrence survives") {
    val out = run(Seq(1L -> "a b c a b c"), spanLen = 3)
    // spans: (0,"a b c") canonical, (1,"b c a"), (2,"c a b") canonical(unique),
    // (3,"a b c") duplicate -> removes positions 3,4,5
    out(1L) shouldBe ((6, 3L, "a b c"))
  }

  test("docs shorter than spanLen pass through whole; empty docs survive") {
    val out = run(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c", // < spanLen, even though it's a prefix of doc 1
      3L -> ""), spanLen = 8)
    out(2L) shouldBe ((3, 0L, "a b c"))
    out(3L) shouldBe ((0, 0L, ""))
    out(1L)._2 shouldBe 0L
  }

  test("overlapping duplicate spans remove the union of covered positions") {
    // doc 2 repeats a 5-token run; with spanLen=4 the two duplicate spans
    // (positions 0..3 and 1..4 of the run) overlap — union, not sum
    val run5 = "p q r s t"
    val out = run(Seq(
      1L -> s"$run5 u v w",
      2L -> s"$run5 x y z"), spanLen = 4)
    out(1L)._2 shouldBe 0L
    out(2L) shouldBe ((8, 5L, "x y z"))
  }

  test("canonical pick is by (doc_id, position), deterministic") {
    // same span appears at position 2 of doc 1 and position 0 of doc 2:
    // doc 1 wins (lower doc_id), despite the later in-doc position
    val out = run(Seq(
      1L -> "x y a b c d",
      2L -> "a b c d w v u t"), spanLen = 4)
    out(1L) shouldBe ((6, 0L, "x y a b c d"))
    out(2L) shouldBe ((8, 4L, "w v u t"))
  }
}
