package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFunctions}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split, empties removed") {
    val out = Seq("  the  quick\tbrown\nfox ").toDF("t")
      .select(TextFunctions.tokens($"t").as("w"))
      .as[Seq[String]].head()
    out shouldBe Seq("the", "quick", "brown", "fox")
  }

  test("wordShingles: overlapping n-grams; empty when doc shorter than n") {
    val df = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles(TextFunctions.tokens($"t"), 3).as("s"))
    df.as[Seq[String]].head() shouldBe Seq("a b c", "b c d")
    Seq("a b").toDF("t")
      .select(TextFunctions.wordShingles(TextFunctions.tokens($"t"), 3).as("s"))
      .as[Seq[String]].head() shouldBe Seq.empty
  }

  test("langScore counts marker hits") {
    val df = Seq("the cat and the dog").toDF("t")
      .select(TextFunctions.langScore(TextFunctions.tokens($"t"),
        TextFunctions.langMarkers.toMap.apply("en")).as("c"))
    df.as[Int].head() shouldBe 3 // the, and, the
  }

  test("stopwordRatio: ratio of stopword tokens, NULL for empty docs") {
    Seq("the a xyz").toDF("t")
      .select(TextFunctions.stopwordRatio(TextFunctions.tokens($"t")).as("r"))
      .as[Double].head() shouldBe (2.0 / 3.0) +- 1e-12
    Seq("").toDF("t")
      .select(TextFunctions.stopwordRatio(TextFunctions.tokens($"t")).as("r"))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("bpeTokenCount: alpha runs, digit runs, single punctuation") {
    Seq("abc12,de!").toDF("t")
      .select(TextFunctions.bpeTokenCount($"t").as("n"))
      .as[Long].head() shouldBe 5 // abc | 12 | , | de | !
  }

  test("fingerprint is stable and robust to edits far from the min shingle") {
    val base = "one two three four five six seven eight nine ten"
    val Seq(f1, f2) = Seq(base, base + " extra trailing words here")
      .toDF("t").select(TextFunctions.fingerprint($"t").as("f"))
      .as[String].collect().toSeq
    f1 should have length 32
    // identical prefix shingles dominate unless the new min lands in the tail
    noException should be thrownBy java.lang.Long.parseLong(f1.take(8), 16)
  }

  test("Hashing canonicalization: NULL→'', upper-case, '|' separator") {
    val out = Seq(("a", null: String)).toDF("x", "y")
      .select(Hashing.canonical(Seq($"x", $"y")).as("c")).as[String].head()
    out shouldBe "A|"
    // hashDiff equals sha2 of the canonical form
    val hd = Seq(("a", "b")).toDF("x", "y")
      .select(Hashing.hashDiff(Seq($"x", $"y")).as("h")).as[String].head()
    hd shouldBe org.apache.commons.codec.digest.DigestUtils.sha256Hex("A|B")
  }
}
