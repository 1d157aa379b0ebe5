package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, EventOps, Quality}

/** Round-5 wave-8 operators: cohort LTV, 2x2 chi-square, global
  * token-budget selection, OOV rate, bigram cross-entropy. */
class R5hOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  // ---- cohortLtv ----------------------------------------------------------

  test("cohortLtv cohorts by first month and accumulates revenue") {
    val orders = Seq(
      (1L, ts("2024-01-05"), 10.0),  // cohort Jan
      (1L, ts("2024-03-10"), 30.0),  // Jan offset 2
      (2L, ts("2024-01-20"), 5.0),   // cohort Jan
      (3L, ts("2024-02-01"), 7.0))   // cohort Feb
      .toDF("cust", "dt", "v")
    val out = EventOps.cohortLtv(orders, "cust", "dt", "v")
      .orderBy("cohort_month", "month_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDecimal(5).doubleValue, r.getDouble(6)))
    out shouldBe Array(
      ("2024-01-01", 0, 2L, 2L, 15.0, 7.5),
      ("2024-01-01", 2, 2L, 1L, 45.0, 22.5),
      ("2024-02-01", 0, 1L, 1L, 7.0, 7.0))
  }

  test("cohortLtv: cumulative revenue is exact decimal, gaps allowed") {
    val orders = Seq(
      (1L, ts("2024-01-01"), 0.1), (1L, ts("2024-04-01"), 0.2))
      .toDF("cust", "dt", "v")
    val out = EventOps.cohortLtv(orders, "cust", "dt", "v")
      .orderBy("month_offset").collect()
    out.map(_.getInt(1)) shouldBe Array(0, 3) // offsets 1,2 absent
    out.last.getDecimal(5).doubleValue shouldBe 0.3 // 0.1+0.2 exact
  }

  // ---- chi2TwoByTwo -------------------------------------------------------

  private def units(aN: Int, aS: Int, bN: Int, bS: Int) = {
    val rows = Seq.tabulate(aN)(i => ("A", if (i < aS) 1 else 0)) ++
      Seq.tabulate(bN)(i => ("B", if (i < bS) 1 else 0))
    rows.toDF("variant", "conv")
  }

  test("chi2TwoByTwo matches the closed form") {
    // a=30/100 vs c=10/100: chi2 = 200*(30*90-70*10)^2/(100*100*40*160)
    val out = Quality.chi2TwoByTwo(units(100, 30, 100, 10),
      "variant", "conv").collect()
    out.length shouldBe 1
    val r = out(0)
    r.getString(0) shouldBe "A"
    r.getString(1) shouldBe "B"
    r.getLong(2) shouldBe 100L
    r.getLong(3) shouldBe 30L
    r.getDouble(6) shouldBe 0.30 +- 1e-12
    r.getDouble(8) shouldBe 12.5 +- 1e-9
  }

  test("chi2TwoByTwo is NULL on a zero margin and empty unless 2 variants") {
    // no successes anywhere -> (a+c) margin 0 -> chi2 NULL
    val zero = Quality.chi2TwoByTwo(units(50, 0, 50, 0), "variant", "conv")
      .collect()
    zero.length shouldBe 1
    zero(0).isNullAt(8) shouldBe true
    // one variant only -> no row
    Quality.chi2TwoByTwo(units(50, 10, 0, 0), "variant", "conv")
      .collect() shouldBe empty
  }

  test("chi2TwoByTwo pins variants by name regardless of input order") {
    val df = units(40, 20, 60, 15).orderBy(col("variant").desc)
    val r = Quality.chi2TwoByTwo(df, "variant", "conv").collect()(0)
    (r.getString(0), r.getLong(2), r.getLong(3)) shouldBe ("A", 40L, 20L)
    (r.getString(1), r.getLong(4), r.getLong(5)) shouldBe ("B", 60L, 15L)
  }

  // ---- takeGlobalTokenBudget ----------------------------------------------

  private val budgetDocs = Seq(
    (1L, 5.0, 40L), (2L, 4.0, 30L), (3L, 4.0, 20L),
    (4L, 3.0, 25L), (5L, 1.0, 10L))
    .toDF("doc_id", "score", "toks")

  test("takeGlobalTokenBudget equals the naive global running sum") {
    for (budget <- Seq(0L, 39L, 40L, 90L, 114L, 115L, 1000L);
         buckets <- Seq(1, 2, 4096)) {
      val fast = Corpus.takeGlobalTokenBudget(budgetDocs, "doc_id",
        col("score"), col("toks"), budget, buckets, smallInputMaxRows = 0L)
        .select("doc_id", "cum_tokens").orderBy("cum_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = budgetDocs
        .withColumn("cum", sum(col("toks")).over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .filter(col("cum") <= budget)
        .select("doc_id", "cum").orderBy("cum")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      withClue(s"budget=$budget buckets=$buckets: ") { fast shouldBe naive }
    }
  }

  test("takeGlobalTokenBudget: equal scores break ties by id") {
    val out = Corpus.takeGlobalTokenBudget(budgetDocs, "doc_id",
      col("score"), col("toks"), 90L)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    out shouldBe Array(1L, 2L, 3L) // 40+30+20=90; doc 2 before doc 3
  }

  test("takeGlobalTokenBudget handles a constant score column") {
    val const = Seq((1L, 2.0, 10L), (2L, 2.0, 10L), (3L, 2.0, 10L))
      .toDF("doc_id", "score", "toks")
    Corpus.takeGlobalTokenBudget(const, "doc_id", col("score"),
      col("toks"), 20L)
      .select("doc_id").orderBy("doc_id").collect()
      .map(_.getLong(0)) shouldBe Array(1L, 2L)
  }

  // ---- oovRate ------------------------------------------------------------

  test("oovRate measures occurrence coverage against the top-K vocab") {
    val docs = Seq(
      (1L, "the the the cat"),   // 'the' x3 dominates the vocab
      (2L, "the dog"),
      (3L, "zebra"))
      .toDF("doc_id", "text")
    // topK=1 -> vocab = {the} (4 occurrences)
    val out = Corpus.oovRate(docs, "doc_id", "text", 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out shouldBe Array(
      (1L, 4L, 1L, 0.25),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 1L, 1.0))
  }

  test("oovRate: empty documents emit nothing, vocab ties break by token") {
    val docs = Seq((1L, "b a"), (2L, "   "), (3L, "b"))
      .toDF("doc_id", "text")
    // counts: b=2, a=1 -> topK=1 keeps 'b'
    val out = Corpus.oovRate(docs, "doc_id", "text", 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    out shouldBe Array((1L, 1L), (3L, 0L))
  }

  // ---- bigramCrossEntropy -------------------------------------------------

  test("bigramCrossEntropy matches the closed form on a tiny corpus") {
    // corpus bigrams: doc1 "a b a b" -> (a b) x2, (b a) x1
    //                 doc2 "a c"     -> (a c) x1
    // prefix a: 3 -> P(b|a)=2/3, P(c|a)=1/3; prefix b: 1 -> P(a|b)=1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Corpus.bigramCrossEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val S = 1073741824.0
    def lp(x: Double) = math.floor(math.log(x) * S) / S
    val d1 = -(2 * lp(2.0 / 3) + 1 * lp(1.0)) / 3
    val d2 = -lp(1.0 / 3) / 1
    out(0)._1 shouldBe 1L
    out(0)._2 shouldBe 3L
    out(0)._3 shouldBe d1 +- 1e-12
    out(1)._3 shouldBe d2 +- 1e-12
  }

  test("bigramCrossEntropy drops documents with fewer than 2 tokens") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"))
      .toDF("doc_id", "text")
    Corpus.bigramCrossEntropy(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)) shouldBe Array(3L)
  }
}
