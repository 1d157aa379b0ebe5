package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Cdc, Stats}

class R6qOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- delta join maintenance

  private def maintainEqualsFull(factSplit: Column, dimSplit: Column): Unit = {
    val fact = (1L to 40L).map(i => (i, i % 10 + 1, i * 1.5))
      .toDF("fk", "cust", "amt")
    val dim = (1L to 12L).map(i => (i, s"name-$i")).toDF("ck", "nm")
    val cols = Seq("fk", "cust", "amt", "nm")
    val cond = (f: DataFrame, d: DataFrame) => f("cust") === d("ck")
    val fOld = fact.filter(!factSplit); val fNew = fact.filter(factSplit)
    val dOld = dim.filter(!dimSplit); val dNew = dim.filter(dimSplit)
    val mat = fOld.join(dOld, fOld("cust") === dOld("ck"))
      .select(cols.map(col): _*)
    val got = Cdc.deltaJoinMaintain(mat, fOld, fNew, dOld, dNew, cond, cols)
      .collect().map(_.toSeq).sortBy(_.toString)
    val full = fact.join(dim, fact("cust") === dim("ck"))
      .select(cols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    got shouldBe full
  }

  test("deltaJoinMaintain equals the full re-join (generic split)") {
    maintainEqualsFull(col("fk") > 30L, col("ck") % 4 === 0)
  }

  test("deltaJoinMaintain handles empty deltas (no-op refresh)") {
    maintainEqualsFull(lit(false), lit(false))
  }

  test("deltaJoinMaintain handles everything-is-delta (cold start)") {
    maintainEqualsFull(lit(true), lit(true))
  }

  test("deltaJoinMaintain covers new-fact-to-new-dim matches") {
    // fact rows pointing ONLY at delta dims: lost unless the ΔF⋈ΔD term
    // is present
    val fact = Seq((1L, 100L, 1.0)).toDF("fk", "cust", "amt")
    val dim = Seq((100L, "fresh")).toDF("ck", "nm")
    val cols = Seq("fk", "cust", "amt", "nm")
    val cond = (f: DataFrame, d: DataFrame) => f("cust") === d("ck")
    val empty = fact.limit(0)
    val emptyD = dim.limit(0)
    val mat = empty.join(emptyD, cond(empty, emptyD))
      .select(cols.map(col): _*)
    val got = Cdc.deltaJoinMaintain(mat, empty, fact, emptyD, dim, cond,
      cols).collect()
    got.length shouldBe 1
    got.head.getAs[String]("nm") shouldBe "fresh"
  }

  // -------------------------------------------- Zipf fit

  test("zipfFit recovers an exact power law slope") {
    // freq = 1000 / rank exactly (integer grid): slope must be ~ -1
    val words = (1 to 50).flatMap(r => Seq.fill(1000 / r)(s"w%03d".format(r)))
    val df = words.map(w => Tuple1(w)).toDF("text") // one token per doc
    val got = Stats.zipfFit(df, "text", topN = 50).collect().head
    got.getAs[Long]("n_terms") shouldBe 50L
    got.getAs[Double]("slope") shouldBe -1.0 +- 0.05
  }

  test("zipfFit flat distribution gives slope ~ 0") {
    val df = (1 to 40).flatMap(r => Seq.fill(100)(s"t$r"))
      .map(w => Tuple1(w)).toDF("text")
    val got = Stats.zipfFit(df, "text", topN = 40).collect().head
    got.getAs[Double]("slope") shouldBe 0.0 +- 1e-6
    // intercept then is ln(100)
    got.getAs[Double]("intercept") shouldBe math.log(100.0) +- 0.01
  }

  test("zipfFit caps the fit at topN terms") {
    val df = (1 to 100).flatMap(r => Seq.fill(101 - r)(s"u%03d".format(r)))
      .map(w => Tuple1(w)).toDF("text")
    Stats.zipfFit(df, "text", topN = 10).collect()
      .head.getAs[Long]("n_terms") shouldBe 10L
  }

  // -------------------------------------------- readability

  test("syllable heuristic counts vowel groups") {
    val got = Seq(Tuple1("the quick brown fox jumped over beautiful trees"))
      .toDF("t")
      .select(TextFunctions.syllableCount(
        TextFunctions.tokens(col("t"))).as("s"))
      .collect().head.getAs[Int]("s")
    // the:1 quick:1 brown:1 fox:1 jumped:2 over:2 beautiful:3
    // (eau/i/u) trees:1 -> 12 under the vowel-group heuristic
    got shouldBe 12
  }

  test("sentences splits on terminal punctuation and drops blanks") {
    val got = Seq(Tuple1("One. Two! Three?? ")).toDF("t")
      .select(org.apache.spark.sql.functions.size(
        TextFunctions.sentences(col("t"))).as("n"))
      .collect().head.getAs[Int]("n")
    got shouldBe 3
  }

  test("flesch formula matches a hand-computed document") {
    val df = Seq((1L, "the cat sat. the dog ran.")).toDF("doc_id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val got = df.select(
      org.apache.spark.sql.functions.size(toks).as("w"),
      org.apache.spark.sql.functions.size(
        TextFunctions.sentences(col("text"))).as("s"),
      TextFunctions.syllableCount(toks).as("y")).collect().head
    // whitespace tokens: the cat sat. the dog ran. -> 6
    got.getAs[Int]("w") shouldBe 6
    got.getAs[Int]("s") shouldBe 2
    // one vowel group per word ("sat." still has just "a"): 6
    got.getAs[Int]("y") shouldBe 6
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    (206.835 - 1.015 * 3.0 - 84.6 * 1.0) shouldBe 119.19 +- 1e-9
  }
}
