package graft

import org.apache.spark.sql.functions._

import graft.operators.{Eval, NearDup}

class EncodingPlannerSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- targetEncodeOof

  test("encoding excludes the cell's own fold") {
    // value v: fold 0 rows have y=100, fold 1 rows y=300
    val df = Seq(("v", 0, 100L), ("v", 0, 100L), ("v", 1, 300L),
      ("v", 1, 300L)).toDF("value", "fold", "y")
    val got = Eval.targetEncodeOof(df, col("value"), col("fold"),
      col("y")).collect()
      .map(r => r.getAs[Int]("fold") -> r.getAs[Double]("encoding")).toMap
    got(0) shouldBe 3.0 // sees only fold-1 rows: 300 cents = 3.00
    got(1) shouldBe 1.0
  }

  test("single-fold values get NULL (no out-of-fold evidence)") {
    val df = Seq(("solo", 2, 500L)).toDF("value", "fold", "y")
    val r = Eval.targetEncodeOof(df, col("value"), col("fold"), col("y"))
      .collect().head
    r.isNullAt(r.fieldIndex("encoding")) shouldBe true
  }

  // -------------------------------------------- lshPlanner

  private val docs = (1 to 40).map { i =>
    // pairs of near-identical docs (high sim) plus unique docs
    val base = s"w${i / 2}a w${i / 2}b w${i / 2}c w${i / 2}d w${i / 2}e"
    (i.toLong, if (i % 2 == 0) base else base + s" extra$i")
  }.toDF("doc_id", "text")

  test("more rows per band trades recall for precision") {
    val got = NearDup.lshPlanner(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")) ->
        (r.getAs[Double]("exp_recall"), r.getAs[Double]("exp_fp_rate")))
      .toMap
    // b=24,r=1: everything collides -> max recall, max fp
    val loose = got((24, 1))
    val strict = got((1, 24))
    loose._1 should be >= strict._1
    loose._2 should be >= strict._2
    loose._1 should be > 0.9
  }

  test("recall is monotone in bands at fixed budget") {
    val got = NearDup.lshPlanner(docs, "doc_id", "text").collect()
      .sortBy(_.getAs[Int]("bands"))
      .map(_.getAs[Double]("exp_recall"))
    got.toSeq.sliding(2).foreach { case Seq(a, b) => b should be >= a }
  }
}
