package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRule

/** The optimizer rule must change the PLAN (nested loop → hash join on the
  * synthetic bin key) and never the RESULT. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 59L), (3L, 60L), (4L, 61L), (5L, 150L),
    (6L, 600L), (7L, -30L)).toDF("p_id", "pt")
  private lazy val intervals = Seq(
    (10L, 0L, 60L), (11L, 59L, 61L), (12L, 100L, 200L),
    (13L, 500L, 400L), (14L, -50L, -10L)).toDF("i_id", "lo", "hi")

  // save/restore (not unset): nesting must put back the OUTER value, or
  // an inner withBinWidth(0) would disable the rule for the rest of the
  // outer block and turn its assertions into rule-off-vs-rule-off
  private def withBinWidth[A](w: Long)(body: => A): A = {
    val prior = spark.conf.getOption(RangeJoinRule.BinWidthConf)
    spark.conf.set(RangeJoinRule.BinWidthConf, w.toString)
    try body finally prior match {
      case Some(v) => spark.conf.set(RangeJoinRule.BinWidthConf, v)
      case None => spark.conf.unset(RangeJoinRule.BinWidthConf)
    }
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("BETWEEN-only join rewrites to a hash join with identical rows") {
    val expected = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    planOf(points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi")))
      .should(include("NestedLoop")) // without the rule: the bad plan

    withBinWidth(60) {
      val df = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      val plan = planOf(df)
      plan should not include "NestedLoop"
      plan should include("HashJoin")
      df.select("p_id", "i_id").as[(Long, Long)]
        .collect().toSeq.sorted shouldBe expected
    }
  }

  test("strict bounds and flipped operand order still match") {
    // ground truth computed OUTSIDE withBinWidth: rule off
    val expected = points.join(intervals,
        col("pt") > col("lo") && col("pt") < col("hi"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    withBinWidth(10) {
      val df = points.join(intervals,
        col("lo") < col("pt") && col("hi") > col("pt"))
      planOf(df) should not include "NestedLoop"
      df.select("p_id", "i_id").as[(Long, Long)]
        .collect().toSeq.sorted shouldBe expected
    }
  }

  test("point expression on the RIGHT side is handled (mirror orientation)") {
    val expected = intervals.join(points,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("i_id", "p_id").as[(Long, Long)].collect().toSeq.sorted
    withBinWidth(60) {
      val df = intervals.join(points,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      planOf(df) should not include "NestedLoop"
      df.select("i_id", "p_id").as[(Long, Long)]
        .collect().toSeq.sorted shouldBe expected
    }
  }

  test("extra residual conjuncts survive the rewrite") {
    val expected = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi") &&
          col("p_id") =!= col("i_id") && col("pt") =!= lit(150L))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
    withBinWidth(60) {
      val df = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi") &&
          col("p_id") =!= col("i_id") && col("pt") =!= lit(150L))
      planOf(df) should not include "NestedLoop"
      df.select("p_id", "i_id").as[(Long, Long)]
        .collect().toSeq.sorted shouldBe expected
    }
  }

  test("a join that already has an equi key is left alone") {
    val l = Seq((1L, 5L), (2L, 7L)).toDF("k", "v")
    val r = Seq((1L, 0L, 10L), (2L, 8L, 9L)).toDF("k2", "lo", "hi")
    withBinWidth(60) {
      val df = l.join(r, col("k") === col("k2") &&
        col("v") >= col("lo") && col("v") <= col("hi"))
      planOf(df) should not include "__gbin"
      df.select("k").as[Long].collect().toSeq shouldBe Seq(1L)
    }
  }

  test("disabled (binWidth unset or 0) is a strict no-op") {
    val df = points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    planOf(df) should not include "__gbin"
    withBinWidth(0) { planOf(df) should not include "__gbin" }
  }
}
