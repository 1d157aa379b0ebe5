package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Quality}

class R6lOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------- Kaplan-Meier

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 00:00:00")

  test("kaplanMeier matches the hand-computed KM curve with censoring") {
    // 4 users sign up on day 1. u1 converts day 2 (t=1), u2 converts
    // day 3 (t=2), u3 and u4 never convert; the horizon is day 4
    // (u4's last event), so both are censored at t=3.
    val events = Seq(
      (1L, ts(1), "signup"), (1L, ts(2), "purchase"),
      (2L, ts(1), "signup"), (2L, ts(3), "purchase"),
      (3L, ts(1), "signup"),
      (4L, ts(1), "signup"), (4L, ts(4), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = EventOps.kaplanMeier(events, col("user_id"), col("ts"),
      col("event_type"), "signup", "purchase")
      .orderBy("t_days").collect()
    got.map(_.getAs[Int]("t_days")).toSeq shouldBe Seq(1, 2, 3)
    got.map(_.getAs[Long]("n_risk")).toSeq shouldBe Seq(4L, 3L, 2L)
    got.map(_.getAs[Long]("n_events")).toSeq shouldBe Seq(1L, 1L, 0L)
    got.map(_.getAs[Long]("n_censored")).toSeq shouldBe Seq(0L, 0L, 2L)
    // S(1) = 3/4; S(2) = 3/4 * 2/3 = 1/2; S(3) unchanged (censor only)
    val s = got.map(_.getAs[Double]("survival")).toSeq
    s(0) shouldBe (((1073741824L * 3) / 4).toDouble / 1073741824.0)
    val s1 = (1073741824L * 3) / 4
    s(1) shouldBe (((s1 * 2) / 3).toDouble / 1073741824.0)
    s(2) shouldBe s(1) // censor-only step: factor exactly 1
  }

  test("kaplanMeier ignores purchases before the user's signup") {
    val events = Seq(
      (1L, ts(5), "signup"), (1L, ts(2), "purchase"),
      (1L, ts(8), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventOps.kaplanMeier(events, col("user_id"), col("ts"),
      col("event_type"), "signup", "purchase").collect()
    got.length shouldBe 1
    got.head.getAs[Int]("t_days") shouldBe 3 // day 5 -> day 8
    got.head.getAs[Long]("n_events") shouldBe 1L
  }

  // -------------------------------------------- Benford audit

  test("benfordAudit counts first digits of cents and emits 9 rows") {
    // cents: 123 (d=1), 2500 (d=2), 999 (d=9), 100 (d=1); zero and
    // negative amounts are excluded
    val df = Seq(1.23, 25.00, 9.99, 1.00, 0.0, -5.0).toDF("v")
    val got = Quality.benfordAudit(df, col("v"))
      .orderBy("digit").collect()
    got.length shouldBe 9
    got.map(_.getAs[Int]("digit")).toSeq shouldBe (1 to 9)
    val obs = got.map(_.getAs[Long]("observed")).toSeq
    obs shouldBe Seq(2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 1L)
    all(got.map(_.getAs[Long]("n_total"))) shouldBe 4L
    // chi2 replay in fixed digit order
    val p = Seq(0.3010299956639812, 0.17609125905568124,
      0.12493873660829992, 0.09691001300805642, 0.07918124604762482,
      0.06694678963061322, 0.05799194697768673, 0.05115252244738129,
      0.04575749056067514)
    val chi2 = (0 until 9).map { i =>
      val e = 4.0 * p(i)
      (obs(i).toDouble - e) * (obs(i).toDouble - e) / e
    }.reduceLeft(_ + _)
    all(got.map(_.getAs[Double]("chi2"))) shouldBe chi2
  }

  // -------------------------------------------- DiD

  test("didEstimator recovers a hand-built treatment effect") {
    // control: 10 pre / 11 post (delta +1); treated: 20 pre / 25 post
    // (delta +5) -> DiD = +4. Two rows per cell for a defined variance.
    val rows = Seq(
      (true, true, 24.0), (true, true, 26.0),
      (true, false, 19.0), (true, false, 21.0),
      (false, true, 10.0), (false, true, 12.0),
      (false, false, 9.0), (false, false, 11.0))
    val df = rows.toDF("tr", "po", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Quality.didEstimator(df, col("tr"), col("po"), col("v"))
      .collect()
    got.length shouldBe 1
    val r = got.head
    r.getAs[Long]("n_total") shouldBe 8L
    r.getAs[Double]("mean_t1") shouldBe 25.0
    r.getAs[Double]("mean_t0") shouldBe 20.0
    r.getAs[Double]("mean_c1") shouldBe 11.0
    r.getAs[Double]("mean_c0") shouldBe 10.0
    r.getAs[Double]("did") shouldBe 4.0
    // every cell has sample variance 2 -> SE = sqrt(4 * 2/2) = 2
    r.getAs[Double]("se_did") shouldBe 2.0
    r.getAs[Double]("t_stat") shouldBe 2.0
  }
}
