package graft

import org.apache.spark.sql.functions._

/** graft.expressions.QuantizedDot: bit-equality with the HOF folds it
  * replaced, in both (long·double → double) and (long·long → long)
  * modes. */
class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.register(spark)

  private val fixture = Seq(
    (Seq(1L, -3L, 127L, 0L), Seq(0.5, 1.25, -2.0, 9.0)),
    (Seq(-128L, 64L), Seq(1e-3, 1e3)),
    (Seq.empty[Long], Seq.empty[Double]),
    (Seq(7L), Seq(0.1, 0.2, 0.3)) // longer right: common-prefix contract
  ).toDF("q8", "cen")

  test("centroid mode is bit-identical to the aggregate(zip_with) fold") {
    val rows = fixture
      .withColumn("native", call_function("q8_dot", $"q8", $"cen"))
      .withColumn("hof", expr("""
        aggregate(
          zip_with(
            slice(q8, 1, least(size(q8), size(cen))),
            slice(cen, 1, least(size(q8), size(cen))),
            (x, y) -> cast(x AS double) * y),
          cast(0.0 AS double), (acc, v) -> acc + v)"""))
      .select($"native", $"hof").as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"$n != $h") }
  }

  test("integer mode: exact long sum, matches the HOF integer fold") {
    val df = Seq(
      (Seq(127L, -128L, 3L), Seq(127L, -128L, 3L)),
      (Seq(1000000L, 1000000L), Seq(1000000L, 1000000L))
    ).toDF("a", "b")
    val rows = df
      .withColumn("native", call_function("q8_dot", $"a", $"b"))
      .withColumn("hof", aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0L), (acc, v) => acc + v))
      .select($"native", $"hof").as[(Long, Long)].collect()
    rows.foreach { case (n, h) => n shouldBe h }
    // 2 * 10^12: would overflow an int accumulator
    rows(1)._1 shouldBe 2000000000000L
  }

  test("a NULL ELEMENT poisons the dot to NULL (HOF parity), both modes") {
    val centroid = Seq((Seq(Some(1L), None), Seq(2.0, 5.0)))
      .toDF("a", "b")
      .select(call_function("q8_dot", $"a", $"b"))
      .as[Option[Double]].collect().head
    centroid shouldBe None
    val integer = Seq((Seq(Some(1L), None), Seq(Some(2L), Some(5L))))
      .toDF("a", "b")
      .select(call_function("q8_dot", $"a", $"b"))
      .as[Option[Long]].collect().head
    integer shouldBe None
  }

  test("null propagation: NULL array on either side yields NULL") {
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Double]]),
      (None: Option[Seq[Long]], Some(Seq(1.0))))
      .toDF("a", "b")
    df.select(call_function("q8_dot", $"a", $"b"))
      .as[Option[Double]].collect().toList shouldBe List(None, None)
  }

  test("sql registration resolves q8_dot") {
    fixture.createOrReplaceTempView("qd_fixture")
    spark.sql("SELECT q8_dot(q8, cen) FROM qd_fixture").count() shouldBe 4L
  }
}
