package graft

import org.apache.spark.sql.functions._

import graft.operators.DateSpine

class DateSpineSpec extends SparkSpec {
  import spark.implicits._

  test("fromBounds: one row per day inclusive of both bounds") {
    val df = Seq("2016-02-26", "2016-03-02").toDF("d")
      .select(to_date($"d").as("d"))
    val spine = DateSpine.fromBounds(df, col("d"), col("d"))
    spine.count() shouldBe 6 // leap-year Feb 29 included
    col1(spine.select(date_format($"date", "yyyy-MM-dd"))) should contain("2016-02-29")
  }

  test("fromBounds: NULL bounds fall back to the reference's default range") {
    // all dates failed to parse (SQLproject1.sql:262-263 ISNULL fallback)
    val df = Seq(1, 2, 3).toDF("x").select(lit(null).cast("date").as("d"))
    val spine = DateSpine.fromBounds(df, col("d"), col("d"))
    spine.count() shouldBe 5844 // 2010-01-01 .. 2025-12-31 inclusive
    val bounds = spine.agg(min($"date").cast("string"), max($"date").cast("string"))
      .as[(String, String)].head()
    bounds shouldBe (("2010-01-01", "2025-12-31"))
    // an EMPTY bounds frame behaves the same (min/max over zero rows)
    DateSpine.fromBounds(df.filter(lit(false)), col("d"), col("d"))
      .count() shouldBe 5844
  }

  test("fromBounds: inverted bounds (one-sided fallback) -> empty spine, " +
    "not a runtime error (reference WHILE loop body never runs)") {
    // order dates all unparseable -> lo falls back to 2010-01-01, but ship
    // dates END before 2010: sequence(lo, hi) would throw on lo > hi
    val df = Seq("1998-05-01").toDF("s")
      .select(lit(null).cast("date").as("lo"), to_date($"s").as("hi"))
    DateSpine.fromBounds(df, col("lo"), col("hi")).count() shouldBe 0
  }

  test("calendar attributes: date_key, names, weekend flag") {
    val df = Seq("2024-06-01").toDF("d").select(to_date($"d").as("d"))
    val row = DateSpine.fromBounds(df, col("d"), col("d")).collect().head
    row.getAs[Int]("date_key") shouldBe 20240601
    row.getAs[Int]("year") shouldBe 2024
    row.getAs[Int]("quarter") shouldBe 2
    row.getAs[String]("month_name") shouldBe "June"
    row.getAs[String]("quarter_name") shouldBe "Q2"
    row.getAs[Boolean]("is_weekend") shouldBe true // Saturday
  }
}
