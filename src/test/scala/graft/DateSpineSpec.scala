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
