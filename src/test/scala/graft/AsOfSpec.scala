package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // quotes: per-key price points over time
  private lazy val quotes = Seq(
    ("A", d("2024-01-01"), 1L, 100.0),
    ("A", d("2024-01-10"), 2L, 110.0),
    ("A", d("2024-01-10"), 3L, 115.0), // same-day duplicate: tiebreak -> id 3
    ("B", d("2024-01-05"), 4L, 50.0)
  ).toDF("k", "ts", "id", "price")

  // trades: lookups at points in time
  private lazy val trades = Seq(
    ("A", d("2023-12-31"), 10L), // before any quote
    ("A", d("2024-01-10"), 11L), // exactly on a quote day
    ("A", d("2024-02-01"), 12L),
    ("B", d("2024-01-05"), 13L)
  ).toDF("k", "ts", "trade_id")

  test("non-strict as-of picks the latest quote at or before each trade") {
    val out = AsOf.join(trades, quotes, Seq("k"),
        leftTs = col("ts"), rightTs = col("ts"), tiebreak = col("id"),
        payload = Seq("id", "price"), strict = false)
      .orderBy("trade_id")
      .select("trade_id", "asof_id").as[(Long, Option[Long])].collect().toSeq
    out shouldBe Seq(
      (10L, None),      // nothing before
      (11L, Some(3L)),  // same-day visible, tiebreak keeps id 3
      (12L, Some(3L)),
      (13L, Some(4L)))
  }

  test("strict as-of excludes same-instant right rows") {
    val out = AsOf.join(trades, quotes, Seq("k"),
        leftTs = col("ts"), rightTs = col("ts"), tiebreak = col("id"),
        payload = Seq("id", "price"), strict = true)
      .orderBy("trade_id")
      .select("trade_id", "asof_id").as[(Long, Option[Long])].collect().toSeq
    out shouldBe Seq(
      (10L, None),
      (11L, Some(1L)), // same-day quotes invisible -> falls back to Jan 1
      (12L, Some(3L)),
      (13L, None))     // only quote is same-instant
  }

  test("NULL timestamps: left rows kept with NULL payload, right rows ignored") {
    val trades2 = trades.unionByName(
      Seq(("A", null.asInstanceOf[Date], 99L)).toDF("k", "ts", "trade_id"))
    val quotes2 = quotes.unionByName(
      Seq(("A", null.asInstanceOf[Date], 100L, 999.0)).toDF("k", "ts", "id", "price"))
    val out = AsOf.join(trades2, quotes2, Seq("k"),
        col("ts"), col("ts"), col("id"), Seq("id", "price"), strict = false)
      .select("trade_id", "asof_id").as[(Long, Option[Long])]
      .collect().toMap
    out(99L) shouldBe None        // null-ts left row preserved, no match
    out(10L) shouldBe None        // null-ts RIGHT row must not leak in
    out(11L) shouldBe Some(3L)
  }

  test("payload columns arrive together from the same matched row") {
    val out = AsOf.join(trades, quotes, Seq("k"),
        col("ts"), col("ts"), col("id"), Seq("id", "price"), strict = false)
      .filter($"trade_id" === 11L)
      .select("asof_id", "asof_price").as[(Long, Double)].head()
    out shouldBe ((3L, 115.0))
  }
}
