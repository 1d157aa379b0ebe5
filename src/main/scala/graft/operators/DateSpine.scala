package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar date-dimension spine (SURVEY §2.8 X1).
  *
  * The reference builds one row per calendar day between data-driven bounds
  * with a recursive CTE (`SQLproject1.sql:262-284`, MAXRECURSION 0). In
  * Spark the idiomatic equivalent is `sequence(lo, hi, interval 1 day)` +
  * `explode` — no recursion, no driver-side loop: the bounds come from a
  * 1-row aggregate that stays distributed via a cross join (broadcast of a
  * single row), so the same plan works whether the fact table is 10k rows
  * or 100 TB.
  */
object DateSpine {

  /** One row per day from `min(loCol)` to `max(hiCol)` over `bounds`,
    * with the reference's derived calendar attributes.
    *
    * NULL-bounds fallback (SQLproject1.sql:262-263 `ISNULL(MIN(OrderDate),
    * '2010-01-01')` / `ISNULL(MAX(ShipDate),'2025-12-31')`): when every
    * date fails to parse (or `bounds` is empty), the spine still covers the
    * fallback range instead of exploding `sequence(null, null)` into an
    * empty dim that NULLs every date key downstream.
    *
    * Inverted bounds (possible when only ONE side falls back — e.g. order
    * dates all unparseable but ship dates ending before 2010) yield an
    * EMPTY spine rather than a runtime error: the reference's `WHILE @d <=
    * @end` loop body simply never runs in that case, and `sequence(lo, hi)`
    * with lo > hi would throw instead of matching it. */
  def fromBounds(bounds: DataFrame, loCol: Column, hiCol: Column,
                 loFallback: String = "2010-01-01",
                 hiFallback: String = "2025-12-31"): DataFrame = {
    val b = bounds.agg(
      coalesce(min(loCol), to_date(lit(loFallback))).as("lo"),
      coalesce(max(hiCol), to_date(lit(hiFallback))).as("hi"))
    val days = b.select(explode(
      when(col("lo") <= col("hi"),
        sequence(col("lo"), col("hi"), expr("interval 1 day")))
        .otherwise(array().cast("array<date>"))).as("date"))
    withCalendarAttrs(days, col("date"))
  }

  /** The reference's dim.Date attribute set (SQLproject1.sql:272-283). */
  def withCalendarAttrs(days: DataFrame, d: Column): DataFrame =
    days.select(
      date_format(d, "yyyyMMdd").cast("int").as("date_key"),
      d.as("date"),
      year(d).as("year"),
      quarter(d).as("quarter"),
      month(d).as("month"),
      dayofmonth(d).as("day"),
      weekofyear(d).as("week_of_year"),
      date_format(d, "MMMM").as("month_name"),
      concat(lit("Q"), quarter(d)).as("quarter_name"),
      date_format(d, "EEEE").isin("Saturday", "Sunday").as("is_weekend"))
}
