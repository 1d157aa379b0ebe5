package graft.superstore

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Cleaning, Dedup}

/** Typed staging layer (SURVEY §2.2 P1-P3; SQLproject1.sql:136-196).
  *
  * Reference semantics, with one deliberate intent-fix: the reference's
  * `TRY_CONVERT(date, OrderDate, 120)` expects ISO dates but the data is
  * M/d/yyyy, so every date NULLs out and is merely *counted* by QA
  * (SURVEY §1.4). We parse the documented format. Everything else is a
  * faithful `NULLIF(LTRIM(RTRIM(...)),'')` + safe-cast translation.
  */
object Staging {

  private val D18_2 = DecimalType(18, 2)
  private val D9_4 = DecimalType(9, 4)

  /** raw (all-string) -> typed, trimmed, empty->NULL staging frame. */
  def typed(raw: DataFrame): DataFrame = {
    def s(name: String) = Cleaning.trimToNull(col(name))
    raw.select(
      s("OrderID").as("order_id"),
      Cleaning.tryToDate(s("OrderDate"), "M/d/yyyy").as("order_date"),
      Cleaning.tryToDate(s("ShipDate"), "M/d/yyyy").as("ship_date"),
      s("ShipMode").as("ship_mode"),
      s("CustomerID").as("customer_id"),
      s("CustomerName").as("customer_name"),
      s("Segment").as("segment"),
      s("Country").as("country"),
      s("City").as("city"),
      s("State").as("state"),
      Cleaning.stripSpacesToNull(col("PostalCode")).as("postal_code"),
      s("Region").as("region"),
      s("ProductID").as("product_id"),
      s("Category").as("category"),
      s("SubCategory").as("sub_category"),
      s("ProductName").as("product_name"),
      s("Sales").try_cast(D18_2).as("sales"),
      s("Quantity").try_cast(IntegerType).as("quantity"),
      s("Discount").try_cast(D9_4).as("discount"),
      s("Profit").try_cast(D18_2).as("profit"),
      col("ingested_at"),
      col("source_file"))
  }

  /** W1 dedup: keep the newest ingest per (order, product) order line
    * (SQLproject1.sql:198-211). */
  def deduped(stg: DataFrame): DataFrame =
    Dedup.keepFirst(stg, Seq("order_id", "product_id"),
      Seq(col("ingested_at").desc, col("source_file").desc,
        // tie-break to a total order: duplicate CSV lines are identical, so
        // any deterministic column ordering picks a stable survivor
        col("sales").desc, col("quantity").desc))

  /** P7: restore leading zeros on numeric postal codes (SQLproject1.sql:430-435). */
  def normalizePostal(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Cleaning.zeroPadNumeric(c, 5)
}
