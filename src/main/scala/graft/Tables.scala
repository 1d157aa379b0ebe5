package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. Schemas are fixed by
  * the driver (FIXTURES.md §3); we read them as-is and let Catalyst push
  * projections/filters into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark only reads
    * as a raw long under the legacy conf. Convert to micros (truncating, the
    * same thing DuckDB's TIMESTAMP does) so downstream code sees a normal
    * TimestampType column.
    *
    * Known side effect: the legacy conf stays set on the session, so other
    * TIMESTAMP(NANOS) parquet reads (none exist in this corpus) would also
    * surface raw longs. There is no per-read option for this flag. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer division: ns epochs (~1.7e18) exceed double precision, so
    // `ts / 1000` (double div) would round some values by ±1 microsecond
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB oracle's view of the data. Goes through the typed loaders so
    * `events` gets its nanos→micros ts conversion, not the raw long. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
      "embeddings" -> embeddings)
    names.foreach(n => loaders(n)(spark, sfDir).createOrReplaceTempView(n))
  }
}
