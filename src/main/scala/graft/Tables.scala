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
  /** The one session conf this corpus requires: events.parquet stores `ts`
    * as TIMESTAMP(NANOS), which Spark 4 only reads (as a raw long) under
    * this legacy flag. It must be set at session build (Verify/Bench/test
    * builders all do) — a loader mutating session state would be
    * action-at-a-distance for every other read on the session. */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.parquet's TIMESTAMP(NANOS) `ts` surfaces as a raw nanos long
    * (see [[NanosConf]]); convert to micros (truncating, the same thing
    * DuckDB's TIMESTAMP does) so downstream code sees a normal
    * TimestampType column. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption(NanosConf).contains("true"),
      s"reading events.parquet requires $NanosConf=true, set at session " +
        "build (it gates how the TIMESTAMP(NANOS) column is surfaced)")
    // Writer-robust: the driver's testdata stores TIMESTAMP(NANOS)
    // (surfaced as a raw long under NanosConf), but files rewritten by
    // other engines (probe fixtures, downstream tools) carry plain
    // TIMESTAMP micros. Dispatch on the surfaced type.
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: ns epochs (~1.7e18) exceed double precision,
        // so `ts / 1000` (double div) would round some values by ±1 µs
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive timestamps reinterpret in the session zone — UTC by this
        // repo's session discipline, so the instant is unchanged
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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
