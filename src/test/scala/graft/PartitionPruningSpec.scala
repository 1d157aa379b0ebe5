package graft

import org.apache.spark.sql.functions._

/** Partitioned layout + pruning: the fact-table pattern SURVEY §4 maps the
  * reference's covering date index onto (partition by time, prune at scan). */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/orders.parquet").exists()

  test("year-partitioned fact: a year filter prunes partitions at the scan") {
    assume(available)
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, sf)
      .withColumn("o_year", year($"o_orderdate"))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)

    val years = new java.io.File(dir).list().count(_.startsWith("o_year="))
    years should be > 1

    val filtered = spark.read.parquet(dir).filter($"o_year" === 1995)
    val scan = filtered.queryExecution.executedPlan.toString
    // the filter must surface as a PartitionFilters entry, not a data filter
    scan should include regex "PartitionFilters: \\[.*o_year.*\\]"
    // and the scan must touch only the one matching partition directory
    val files = filtered.select(input_file_name()).distinct()
      .as[String].collect()
    all(files) should include("o_year=1995")

    // correctness: pruned read equals a full-scan filter
    val full = spark.read.parquet(dir).collect().count(_.getAs[Int]("o_year") == 1995)
    filtered.count() shouldBe full
  }

  test("partitioned write round-trips the partition column value") {
    assume(available)
    val dir = java.nio.file.Files.createTempDirectory("graft_part2").toString
    val src = Tables.orders(spark, sf)
      .withColumn("o_year", year($"o_orderdate"))
    src.write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    back.count() shouldBe src.count()
    back.groupBy("o_year").count().orderBy("o_year").collect().toSeq shouldBe
      src.groupBy("o_year").count().orderBy("o_year").collect().toSeq
  }
}
