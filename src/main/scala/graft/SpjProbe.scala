package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: why does the q343 SPJ join plan exchanges under the
  * Verify session? Prints the executed plan and scan partitioning. */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val root = java.nio.file.Files.createTempDirectory("spj_probe").toString
    spark.conf.set("spark.sql.catalog.gspj",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.root", root)
    spark.sql("CREATE NAMESPACE gspj.ns")
    spark.sql("""CREATE TABLE gspj.ns.cust (ckey STRING, seg STRING)
      PARTITIONED BY (seg)""")
    spark.sql("""CREATE TABLE gspj.ns.quota (seg STRING, quota STRING)
      PARTITIONED BY (seg)""")
    Tables.customer(spark, d)
      .select(col("c_custkey").cast("string").as("ckey"),
        col("c_mktsegment").as("seg"))
      .writeTo("gspj.ns.cust").append()
    Tables.customer(spark, d).select(col("c_mktsegment").as("seg"))
      .distinct().withColumn("quota", length(col("seg")).cast("string"))
      .writeTo("gspj.ns.quota").append()
    Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .foreach(spark.conf.set(_, "-1"))
    println("bucketing=" + spark.conf.getOption(
      "spark.sql.sources.v2.bucketing.enabled"))
    val joined = spark.table("gspj.ns.cust")
      .join(spark.table("gspj.ns.quota"), Seq("seg"))
    println("=== EXECUTED PLAN ===")
    println(joined.queryExecution.executedPlan.toString.take(4000))
    println("exchanges=" + operators.Bucketing.shuffleExchangeCount(joined))
    spark.stop()
  }
}
