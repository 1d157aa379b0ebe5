package graft

/** Dev probe: metadata-only aggregate vs full-scan aggregate on a large
  * partitioned graftcsv table — the isolated measurement behind the
  * "COUNT(*) on a 100-TB directory becomes a sidecar read" claim (q350's
  * bench number is dominated by the one-off seed write; this times JUST
  * the aggregate, both ways, on a table that already exists). Run:
  * `sbt "runMain graft.MetaAggProbe [sfDir]"` — writes orders once into
  * a temp partitioned catalog table, then times the two plans fresh per
  * run (never re-collecting one Dataset: AQE stage reuse would fake it). */
object MetaAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("meta_probe").toString
    spark.conf.set("spark.sql.catalog.graft_mp",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mp.root", root)
    spark.sql("CREATE NAMESPACE graft_mp.ns")
    spark.sql("""CREATE TABLE graft_mp.ns.ord (okey STRING, prio STRING)
      PARTITIONED BY (prio)""")
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("string").as("okey"),
        col("o_orderpriority").as("prio"))
      .writeTo("graft_mp.ns.ord").append()
    val rows = spark.table("graft_mp.ns.ord").count()
    println(s"rows = $rows, dir = $root/ns/ord")
    def time(label: String, metadata: Boolean): Unit = {
      def agg = spark.read.format("graftcsv")
        .option("partitionCol", "prio")
        .option("metadataAgg", metadata.toString)
        .load(s"$root/ns/ord")
        .agg(count(lit(1)).as("n"), count(col("okey")).as("nk"),
          min(col("okey")).as("lo"), max(col("okey")).as("hi"))
      val check = agg
      val marker = check.queryExecution.executedPlan.toString
        .contains("MetadataOnlyAggregate: true")
      require(marker == metadata, s"plan mode mismatch for $label")
      check.collect() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        agg.collect() // fresh Dataset per run
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: best ${runs.min}%.3f s  " +
        f"(runs ${runs.map(r => f"$r%.3f").mkString(", ")})")
    }
    time("scan    ", metadata = false)
    time("metadata", metadata = true)
    spark.stop()
  }
}
