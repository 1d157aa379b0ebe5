package graft

/** Dev probe: row vs columnar graftcsv scan throughput on a replicated
  * wide file (all 21 Superstore columns aggregated). Run:
  * `sbt "runMain graft.ColumnarProbe [replicas]"`. */
object ColumnarProbe {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(40)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val src = "/root/reference/Project1/superstore.csv"
    val dir = java.nio.file.Files.createTempDirectory("col_bench").toString
    val one = spark.read.format("graftcsv").load(src)
    Seq.fill(replicas)(one).reduce(_ unionAll _)
      .repartition(8)
      .write.format("graftcsv").mode("append").save(dir)
    def scan(columnar: Boolean) = spark.read.format("graftcsv")
      .option("columnar", columnar.toString).load(dir)
    def time(label: String, columnar: Boolean): Double = {
      val df = scan(columnar).agg(
        count(lit(1)), max(col("ProductName")), min(col("CustomerName")),
        max(col("Sales")), min(col("Profit")), max(col("City")))
      // aggregate would push down; force the full-scan shape instead
      val wide = scan(columnar).groupBy(col("Region"))
        .agg(count(lit(1)).as("n"), max(col("ProductName")).as("p"),
          min(col("CustomerName")).as("c"), max(col("City")).as("ci"),
          max(col("State")).as("st"), max(col("PostalCode")).as("z"))
      wide.collect() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        wide.collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"$label: best $best%.3f s  (runs ${runs.map(r => f"$r%.3f").mkString(", ")})")
      best
    }
    val rows = spark.read.format("graftcsv").load(dir).count()
    println(s"rows = $rows")
    val r = time("row     ", columnar = false)
    val c = time("columnar", columnar = true)
    println(f"speedup: ${r / c}%.2fx")
    spark.stop()
  }
}
