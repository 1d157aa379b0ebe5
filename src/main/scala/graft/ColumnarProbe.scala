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
      // the consumption must NOT be reader-pushable (plain min/max/count
      // and grouped aggregates push into the reader and bypass the
      // row-vs-columnar handoff entirely): length()+sum over every
      // column forces the scan to hand all rows/batches to Spark, which
      // is exactly the boundary the columnar path accelerates
      val cols = scan(columnar).columns
      // build a FRESH Dataset per run: a re-collected Dataset re-uses
      // its materialized AQE shuffle stages, so repeat timings would
      // measure only the final 1-row stage, not the scan
      def wide = scan(columnar)
        .select(cols.map(c => length(coalesce(col(c), lit(""))))
          .reduce(_ + _).as("w"))
        .agg(sum(col("w")).as("total"))
      wide.collect() // warm (JIT + page cache)
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
