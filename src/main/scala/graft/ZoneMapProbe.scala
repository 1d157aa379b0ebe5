package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the graftcsv zone-map file skipping at data volume
  * (not part of the driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.ZoneMapProbe <lineitemParquet> <scratchDir>" }}}
  *
  * Writes the parquet's rows through the graftcsv sink clustered by
  * l_returnflag (one append per flag → single-flag files + the committed
  * zone-map sidecar), then times `rf = 'R'` count() with pruning on vs
  * off. The expected shape: pruned reads 1/3 of the files AND skips the
  * parse entirely for the other 2/3 — the sidecar turns an equality
  * filter into a file-level planner decision, exactly what min/max
  * skipping does for footer-bearing formats. */
object ZoneMapProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0)
      else "/tmp/scale_probe/x100g/lineitem.parquet"
    val dir = if (args.length > 1) args(1) else "/tmp/zm_scale"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(src)
      .select(col("l_orderkey").cast("string").as("ok"),
        col("l_partkey").cast("string").as("pk"),
        col("l_quantity").cast("string").as("qty"),
        col("l_returnflag").as("rf"))
    if (!new java.io.File(dir, "_graft_zonemap.tsv").exists()) {
      val t0 = System.nanoTime
      Seq("A", "N", "R").foreach { f =>
        li.filter(col("rf") === f).repartition(8)
          .write.format("graftcsv").mode("append").save(dir)
      }
      println(f"write+sidecar: ${(System.nanoTime - t0) / 1e9}%.1f s")
    } else println(s"reusing $dir")
    def bench(label: String, opts: Map[String, String]): Unit = {
      val r = opts.foldLeft(spark.read.format("graftcsv"))((a, kv) =>
        a.option(kv._1, kv._2)).load(dir).filter(col("rf") === "R")
      println(s"$label: ${r.rdd.getNumPartitions} input partitions")
      (1 to 2).foreach { i =>
        val t = System.nanoTime
        val n = r.count()
        println(f"$label run$i: ${(System.nanoTime - t) / 1e9}%.2f s " +
          s"(rows=$n)")
      }
    }
    bench("pruned", Map.empty)
    bench("unpruned", Map("zoneMapPruning" -> "false"))
    spark.stop()
  }
}
