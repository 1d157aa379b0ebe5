package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: storage-partitioned-join wall time at volume — the same
  * co-partitioned pair joined with grouping ON (zero-exchange SPJ) vs
  * forced OFF (byte-range splits + both sides shuffled). Broadcast is
  * disabled both ways, so the delta is exactly the exchanges.
  *
  * Run with [values] below the core count for the honest null result
  * (grouping caps parallelism at one task per value and LOSES locally),
  * and at/above it for the production regime (values >= cores: the
  * saved exchanges are pure profit). At 100 TB a date/bucket-partitioned
  * table has hundreds-to-thousands of values, i.e. the second regime.
  *
  *   sbt "runMain graft.SpjScaleProbe [sfDir] [values]"
  */
object SpjScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/scale_probe/x100g"
    val nVals = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("spj_scale").toString
    spark.conf.set("spark.sql.catalog.gss",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.gss.root", root)
    spark.sql("CREATE NAMESPACE gss.ns")
    spark.sql("""CREATE TABLE gss.ns.li (okey STRING, qty STRING, pk STRING)
      PARTITIONED BY (pk)""")
    spark.sql("""CREATE TABLE gss.ns.ord (okey2 STRING, pk STRING)
      PARTITIONED BY (pk)""")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val pk = (col("l_orderkey") % nVals).cast("string")
    li.select(col("l_orderkey").cast("string").as("okey"),
        col("l_quantity").cast("string").as("qty"), pk.as("pk"))
      .writeTo("gss.ns.li").append()
    li.filter(col("l_linenumber") === 1)
      .select(col("l_orderkey").cast("string").as("okey2"), pk.as("pk"))
      .writeTo("gss.ns.ord").append()
    def joinCount(grouped: Boolean): (Double, Long) = {
      def side(t: String) =
        if (grouped) spark.table(t)
        else spark.read.format("graftcsv")
          .option("partitionCol", "pk")
          .option("groupByPartition", "false")
          .load(s"$root/ns/${t.split('.').last}")
      val a = side("gss.ns.li")
      val b = side("gss.ns.ord").withColumnRenamed("okey2", "okey_b")
      val j = a.join(b,
          a("pk") === b("pk") && col("okey") === col("okey_b"))
        .groupBy(a("pk")).agg(count(lit(1)).as("n"))
      val t0 = System.nanoTime()
      val row = j.agg(coalesce(sum(col("n")), lit(0L))).collect()(0)
      val n = row.getLong(0)
      require(n > 0L, s"probe join produced zero rows from $d — wrong " +
        "fixture? (needs lineitem with l_linenumber = 1 rows)")
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warmup then timed, each mode
    joinCount(grouped = true)
    val (tg, ng) = joinCount(grouped = true)
    joinCount(grouped = false)
    val (tu, nu) = joinCount(grouped = false)
    assert(ng == nu, s"mode changed the answer: $ng vs $nu")
    println(f"SPJ_SCALE rows=$ng grouped=$tg%.2f s ungrouped=$tu%.2f s " +
      f"speedup=${tu / tg}%.2fx")
    spark.stop()
  }
}
