package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does localCheckpoint preserve hash partitioning, so a
  * subsequent equi-join on the partitioning key skips the Exchange on
  * that side? Prints the physical plan of checkpointed ⋈ fresh.
  *
  * RESULT (Spark 4.1, kept as the documented negative): NO — the
  * checkpoint surfaces as `Scan ExistingRDD` with unknown output
  * partitioning and the join re-Exchanges both sides. Iterative loops
  * that snapshot each round (Clusters.connectedComponents) therefore
  * cannot amortize the edge-table shuffle across rounds at the
  * DataFrame tier; the effective lever is reducing ROUND COUNT
  * (double pointer jumping), not partitioning reuse.
  */
object PartitionPreserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = spark.range(100000)
      .select(col("id").as("src"), (col("id") * 2).as("dst"))
      .repartition(col("src"))
      .localCheckpoint(true)
    val small = spark.range(1000).select(col("id").as("src"), lit(1).as("label"))
    val j = big.join(small, "src")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    println("=== PLAN START ===")
    println(plan)
    println("=== exchanges total: " + "Exchange".r.findAllIn(plan).size)
    spark.stop()
  }
}
