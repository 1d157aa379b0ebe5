package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: connectedComponents round-count/wall-time on a DEEP graph.
  *
  * sf0.1's dedup graphs are shallow (banded candidates cluster into
  * near-cliques), so pointer-jumping depth never dominates there. This
  * probe builds the adversarial shape — one long chain of N vertices,
  * diameter N — and times the iterative loop (small-graph fast path
  * disabled). Rounds needed ~ log(reach) of the chain length; wall time
  * here is ~proportional to round count, which is what the double
  * pointer jump halves.
  *
  *   sbt "runMain graft.DeepGraphProbe [chainLen]"
  */
object DeepGraphProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 300000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val verts = spark.range(n).select(col("id"))
    val chain = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    // warmup: JIT + codegen on a tiny instance
    operators.Clusters.connectedComponents(
      verts.limit(100), "id", chain.limit(99), "a", "b",
      maxIter = 40, smallGraphMaxEdges = 0).count()
    val t0 = System.nanoTime()
    val out = operators.Clusters.connectedComponents(
      verts, "id", chain, "a", "b",
      maxIter = 40, smallGraphMaxEdges = 0)
    val distinctLabels = out.select(countDistinct(col("cluster_id"))).as[Long].head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"DEEPGRAPH chain=$n labels=$distinctLabels wall=$secs%.2f s")
    assert(distinctLabels == 1L, s"chain must resolve to one component, got $distinctLabels")
    spark.stop()
  }
}
