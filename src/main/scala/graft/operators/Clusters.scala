package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup cluster resolution: candidate PAIRS (from MinHash-LSH, SimHash
  * bands, or embedding buckets) are only half the dedup story — keeping one
  * document per duplicate GROUP needs the pairs resolved into connected
  * components.
  *
  * Semantics: `cluster_id` = the minimum vertex id reachable through the
  * pair graph (a unique, engine-independent fixpoint — the differential
  * oracle states it as a recursive transitive closure). Vertices absent
  * from any pair are their own singleton cluster.
  *
  * Algorithm: min-label propagation with pointer jumping — each round
  * every vertex adopts the smallest label among itself and its neighbors
  * (one edge join + min-aggregate), then follows its label's own label
  * (one label self-join: labels are vertex ids, so label(label) is defined
  * and monotonically smaller). Propagation alone needs O(component
  * diameter) rounds; the compression step makes label chains halve each
  * round, so convergence is O(log diameter) — the difference between ~15
  * and ~4 rounds on a corpus-wide boilerplate component, and per-round
  * job overhead is exactly what dominates iterative Spark loops. Labels
  * are snapshotted per round so lineage stays flat (`localCheckpoint` by
  * default, reliable `checkpoint` when a checkpointDir is given).
  * Convergence is
  * detected by counting changed labels on the already-materialized round
  * output (no extra join).
  *
  * At 100 TB the driver loop still holds: rounds are data-parallel jobs
  * (edge join ~O(E), compression ~O(V)); only the per-round changed-count
  * (one long) reaches the driver.
  */
object Clusters {

  /** Resolve undirected candidate pairs (aCol, bCol) over `vertices`
    * (idCol) into components. Emits (idCol, cluster_id).
    *
    * Durability: by default each round is `localCheckpoint`ed — cheap
    * (executor-local blocks, no replication) and right for bench scale,
    * but on a real cluster one lost executor aborts the whole iterative
    * job unrecoverably. Pass `checkpointDir` (HDFS/S3 path) to switch the
    * round snapshots to reliable `checkpoint()` storage: each round then
    * costs a distributed write, and a lost executor only recomputes from
    * the last durable round. */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20,
                          checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val spark = vertices.sparkSession
    val sc = spark.sparkContext
    // reliable-snapshot bookkeeping: durable rounds are parquet
    // round-trips into per-step subdirs — same durability as
    // df.checkpoint() (reliable storage, lineage truncated) WITHOUT
    // mutating the SparkContext-global checkpoint dir (concurrent
    // callers would otherwise write into each other's directories) and
    // with deletable per-step locations: Spark never deletes reliable
    // checkpoints on its own, so an iterative loop must prune its own
    // rounds or every daily run leaves maxIter corpus-sized snapshots.
    var step = 0
    // per-invocation unique run id: concurrent calls may share a root
    val runId = java.util.UUID.randomUUID().toString.take(8)
    var liveSnaps = List.empty[(DataFrame, String)] // snapshot -> its dir
    def rmDir(d: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
    }
    def snapshot(df: DataFrame): DataFrame = checkpointDir match {
      case Some(root) =>
        val d = s"$root/run_$runId/step_$step"
        step += 1
        df.write.mode("overwrite").parquet(d)
        val out = spark.read.parquet(d)
        liveSnaps ::= (out, d)
        out
      case None => df.localCheckpoint()
    }
    def prune(keep: DataFrame*): Unit = if (checkpointDir.isDefined) {
      val (kept, dead) = liveSnaps.partition { case (f, _) =>
        keep.exists(_ eq f) }
      dead.foreach { case (_, d) => rmDir(d) }
      liveSnaps = kept
    }
    val edges = snapshot(pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct())

    var lastSnap = snapshot(vertices.select(col(idCol).as("id"))
      .distinct().withColumn("label", col("id")))
    var labels = lastSnap
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // neighbor labels: for each dst, the labels of all its srcs
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nb_label"))
      val prop = snapshot(labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("nb_label"), col("label")))
            .as("label")))
      // pointer jumping: adopt label(label) — materialized above so the
      // self-join reads the checkpoint twice instead of recomputing the
      // edge join on both sides
      val lut = prop.select(col("id").as("__lid"), col("label").as("__ll"))
      val next = snapshot(prop
        .join(lut, col("label") === col("__lid"), "left")
        .select(col("id"), col("__old"),
          least(col("label"), coalesce(col("__ll"), col("label")))
            .as("label")))
      val changed = next.filter(col("label") =!= col("__old")).count()
      labels = next.select(col("id"), col("label"))
      // next is materialized: this round's prop snapshot and the
      // PREVIOUS round's labels snapshot are no longer read by anything
      lastSnap = next
      prune(edges, lastSnap)
      it += 1
      converged = changed == 0L
    }
    // the returned frame reads only the final snapshot — keep only it
    prune(lastSnap)
    // unconverged labels are silently WRONG (not the component minimum) —
    // downstream dedup would keep several "canonical" docs per group with
    // no signal. Fail loudly; convergence is already measured, so this
    // costs nothing.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds; " +
          "raise maxIter (rounds needed ~ log2 of the largest component's " +
          "diameter under pointer jumping)")
    labels.select(col("id").as(idCol), col("label").as("cluster_id"))
  }

  /** Cluster summary: size and canonical (minimum-id) representative per
    * cluster — the "keep one per duplicate group" decision table. */
  def clusterSummary(components: DataFrame, idCol: String): DataFrame =
    components.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        min(col(idCol)).as("canonical_id"))
}
