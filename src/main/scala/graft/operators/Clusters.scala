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
  * Algorithm: min-label propagation — each round every vertex adopts the
  * smallest label among itself and its neighbors, converging in
  * O(component diameter) rounds. Near-dup components are overwhelmingly
  * tiny (pairs/triples), so 3-5 rounds close almost any corpus; `maxIter`
  * bounds the pathological chain. Each round is one shuffle (join on the
  * symmetrized edge list + min-aggregate); labels are `localCheckpoint`ed
  * per round so lineage stays flat across iterations — the standard Spark
  * posture for iterative algorithms. Convergence is detected by counting
  * changed labels (an aggregate on data already clustered this round).
  *
  * At 100 TB the driver loop still holds: rounds are data-parallel jobs;
  * only the per-round changed-count (one long) reaches the driver.
  */
object Clusters {

  /** Resolve undirected candidate pairs (aCol, bCol) over `vertices`
    * (idCol) into components. Emits (idCol, cluster_id). */
  def connectedComponents(vertices: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val edges = pairs
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = vertices.select(col(idCol).as("id"))
      .distinct().withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // neighbor labels: for each dst, the labels of all its srcs
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nb_label"))
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nb_label"), col("label")))
            .as("label"))
        .localCheckpoint()
      val changed = next.as("n")
        .join(labels.as("p"), col("n.id") === col("p.id"))
        .filter(col("n.label") =!= col("p.label"))
        .count()
      labels = next
      converged = changed == 0L
      it += 1
    }
    labels.select(col("id").as(idCol), col("label").as("cluster_id"))
  }

  /** Cluster summary: size and canonical (minimum-id) representative per
    * cluster — the "keep one per duplicate group" decision table. */
  def clusterSummary(components: DataFrame, idCol: String): DataFrame =
    components.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        min(col(idCol)).as("canonical_id"))
}
