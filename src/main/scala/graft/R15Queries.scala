package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-15 wave: the persisted-index SERVING path and deeper catalog
  * tiers. Each query REQUIREs its scale-defining invariant in-line (plan
  * markers, byte-identity, set equality with the in-memory twin) so the
  * oracle hash-match certifies the semantics AND the require certifies
  * the mechanism. */
object R15Queries {

  private def ensureCatalog(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.graft_r15").isDefined) {
      s.conf.set("spark.sql.catalog.graft_r15",
        classOf[graft.sources.QuirkCsvCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_r15.root",
        java.nio.file.Files.createTempDirectory("graft_r15_cat").toString)
    }

  /** ANN top-k served FROM the persisted IVF index
    * ([[graft.operators.IvfIndex.topK]]): the index is built on the base
    * corpus and extended with an incremental batch (so serving must read
    * BOTH assignment partitions), then queries are answered off the
    * catalog tables — probe the persisted centroids, take candidates
    * from the maintained assignment (the corpus is never re-assigned),
    * join only the candidates' embeddings back. The REQUIRE pins
    * index-served == in-memory [[graft.operators.Similarity.ivfTopK]]
    * over the same corpus and centroids (both directions of exceptAll);
    * the oracle recomputes the whole IVF search from the rows. */
  private val q351 = QueryDef(
    "q351_ivf_index_serve",
    (s, d) => {
      ensureCatalog(s)
      val e = Tables.embeddings(s, d)
      val isNew = (col("vec_id") % 10) >= 8
      graft.operators.IvfIndex.build(s, "graft_r15", "q351", "ann",
        e.filter(!isNew), "vec_id", "embedding", 8)
      graft.operators.IvfIndex.assignBatch(s, "graft_r15", "q351", "ann",
        e.filter(isNew), "vec_id", "embedding", "b1")
      val served = graft.operators.IvfIndex.topK(s, "graft_r15", "q351",
        "ann", e, "vec_id", "embedding", col("vec_id") < 10,
        k = 3, nprobe = 2).localCheckpoint()
      // the twin feeds STRING ids so its rank tie-breaks use the same
      // (string) order as the index's persisted keys — on fixtures with
      // duplicated embeddings (the 100x probe) exact cosine ties are
      // everywhere and a long-vs-string n_id order would diverge
      val es = e.select(col("vec_id").cast("string").as("vec_id"),
        col("embedding"))
      // twin checkpointed: BOTH exceptAll directions consume it — without
      // the snapshot the in-memory search recomputes once per direction
      val inMem = graft.operators.Similarity.ivfTopK(
          es, "vec_id", "embedding", col("vec_id").cast("long") < 10,
          graft.operators.IvfIndex.centroids(s, "graft_r15", "q351", "ann"),
          k = 3, nprobe = 2)
        .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
        .localCheckpoint()
      require(served.exceptAll(inMem).isEmpty &&
        inMem.exceptAll(served).isEmpty,
        "index-served top-k must equal the in-memory ivfTopK over the " +
          "same corpus and centroids")
      served
    },
    Some(s"""
      WITH cent AS MATERIALIZED (SELECT CAST(vec_id AS VARCHAR) AS centroid_id,
                           embedding AS cemb
            FROM embeddings WHERE vec_id % 10 < 8
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      asg AS MATERIALIZED (SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ${ExtQueries.oCos("e.embedding", "c.cemb")} DESC,
                  c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
      q AS (SELECT CAST(vec_id AS VARCHAR) AS q_id, embedding AS qemb
            FROM embeddings WHERE vec_id < 10),
      qc AS MATERIALIZED (SELECT q_id, qemb, centroid_id FROM (
             SELECT q.q_id, q.qemb, c.centroid_id,
                    ROW_NUMBER() OVER (PARTITION BY q.q_id
                      ORDER BY ${ExtQueries.oCos("q.qemb", "c.cemb")} DESC,
                               c.centroid_id) AS rn
             FROM q CROSS JOIN cent c) WHERE rn <= 2),
      cand AS (SELECT qc.q_id, qc.qemb,
                      CAST(e.vec_id AS VARCHAR) AS n_id,
                      e.embedding AS nemb
               FROM qc
               JOIN asg a ON a.centroid_id = qc.centroid_id
               JOIN embeddings e ON e.vec_id = a.vec_id
               WHERE qc.q_id <> CAST(e.vec_id AS VARCHAR)),
      sc AS MATERIALIZED (SELECT q_id, n_id,
                    ${ExtQueries.oCos("qemb", "nemb")} AS cosine FROM cand),
      rk AS (SELECT q_id, n_id, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine DESC, n_id) AS INT) AS rank FROM sc)
      SELECT q_id, n_id, cosine, rank FROM rk WHERE rank <= 3"""))

  /** Schema-evolution tier 2 through the oracle gate: RENAME and DROP
    * COLUMN are journal-only ops with FROZEN positions — the query
    * builds three file generations (pre-rename, post-rename,
    * post-drop+add), REQUIREs the first generation's data files stay
    * byte-identical across both ALTERs, and emits the mixed-generation
    * read under the final logical schema. The oracle replays the same
    * evolution relationally (rename = aliasing, drop = projection, the
    * re-added generation NULL for earlier rows). */
  private val q352 = QueryDef(
    "q352_schema_evolution2",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r15.q352")
      s.sql("DROP TABLE IF EXISTS graft_r15.q352.t")
      s.sql("""CREATE TABLE graft_r15.q352.t
        (okey STRING, status STRING, prio STRING)""")
      val src = Tables.orders(s, d).select(
        col("o_orderkey").cast("string").as("okey"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("prio"))
      src.filter(col("o_orderkey") % 3 === 0)
        .writeTo("graft_r15.q352.t").append()
      val root = s.conf.get("spark.sql.catalog.graft_r15.root")
      def snapshot(): Set[(String, Long, Long)] =
        new java.io.File(s"$root/q352/t").listFiles()
          .filter(f => f.isFile && !f.getName.startsWith(".") &&
            !f.getName.startsWith("_") &&
            !f.getName.startsWith("part-seed-"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      val gen1 = snapshot()
      s.sql("ALTER TABLE graft_r15.q352.t RENAME COLUMN prio TO priority")
      require(snapshot() == gen1,
        "RENAME COLUMN must be metadata-only: data files changed")
      src.filter(col("o_orderkey") % 3 === 1)
        .withColumnRenamed("prio", "priority")
        .writeTo("graft_r15.q352.t").append()
      val gen12 = snapshot()
      s.sql("ALTER TABLE graft_r15.q352.t DROP COLUMN status")
      s.sql("ALTER TABLE graft_r15.q352.t ADD COLUMN loadgen STRING")
      require(snapshot() == gen12,
        "DROP/ADD COLUMN must be metadata-only: data files changed")
      src.filter(col("o_orderkey") % 3 === 2)
        .select(col("okey"), col("prio").as("priority"),
          lit("g3").as("loadgen"))
        .writeTo("graft_r15.q352.t").append()
      s.table("graft_r15.q352.t")
        .select(col("okey"), col("priority"), col("loadgen"))
        .localCheckpoint()
    },
    Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS okey,
             o_orderpriority AS priority,
             CASE WHEN o_orderkey % 3 = 2 THEN 'g3' END AS loadgen
      FROM orders"""))

  /** Pruning-aware planner statistics made LOAD-BEARING: the graftcsv
    * scan's `estimateStatistics` reports post-pruning bytes, so a
    * partition-filtered side of a join falls under the broadcast
    * threshold and plans a BroadcastHashJoin, while the UNFILTERED twin
    * of the same join — same tables, same threshold — stays a
    * SortMergeJoin. Both plans are REQUIREd (AQE disabled around the
    * plan build so the static decision is attributable to the reported
    * stats alone; threshold computed from the actual directory sizes:
    * one-partition bytes < t < whole-table bytes). The oracle replays
    * the filtered self-join. */
  private val q353 = QueryDef(
    "q353_pruned_stats_broadcast",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r15.q353")
      s.sql("DROP TABLE IF EXISTS graft_r15.q353.t")
      s.sql("""CREATE TABLE graft_r15.q353.t (okey STRING, prio STRING)
        PARTITIONED BY (prio)""")
      Tables.orders(s, d)
        .select(col("o_orderkey").cast("string").as("okey"),
          col("o_orderpriority").as("prio"))
        .writeTo("graft_r15.q353.t").append()
      val root = s.conf.get("spark.sql.catalog.graft_r15.root")
      val dirs = new java.io.File(s"$root/q353/t").listFiles()
        .filter(_.isDirectory)
      def dataBytes(dir: java.io.File): Long = dir.listFiles()
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_")).map(_.length()).sum
      val oneDir = dataBytes(dirs.find(_.getName == "prio=1-URGENT").get)
      val total = dirs.map(dataBytes).sum
      val threshold = (oneDir + total) / 2
      require(oneDir < threshold && threshold < total,
        s"fixture sizes degenerate: oneDir=$oneDir total=$total")
      def joined(filtered: Boolean) = {
        val probe = s.table("graft_r15.q353.t")
          .select(col("okey"), col("prio").as("probe_prio"))
        val dim0 = s.table("graft_r15.q353.t")
        val dim = (if (filtered) dim0.filter(col("prio") === "1-URGENT")
          else dim0).select(col("okey"), col("prio").as("dim_prio"))
        probe.join(dim, Seq("okey"))
      }
      // pin the STATIC planner decision to the reported stats: AQE and
      // prior threshold saved and restored (conf.unset would restore the
      // DEFAULT, not the session's value)
      val priorT = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      val priorA = s.conf.getOption("spark.sql.adaptive.enabled")
      val result = try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold",
          threshold.toString)
        s.conf.set("spark.sql.adaptive.enabled", "false")
        val pruned = joined(filtered = true)
        val prunedPlan = pruned.queryExecution.executedPlan.toString
        require(prunedPlan.contains("BroadcastHashJoin"),
          "the partition-pruned side must broadcast — its reported " +
            s"post-pruning size ($oneDir B) is under the $threshold B " +
            s"threshold:\n$prunedPlan")
        val twinPlan = joined(filtered = false)
          .queryExecution.executedPlan.toString
        require(twinPlan.contains("SortMergeJoin") &&
          !twinPlan.contains("BroadcastHashJoin"),
          "the UNFILTERED twin must shuffle — whole-table stats " +
            s"($total B) exceed the $threshold B threshold:\n$twinPlan")
        pruned.localCheckpoint()
      } finally {
        priorT match {
          case Some(v) =>
            s.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
          case None => s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
        priorA match {
          case Some(v) => s.conf.set("spark.sql.adaptive.enabled", v)
          case None => s.conf.unset("spark.sql.adaptive.enabled")
        }
      }
      result
    },
    Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS okey,
             o_orderpriority AS probe_prio,
             o_orderpriority AS dim_prio
      FROM orders WHERE o_orderpriority = '1-URGENT'"""))

  /** Catalog-native CLUSTERED layout (TBLPROPERTIES('clusterBy'='okey')):
    * two identical partitioned tables accumulate the same 3 interleaved
    * epochs; compacting each value dir folds the clustered table
    * range-partitioned on the cluster key (auto-detected from its
    * `_graft_cluster` marker) and the natural table hash-folded. The
    * point probe then REQUIREs the q349 shape through the catalog: the
    * clustered dir plans exactly ONE split while the natural dir — same
    * data, same file count — must read every overlapping file. */
  private val q354 = QueryDef(
    "q354_clustered_catalog_layout",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r15.q354")
      val src = Tables.orders(s, d).select(
        lpad(col("o_orderkey").cast("string"), 8, "0").as("okey"),
        col("o_orderpriority").as("prio"),
        (col("o_orderkey") % 3).as("third"))
      val root = s.conf.get("spark.sql.catalog.graft_r15.root")
      FixtureOnce("q354", d) {
        s.sql("DROP TABLE IF EXISTS graft_r15.q354.nat")
        s.sql("DROP TABLE IF EXISTS graft_r15.q354.clu")
        s.sql("""CREATE TABLE graft_r15.q354.nat (okey STRING, prio STRING)
          PARTITIONED BY (prio)""")
        s.sql("""CREATE TABLE graft_r15.q354.clu (okey STRING, prio STRING)
          PARTITIONED BY (prio) TBLPROPERTIES ('clusterBy'='okey')""")
        (0 to 2).foreach { m =>
          val epoch = src.filter(col("third") === m).drop("third")
          epoch.writeTo("graft_r15.q354.nat").append()
          epoch.writeTo("graft_r15.q354.clu").append()
        }
        Seq("nat", "clu").foreach { t =>
          val vds = new java.io.File(s"$root/q354/$t").listFiles()
            .filter(d => d.isDirectory && !d.getName.startsWith("_"))
            .map(_.toString).sorted.toSeq
          // sortBy=None auto-detects the table root's cluster marker:
          // clu folds range-partitioned, nat folds hash-partitioned;
          // value dirs fold CONCURRENTLY (bounded driver pool)
          graft.sources.QuirkCsvMaintenance.compactValueDirs(s, vds,
            numFiles = 3, sortBy = None)
        }
      }
      // probe the MEDIAN key: a min/max probe is prunable even under a
      // hash layout (it falls outside the other files' ranges); only the
      // range-clustered fold can isolate a mid-range key to one file
      val vals = src.filter(col("prio") === "1-URGENT").select(col("okey"))
      val half = (vals.count() / 2).toInt + 1
      val probe = vals.orderBy(col("okey")).limit(half)
        .agg(max(col("okey"))).collect()(0).getString(0)
      def splits(t: String) = {
        val hit = s.read.format("graftcsv")
          .option("partitionCol", "prio")
          .option("groupByPartition", "false")
          .load(s"$root/q354/$t")
          .filter(col("prio") === "1-URGENT" && col("okey") === probe)
        (hit, hit.rdd.getNumPartitions)
      }
      val (natHit, natSplits) = splits("nat")
      val (cluHit, cluSplits) = splits("clu")
      require(natSplits == 3,
        s"natural layout: 3 hash-folded overlapping files must all be " +
          s"read, planned $natSplits")
      require(cluSplits == 1,
        s"clustered layout must prune the probe to the ONE file whose " +
          s"range covers $probe — planned $cluSplits of 3")
      require(cluHit.collect().toSeq == natHit.collect().toSeq,
        "clustered and natural layouts must return identical rows")
      cluHit.localCheckpoint()
    },
    Some("""
      WITH src AS (SELECT lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS okey,
                          o_orderpriority AS prio FROM orders),
      u AS (SELECT okey FROM src WHERE prio = '1-URGENT'),
      ranked AS (SELECT okey, ROW_NUMBER() OVER (ORDER BY okey) AS rn
                 FROM u)
      SELECT okey, '1-URGENT' AS prio FROM ranked
      WHERE rn = (SELECT CAST(FLOOR(COUNT(*) / 2) AS BIGINT) + 1 FROM u)"""))

  val all: Seq[QueryDef] = Seq(q351, q352, q353, q354)
}
