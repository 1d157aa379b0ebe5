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
      val inMem = graft.operators.Similarity.ivfTopK(
          e, "vec_id", "embedding", col("vec_id") < 10,
          graft.operators.IvfIndex.centroids(s, "graft_r15", "q351", "ann"),
          k = 3, nprobe = 2)
        .select(col("q_id").cast("string"), col("n_id").cast("string"),
          col("cosine"), col("rank"))
      require(served.exceptAll(inMem).isEmpty &&
        inMem.exceptAll(served).isEmpty,
        "index-served top-k must equal the in-memory ivfTopK over the " +
          "same corpus and centroids")
      served
    },
    Some(s"""
      WITH cent AS (SELECT CAST(vec_id AS VARCHAR) AS centroid_id,
                           embedding AS cemb
            FROM embeddings WHERE vec_id % 10 < 8
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      asg AS (SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ${ExtQueries.oCos("e.embedding", "c.cemb")} DESC,
                  c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
      q AS (SELECT CAST(vec_id AS VARCHAR) AS q_id, embedding AS qemb
            FROM embeddings WHERE vec_id < 10),
      qc AS (SELECT q_id, qemb, centroid_id FROM (
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
      sc AS (SELECT q_id, n_id,
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

  val all: Seq[QueryDef] = Seq(q351, q352)
}
