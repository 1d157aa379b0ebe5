package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.NearDup

/** Round-12 registry: the hot-band cap's audit surface — what the cap
  * discards is a first-class, oracle-gated number, not a log line you
  * have to trust (the scrubPii per-rule-counts discipline applied to the
  * LSH tier's scale guard). */
object R19Queries {

  private def ensureCatalog(s: org.apache.spark.sql.SparkSession): Unit = {
    if (s.conf.getOption("spark.sql.catalog.graft_r19.root").isEmpty) {
      s.conf.set("spark.sql.catalog.graft_r19",
        classOf[graft.sources.QuirkCsvCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_r19.root",
        java.nio.file.Files.createTempDirectory("graft_r19").toString)
    }
  }

  /** The q376/q377 fixture: documents plus a REPLICA CLIQUE — the 5
    * lowest-id docs each re-appear 10 more times under fresh string ids.
    * Identical texts band identically, so each replicated doc's 4 band
    * buckets hold ≥ 11 postings and saturate a cap of 8 — the exact
    * degenerate-bucket shape the cap exists for (boilerplate crawl
    * pages / un-deduped replicas). */
  private def replicatedCorpus(s: org.apache.spark.sql.SparkSession,
                               d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id").cast("string").as("doc_id"),
      col("text"))
    val reps = docs.filter(col("doc_id") < 5)
      .crossJoin(s.range(1, 11).select(col("id").as("k")))
      .select(concat(col("doc_id").cast("string"), lit("_r"),
        col("k").cast("string")).as("doc_id"), col("text"))
    base.unionByName(reps)
  }

  private val AuditCap = 8L

  private def oReplicatedBands: String = {
    val nh = 12; val bs = 3
    val sigCols = (0 until nh).map(i =>
      s"list_aggregate(list_transform(sh, x -> md5('$i|' || x)), " +
        s"'min') AS sig_$i")
      .mkString(",\n             ")
    val bandSelects = (0 until nh / bs).map { b =>
      val sigs = (0 until bs).map(k => s"sig_${b * bs + k}")
        .mkString(", ")
      s"SELECT doc_id, $b AS band_id, md5(concat_ws(',', $sigs)) AS " +
        s"band_key FROM sigs"
    }.mkString("\n        UNION ALL ")
    s"""corpus AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
        UNION ALL
        SELECT CAST(doc_id AS VARCHAR) || '_r' || CAST(k AS VARCHAR),
               text
        FROM documents, range(1, 11) r(k) WHERE doc_id < 5),
      t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w FROM corpus),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)})
                 AS sh
             FROM t WHERE len(w) >= 3),
      sigs AS MATERIALIZED (SELECT doc_id,
             $sigCols
      FROM ws),
      bands AS MATERIALIZED (
        $bandSelects)"""
  }

  /** The hot-band cap's audit: how many band buckets a cap of
    * [[AuditCap]] discards over the replica-clique corpus, and the
    * posting mass inside them — `NearDup.hotBandAudit` gated against a
    * full DuckDB banding replay. A nonzero row is the signal an operator
    * reads as "exact-dedup these upstream or raise the cap". */
  private val q376 = QueryDef(
    "q376_hotband_audit",
    (s, d) => NearDup.hotBandAudit(
      NearDup.bandKeys(replicatedCorpus(s, d), "doc_id", "text",
        shingleN = 3, numHashes = 12, bandSize = 3),
      AuditCap),
    Some(s"""
      WITH $oReplicatedBands,
      sat AS (SELECT band_id, band_key, count(*) AS n
              FROM bands GROUP BY 1, 2 HAVING count(*) > $AuditCap)
      SELECT CAST($AuditCap AS BIGINT) AS max_bucket,
             CAST(count(*) AS BIGINT) AS n_buckets_dropped,
             CAST(COALESCE(SUM(n), 0) AS BIGINT) AS postings_dropped
      FROM sat"""))

  /** The persisted index's saturation audit under its PINNED cap: build
    * with an explicit small cap over the replica-clique corpus, REQUIRE
    * the serve equals the capped in-memory twin (saturated buckets pair
    * nothing), then emit `NearDupIndex.saturationAudit` — the number an
    * operator polls (and the serves WARN-log) to SEE what the cap is
    * costing on the live index. */
  private val q377 = QueryDef(
    "q377_neardup_saturation_serve",
    (s, d) => {
      ensureCatalog(s)
      val corpus = replicatedCorpus(s, d)
      FixtureOnce("q377", d) {
        graft.operators.NearDupIndex.build(s, "graft_r19", "q377", "nd",
          corpus, "doc_id", "text", shingleN = 3, numHashes = 12,
          bandSize = 3, maxBucket = AuditCap)
      }
      val served = graft.operators.NearDupIndex.allCandidatePairs(
        s, "graft_r19", "q377", "nd").localCheckpoint()
      // twin checkpointed: BOTH exceptAll directions consume it — without
      // the snapshot the full banding recomputes once per direction
      val twin = NearDup.minHashLshCandidates(corpus, "doc_id", "text",
          shingleN = 3, numHashes = 12, bandSize = 3, maxBucket = AuditCap)
        .localCheckpoint()
      require(served.exceptAll(twin).isEmpty &&
        twin.exceptAll(served).isEmpty,
        "index serve under the pinned cap must equal the capped " +
          "in-memory LSH twin")
      graft.operators.NearDupIndex.saturationAudit(
        s, "graft_r19", "q377", "nd")
    },
    Some(s"""
      WITH $oReplicatedBands,
      sat AS (SELECT band_id, band_key, count(*) AS n
              FROM bands GROUP BY 1, 2 HAVING count(*) > $AuditCap)
      SELECT CAST($AuditCap AS BIGINT) AS max_bucket,
             CAST(count(*) AS BIGINT) AS n_buckets_dropped,
             CAST(COALESCE(SUM(n), 0) AS BIGINT) AS postings_dropped
      FROM sat"""))

  /** Multi-column identity partitioning end to end under the oracle
    * gate: a two-level `(b, c)` graftcsv table takes a routed insert, a
    * PARTIAL-SPEC metadata DELETE on the SECOND level (every level-1
    * dir's matching leaf drops without reading a row), serves a
    * two-level-pruned aggregate, and the fn REQUIREs the equality probe
    * on both levels planned exactly one value group. The oracle replays
    * the whole mutation+aggregate chain relationally. */
  private val q378 = QueryDef(
    "q378_multilevel_partitioning",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r19.q378")
      s.sql("DROP TABLE IF EXISTS graft_r19.q378.t")
      s.sql("""CREATE TABLE graft_r19.q378.t (k STRING, b STRING,
        c STRING) PARTITIONED BY (b, c)""")
      Tables.orders(s, d).select(
          col("o_orderkey").cast("string").as("k"),
          col("o_orderstatus").cast("string").as("b"),
          substring(col("o_orderpriority"), 1, 1).as("c"))
        .writeTo("graft_r19.q378.t").append()
      // partial-spec retention: one statement drops c='1' under EVERY b
      s.sql("DELETE FROM graft_r19.q378.t WHERE c = '1'")
      // both-level equality probe prunes to exactly one leaf value group
      val probe = s.table("graft_r19.q378.t")
        .filter(col("b") === "F" && col("c") === "3")
      require(probe.rdd.getNumPartitions == 1,
        s"two-level pruning must plan ONE value group, got " +
          s"${probe.rdd.getNumPartitions}")
      s.table("graft_r19.q378.t")
        .groupBy(col("b"), col("c"))
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("key_sum"))
    },
    Some("""
      SELECT CAST(o_orderstatus AS VARCHAR) AS b,
             substr(CAST(o_orderpriority AS VARCHAR), 1, 1) AS c,
             count(*) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM orders
      WHERE substr(CAST(o_orderpriority AS VARCHAR), 1, 1) <> '1'
      GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q376, q377, q378)
}
