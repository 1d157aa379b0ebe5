package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-13 wave: the DSv2 FunctionCatalog tier inside the oracle gate —
  * [[graft.sources.GraftFunctions]] loaded through the catalog plugin and
  * called from pure SQL, hash-matched against DuckDB replays of each
  * function's documented cross-engine contract.
  */
object R13Queries {

  /** One catalog name for the function-library queries; the library is
    * root-independent, but initialize() requires a root. */
  private def ensureFnCatalog(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.graft_fns").isDefined) {
      s.conf.set("spark.sql.catalog.graft_fns",
        classOf[graft.sources.QuirkCsvCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_fns.root",
        java.nio.file.Files.createTempDirectory("graft_fns_cat").toString)
    }

  /** Catalog-function token accounting: per-source document/token totals
    * where the tokenizer is `graft_fns.lib.token_count` — a V2
    * FunctionCatalog scalar whose magic method plans as a codegen'd
    * Invoke (QuirkCsvFunctionCatalogSpec pins the plan shape). The
    * oracle replays the same `\s+`-split convention every other token
    * oracle in this suite uses. */
  private val q337 = QueryDef(
    "q337_catalog_fn_tokens",
    (s, d) => {
      ensureFnCatalog(s)
      Tables.documents(s, d).createOrReplaceTempView("q337_docs")
      s.sql("""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(graft_fns.lib.token_count(text)) AS BIGINT)
                 AS total_tokens,
               CAST(MAX(graft_fns.lib.token_count(text)) AS INT)
                 AS max_tokens
        FROM q337_docs GROUP BY source""")
    },
    Some(s"""
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(${ExtQueries.oToks("text")})) AS BIGINT)
               AS total_tokens,
             CAST(MAX(len(${ExtQueries.oToks("text")})) AS INT)
               AS max_tokens
      FROM documents GROUP BY source"""))

  /** Catalog-AGGREGATE-function table fingerprint: per-source content
    * checksum via `graft_fns.lib.xor_checksum` (a V2 AggregateFunction —
    * distributed partial states XOR-merged across partitions). XOR of
    * 60-bit md5 slices is partition-order independent by construction,
    * which is exactly what makes the DuckDB replay (`bit_xor` over the
    * same slice) hash-match: this is the cheap cross-engine integrity
    * check a 100-TB ingest runs after every load. */
  private val q338 = QueryDef(
    "q338_catalog_fn_checksum",
    (s, d) => {
      ensureFnCatalog(s)
      Tables.documents(s, d).createOrReplaceTempView("q338_docs")
      s.sql("""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               graft_fns.lib.xor_checksum(text) AS content_checksum
        FROM q338_docs GROUP BY source""")
    },
    Some("""
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             COALESCE(bit_xor(CAST('0x' || substr(md5(text), 1, 15)
               AS BIGINT)), 0) AS content_checksum
      FROM documents GROUP BY source"""))

  /** Catalog-function exact vector scoring: int8-quantized squared norms
    * where the dot product is `graft_fns.lib.int_dot` (magic-method
    * ArrayData access). Quantization is the engine's q74 convention
    * (floor, truncation-universal); integer dots are exact, so the
    * oracle's list_transform replay hash-matches bit for bit. */
  private val q339 = QueryDef(
    "q339_catalog_fn_intdot",
    (s, d) => {
      ensureFnCatalog(s)
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          graft.operators.Similarity.quantizeInt8(col("embedding"))
            .as("q8"))
        .filter(col("q8").isNotNull)
        .createOrReplaceTempView("q339_q8")
      s.sql("""
        SELECT vec_id, graft_fns.lib.int_dot(q8, q8) AS norm_sq
        FROM q339_q8""")
    },
    Some("""
      WITH base AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) AS mx
             FROM embeddings),
      qt AS (SELECT vec_id,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS q8
             FROM base WHERE mx > 0)
      SELECT vec_id,
             CAST(list_sum(list_transform(q8, x -> x * x)) AS BIGINT)
               AS norm_sq
      FROM qt"""))

  /** Append-only schema evolution inside the oracle gate: a catalog
    * table loaded in two generations with an `ALTER TABLE ADD COLUMN`
    * between them — pre-ALTER files are NEVER rewritten (the 100-TB
    * contract), their rows surface NULL for the appended column, and
    * the post-ALTER generation populates it. The oracle replays the
    * two generations as a UNION with a literal NULL. */
  private val q340 = QueryDef(
    "q340_catalog_schema_evolution",
    (s, d) => {
      ensureFnCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_fns.q340")
      s.sql("DROP TABLE IF EXISTS graft_fns.q340.dim")
      s.sql("CREATE TABLE graft_fns.q340.dim (nation STRING, regionkey STRING)")
      Tables.nation(s, d).createOrReplaceTempView("q340_nation")
      s.sql("""INSERT INTO graft_fns.q340.dim
        SELECT n_name, CAST(n_regionkey AS STRING) FROM q340_nation
        WHERE n_nationkey < 13""")
      s.sql("ALTER TABLE graft_fns.q340.dim ADD COLUMN tier STRING")
      s.sql("""INSERT INTO graft_fns.q340.dim
        SELECT n_name, CAST(n_regionkey AS STRING),
               CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END
        FROM q340_nation WHERE n_nationkey >= 13""")
      s.table("graft_fns.q340.dim").localCheckpoint()
    },
    Some("""
      SELECT n_name AS nation, CAST(n_regionkey AS VARCHAR) AS regionkey,
             CAST(NULL AS VARCHAR) AS tier
      FROM nation WHERE n_nationkey < 13
      UNION ALL
      SELECT n_name, CAST(n_regionkey AS VARCHAR),
             CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END
      FROM nation WHERE n_nationkey >= 13"""))

  /** Semantic decontamination: corpus docs whose EMBEDDING sits within
    * 0.4 cosine of an eval-set item — leakage the n-gram path (q69)
    * cannot see. Eval side = vec_id < 50 (broadcast, the production
    * shape: benchmarks are small); corpus = the rest, scanned once.
    * The oracle replays the exact left-fold cosine (q37 convention). */
  private val q341 = QueryDef(
    "q341_semantic_decontaminate",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.semanticDecontaminate(
        emb.filter(col("vec_id") >= 50), "vec_id", "embedding",
        emb.filter(col("vec_id") < 50), "vec_id", "embedding",
        threshold = 0.4)
    },
    Some(s"""
      WITH c AS (SELECT vec_id AS corpus_id, embedding AS ce
                 FROM embeddings WHERE vec_id >= 50),
      e AS (SELECT vec_id AS eval_id, embedding AS ee
            FROM embeddings WHERE vec_id < 50),
      sc AS (SELECT corpus_id, eval_id,
               ${ExtQueries.oCos("ce", "ee")} AS cosine
             FROM c CROSS JOIN e),
      hits AS (SELECT corpus_id, eval_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY corpus_id
                 ORDER BY cosine DESC, eval_id) AS rk
             FROM sc WHERE cosine >= 0.4)
      SELECT corpus_id, eval_id, cosine FROM hits WHERE rk = 1"""))

  /** Identity-partitioned catalog table inside the oracle gate: orders
    * loaded into a priority-partitioned graft_cat table (routed write,
    * hive-style value subdirs), read back through a partition filter —
    * the plan is REQUIRED to have planned only the matching value
    * directories (directory-level partition pruning), and the result
    * hash-matches DuckDB's replay over the parquet base. */
  private val q342 = QueryDef(
    "q342_partitioned_table",
    (s, d) => {
      ensureFnCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_fns.q342")
      s.sql("DROP TABLE IF EXISTS graft_fns.q342.ord")
      s.sql("""CREATE TABLE graft_fns.q342.ord
        (okey STRING, prio STRING, status STRING)
        PARTITIONED BY (prio)""")
      Tables.orders(s, d)
        .select(col("o_orderkey").cast("string").as("okey"),
          col("o_orderpriority").as("prio"),
          col("o_orderstatus").as("status"))
        .writeTo("graft_fns.q342.ord").append()
      val filtered = s.table("graft_fns.q342.ord")
        .filter(col("prio").isin("1-URGENT", "2-HIGH"))
      // exactly the two value directories planned — partition pruning
      // is load-bearing here, not best-effort
      require(filtered.rdd.getNumPartitions == 2,
        s"partition pruning must plan exactly the 2 matching value " +
          s"dirs, planned ${filtered.rdd.getNumPartitions}")
      filtered.groupBy(col("prio"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("okey")).as("min_okey"), max(col("okey")).as("max_okey"))
    },
    Some("""
      SELECT o_orderpriority AS prio,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             MIN(CAST(o_orderkey AS VARCHAR)) AS min_okey,
             MAX(CAST(o_orderkey AS VARCHAR)) AS max_okey
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1"""))

  /** Storage-partitioned JOIN inside the oracle gate: customer and
    * orders both partitioned on the customer's market segment, joined
    * on it — with v2 bucketing on and broadcast disabled the join is
    * REQUIRED to plan zero shuffle exchanges beneath it (the
    * KeyGroupedPartitioning splits line up by value); layout must never
    * change results, so the oracle replays the same join over parquet. */
  private val q343 = QueryDef(
    "q343_spj_join",
    (s, d) => {
      ensureFnCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_fns.q343")
      s.sql("DROP TABLE IF EXISTS graft_fns.q343.cust")
      s.sql("DROP TABLE IF EXISTS graft_fns.q343.seg_quota")
      s.sql("""CREATE TABLE graft_fns.q343.cust
        (ckey STRING, seg STRING) PARTITIONED BY (seg)""")
      s.sql("""CREATE TABLE graft_fns.q343.seg_quota
        (seg STRING, quota STRING) PARTITIONED BY (seg)""")
      Tables.customer(s, d)
        .select(col("c_custkey").cast("string").as("ckey"),
          col("c_mktsegment").as("seg"))
        .writeTo("graft_fns.q343.cust").append()
      Tables.customer(s, d).select(col("c_mktsegment").as("seg")).distinct()
        .withColumn("quota", length(col("seg")).cast("string"))
        .writeTo("graft_fns.q343.seg_quota").append()
      val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      // restore PRIOR values, not defaults: conf.unset would reset a
      // session-configured threshold and silently change the join
      // plans of every query after this one in the same run
      val prior = confs.map(k => k -> s.conf.getOption(k))
      confs.foreach(s.conf.set(_, "-1"))
      try {
        val joined = s.table("graft_fns.q343.cust")
          .join(s.table("graft_fns.q343.seg_quota"), Seq("seg"))
          .groupBy(col("seg"), col("quota"))
          .agg(count(lit(1)).as("n_cust"), min(col("ckey")).as("min_ckey"))
        val exchanges = operators.Bucketing.shuffleExchangeCount(
          s.table("graft_fns.q343.cust")
            .join(s.table("graft_fns.q343.seg_quota"), Seq("seg")))
        require(exchanges == 0,
          s"storage-partitioned join must plan zero shuffle exchanges, " +
            s"saw $exchanges")
        joined.localCheckpoint()
      } finally prior.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },
    Some("""
      WITH q AS (SELECT DISTINCT c_mktsegment AS seg,
                   CAST(len(c_mktsegment) AS VARCHAR) AS quota
                 FROM customer)
      SELECT c.c_mktsegment AS seg, q.quota,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             MIN(CAST(c.c_custkey AS VARCHAR)) AS min_ckey
      FROM customer c JOIN q ON c.c_mktsegment = q.seg
      GROUP BY 1, 2"""))

  /** Partition-level retention inside the oracle gate: the append-only
    * raw layer's deletion unit is the partition directory —
    * `ALTER TABLE … DROP PARTITION` removes one priority class without
    * any row-level rewrite (SupportsPartitionManagement), and the
    * remaining table hash-matches the oracle's anti-filter over the
    * parquet base. */
  private val q344 = QueryDef(
    "q344_partition_retention",
    (s, d) => {
      ensureFnCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_fns.q344")
      s.sql("DROP TABLE IF EXISTS graft_fns.q344.ord")
      s.sql("""CREATE TABLE graft_fns.q344.ord
        (okey STRING, prio STRING) PARTITIONED BY (prio)""")
      Tables.orders(s, d)
        .select(col("o_orderkey").cast("string").as("okey"),
          col("o_orderpriority").as("prio"))
        .writeTo("graft_fns.q344.ord").append()
      s.sql("""ALTER TABLE graft_fns.q344.ord
        DROP PARTITION (prio = '3-MEDIUM')""")
      s.table("graft_fns.q344.ord")
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n_orders"), max(col("okey")).as("max_okey"))
    },
    Some("""
      SELECT o_orderpriority AS prio,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             MAX(CAST(o_orderkey AS VARCHAR)) AS max_okey
      FROM orders WHERE o_orderpriority <> '3-MEDIUM' GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q337, q338, q339, q340, q341, q342, q343, q344)
}
