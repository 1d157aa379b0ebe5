package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-12 wave: the reference's literal RANK top-N shape on the custom
  * operator, and SQL-surface row-level operations on the DSv2 tier.
  */
object R12Queries {

  /** W4's ACTUAL window (`SQLproject1.sql:689-699` uses RANK with ties
    * kept, not row_number) through [[graft.plans.WindowTopKRewrite]] in
    * rank mode: the ties-kept bounded-heap operator replaces
    * `Exchange → Sort → Window → Filter`. Unlike the row_number form
    * (q323), the retained SET here is fully deterministic without any
    * tiebreaker — `RANK() <= k` keeps exactly the rows ≤ the k-th
    * smallest order value — so the oracle needs no total order and hash
    * parity proves the tie semantics themselves. The plan is `require`d
    * to contain the ties-kept operator on every Verify/Bench run. */
  private val q334 = QueryDef(
    "q334_rank_topk_ties",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.operators.TopK.ensureRegistered(s)
      // save/restore, not unset: unset restores the DEFAULT, silently
      // turning the rewrite off for a session that had it enabled
      val prior = s.conf.getOption(graft.plans.WindowTopKRewrite.RewriteConf)
      s.conf.set(graft.plans.WindowTopKRewrite.RewriteConf, "true")
      try {
        val df = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rk", rank().over(
            Window.partitionBy("source").orderBy(col("n_chars"))))
          .filter(col("rk") <= 3).drop("rk")
        val plan = df.queryExecution.executedPlan.toString
        require(plan.contains("GroupedTopKFinalWithTies"),
          "rank window shape must plan to the ties-kept heap operator, " +
            s"got:\n$plan")
        df.localCheckpoint() // materialize while the rewrite conf is on
      } finally prior match {
        case Some(v) => s.conf.set(graft.plans.WindowTopKRewrite.RewriteConf, v)
        case None => s.conf.unset(graft.plans.WindowTopKRewrite.RewriteConf)
      }
    },
    Some("""
      WITH ranked AS (
        SELECT source, doc_id, n_chars,
               rank() OVER (PARTITION BY source
                 ORDER BY n_chars) AS rk
        FROM documents)
      SELECT source, doc_id, n_chars FROM ranked WHERE rk <= 3"""))

  /** One shared catalog root for the row-level-operation queries: Spark
    * caches catalog instances per session, so re-pointing the same
    * catalog name at a new root mid-session would silently keep the old
    * one — one root + one namespace per query instead. */
  private lazy val rloRoot =
    java.nio.file.Files.createTempDirectory("graft_rlo_queries").toString

  private def ensureRloCatalog(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.graft_rlo").isDefined) {
      s.conf.set("spark.sql.catalog.graft_rlo",
        classOf[graft.sources.QuirkCsvCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_rlo.root", rloRoot)
    }

  /** The reference's insert-or-update MERGE (`SQLproject1.sql:390-416`)
    * as a LITERAL SQL statement against a graftcsv catalog table —
    * SupportsRowLevelOperations (group-based copy-on-write) end to end
    * inside the oracle gate. Seed = nations 0-14 with their true region;
    * source = all nations with every even key's region drifted; MERGE
    * updates drifted matches and inserts the unseen keys. The oracle
    * states the same final relation with join/anti-join SQL (layout and
    * statement form must never change results). */
  private val q335 = QueryDef(
    "q335_sql_merge_upsert",
    (s, d) => {
      ensureRloCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_rlo.q335")
      s.sql("DROP TABLE IF EXISTS graft_rlo.q335.dim")
      s.sql("CREATE TABLE graft_rlo.q335.dim (nation STRING, region STRING)")
      val base = Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
      base.filter(col("n_nationkey") < 15)
        .select(col("n_name").as("nation"), col("r_name").as("region"))
        .createOrReplaceTempView("q335_seed")
      base.select(col("n_name").as("nation"),
          when(col("n_nationkey") % 2 === 0, lit("SHIFTED"))
            .otherwise(col("r_name")).as("region"))
        .createOrReplaceTempView("q335_src")
      s.sql("INSERT INTO graft_rlo.q335.dim SELECT * FROM q335_seed")
      s.sql("""MERGE INTO graft_rlo.q335.dim t USING q335_src s
        ON t.nation = s.nation
        WHEN MATCHED AND t.region <> s.region THEN UPDATE SET region = s.region
        WHEN NOT MATCHED THEN INSERT *""")
      s.table("graft_rlo.q335.dim").localCheckpoint()
    },
    Some("""
      WITH base AS (
        SELECT n_nationkey, n_name AS nation, r_name AS region
        FROM nation JOIN region ON n_regionkey = r_regionkey),
      seed AS (SELECT nation, region FROM base WHERE n_nationkey < 15),
      src AS (SELECT nation,
                     CASE WHEN n_nationkey % 2 = 0 THEN 'SHIFTED'
                          ELSE region END AS region
              FROM base),
      matched AS (SELECT s.nation, s.region
                  FROM seed t JOIN src s ON t.nation = s.nation),
      inserted AS (SELECT s.nation, s.region FROM src s
                   WHERE NOT EXISTS (
                     SELECT 1 FROM seed t WHERE t.nation = s.nation))
      SELECT nation, region FROM matched
      UNION ALL SELECT nation, region FROM inserted"""))

  /** J8 as SQL: the reference's two-statement SCD2 maintenance
    * (`SQLproject1.sql:485-513` — MERGE closes the changed current
    * versions, a follow-up INSERT opens the new ones) run literally
    * against a graftcsv catalog table. The oracle is q25's oracle
    * almost verbatim — the same SQL that hash-matches `Scd2.merge` — so
    * parity here proves SQL-MERGE maintenance == the DataFrame SCD2
    * operator. */
  private val q336 = QueryDef(
    "q336_sql_merge_scd2",
    (s, d) => {
      ensureRloCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_rlo.q336")
      s.sql("DROP TABLE IF EXISTS graft_rlo.q336.dim")
      s.sql("""CREATE TABLE graft_rlo.q336.dim (
        custkey STRING, name STRING, segment STRING, acctbal STRING,
        hash_diff STRING, effective_from STRING, effective_to STRING,
        is_current STRING)""")
      Tables.customer(s, d).createOrReplaceTempView("q336_customer")
      // all-string snapshots with the SQL-computed hash-diff (same
      // upper/concat_ws convention Scd2 and the q25 oracle share)
      s.sql("""SELECT CAST(c_custkey AS STRING) AS custkey,
                      c_name AS name, c_mktsegment AS segment,
                      CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING) AS acctbal
               FROM q336_customer WHERE c_custkey % 7 <> 0""")
        .createOrReplaceTempView("q336_snap1")
      s.sql("""SELECT CAST(c_custkey AS STRING) AS custkey,
                      c_name AS name,
                      CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                           ELSE c_mktsegment END AS segment,
                      CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING) AS acctbal
               FROM q336_customer""")
        .createOrReplaceTempView("q336_snap2")
      def hashed(v: String): String =
        s"""SELECT *, sha2(concat_ws('|', upper(coalesce(name,'')),
           upper(coalesce(segment,'')), upper(coalesce(acctbal,''))), 256)
           AS hash_diff FROM $v"""
      s.sql(hashed("q336_snap1")).createOrReplaceTempView("q336_h1")
      s.sql(hashed("q336_snap2")).createOrReplaceTempView("q336_h2")
      s.sql("""INSERT INTO graft_rlo.q336.dim
        SELECT custkey, name, segment, acctbal, hash_diff,
               '1900-01-01', '9999-12-31', 'true' FROM q336_h1""")
      // statement 1: close the changed current versions
      s.sql("""MERGE INTO graft_rlo.q336.dim t USING q336_h2 s
        ON t.custkey = s.custkey AND t.is_current = 'true'
        WHEN MATCHED AND t.hash_diff <> s.hash_diff THEN
          UPDATE SET effective_to = '2024-06-01', is_current = 'false'""")
      // statement 2: open new versions (changed keys) + brand-new keys.
      // localCheckpoint severs lineage: the INSERT's source must not
      // re-scan the table it appends to (read-then-write hazard)
      s.table("graft_rlo.q336.dim").localCheckpoint()
        .createOrReplaceTempView("q336_after_close")
      s.sql("""INSERT INTO graft_rlo.q336.dim
        SELECT s.custkey, s.name, s.segment, s.acctbal, s.hash_diff,
               CASE WHEN seen.custkey IS NULL THEN '1900-01-01'
                    ELSE '2024-06-01' END,
               '9999-12-31', 'true'
        FROM q336_h2 s
        LEFT JOIN (SELECT DISTINCT custkey FROM q336_after_close
                   WHERE is_current = 'true') cur
          ON s.custkey = cur.custkey
        LEFT JOIN (SELECT DISTINCT custkey FROM q336_after_close) seen
          ON s.custkey = seen.custkey
        WHERE cur.custkey IS NULL""")
      s.table("graft_rlo.q336.dim")
        .select(col("custkey").cast("long").as("custkey"), col("name"),
          col("segment"), col("acctbal").cast("double").as("acctbal"),
          col("hash_diff"), col("effective_from"), col("effective_to"),
          col("is_current").cast("boolean").as("is_current"))
        .localCheckpoint()
    },
    Some("""
      WITH snap1 AS (
        SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment,
               CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        FROM customer WHERE c_custkey % 7 <> 0),
      snap2 AS (
        SELECT c_custkey AS custkey, c_name AS name,
               CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS segment,
               CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        FROM customer),
      h1 AS (SELECT *, sha256(concat_ws('|', upper(coalesce(name,'')),
                 upper(coalesce(segment,'')),
                 upper(coalesce(CAST(acctbal AS VARCHAR),'')))) AS hash_diff FROM snap1),
      h2 AS (SELECT *, sha256(concat_ws('|', upper(coalesce(name,'')),
                 upper(coalesce(segment,'')),
                 upper(coalesce(CAST(acctbal AS VARCHAR),'')))) AS hash_diff FROM snap2),
      d0 AS (SELECT custkey, name, segment, acctbal, hash_diff,
                    DATE '1900-01-01' AS ef, DATE '9999-12-31' AS et, TRUE AS cur
             FROM h1),
      changed AS (SELECT d0.custkey FROM d0
                  JOIN h2 ON d0.custkey = h2.custkey AND d0.hash_diff <> h2.hash_diff),
      kept AS (SELECT * FROM d0
               WHERE custkey NOT IN (SELECT custkey FROM changed)),
      closed AS (SELECT custkey, name, segment, acctbal, hash_diff,
                        ef, DATE '2024-06-01' AS et, FALSE AS cur
                 FROM d0 WHERE custkey IN (SELECT custkey FROM changed)),
      newv AS (SELECT custkey, name, segment, acctbal, hash_diff,
                      DATE '2024-06-01' AS ef, DATE '9999-12-31' AS et, TRUE AS cur
               FROM h2 WHERE custkey IN (SELECT custkey FROM changed)),
      brand AS (SELECT custkey, name, segment, acctbal, hash_diff,
                       DATE '1900-01-01' AS ef, DATE '9999-12-31' AS et, TRUE AS cur
                FROM h2 WHERE custkey NOT IN (SELECT custkey FROM d0))
      SELECT custkey, name, segment, CAST(acctbal AS DOUBLE) AS acctbal, hash_diff,
             strftime(ef, '%Y-%m-%d') AS effective_from,
             strftime(et, '%Y-%m-%d') AS effective_to,
             cur AS is_current
      FROM (SELECT * FROM kept UNION ALL SELECT * FROM closed
            UNION ALL SELECT * FROM newv UNION ALL SELECT * FROM brand)"""))

  val all: Seq[QueryDef] = Seq(q334, q335, q336)
}
