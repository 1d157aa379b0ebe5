package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-16 wave: table VERSIONING through the oracle gate — `VERSION AS
  * OF` snapshot reads over the mutation history the graft_cat tier now
  * records (reference intent: the re-runnable, auditable warehouse,
  * `SQLproject1.sql:612-615`; audit columns `SQLproject1.sql:104-105`).
  * Mutations retire replaced files into the attic by RENAME (never a
  * data copy) and append one log entry each; a snapshot read pays one
  * tiny log scan and then plans exactly the files of that version —
  * splits, partition pruning, and zone maps included. The REQUIREs pin
  * the mechanism (history actions, attic byte-identity, untouched-
  * partition stability); the oracle hash certifies the semantics. */
object R16Queries {

  private def ensureCatalog(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.graft_r16").isDefined) {
      s.conf.set("spark.sql.catalog.graft_r16",
        classOf[graft.sources.QuirkCsvCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_r16.root",
        java.nio.file.Files.createTempDirectory("graft_r16_cat").toString)
    }

  /** Unpartitioned time travel across appends and a copy-on-write
    * DELETE: v1 and v2 are appends, v3 rewrites the table without its
    * deleted rows — and the query reads VERSION AS OF 2, the full
    * pre-delete content, straight through SQL. The REQUIREs pin v1 and
    * the current version against spark-side twins (both exceptAll
    * directions), so all four snapshots are exercised even though the
    * oracle hashes one. */
  private val q355 = QueryDef(
    "q355_time_travel",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r16.q355")
      s.sql("DROP TABLE IF EXISTS graft_r16.q355.t")
      s.sql("CREATE TABLE graft_r16.q355.t (okey STRING, lnum STRING, " +
        "flag STRING)")
      val src = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("string").as("okey"),
        col("l_linenumber").cast("string").as("lnum"),
        col("l_returnflag").as("flag"))
      // both batches checkpointed: each feeds its append AND four
      // exceptAll legs below — un-snapshotted, the lineitem scan+filter
      // re-ran five times per batch
      val b1 = src.filter(col("l_orderkey") % 3 === 0).localCheckpoint()
      val b2 = src.filter(col("l_orderkey") % 3 === 1).localCheckpoint()
      b1.writeTo("graft_r16.q355.t").append()                 // v1
      b2.writeTo("graft_r16.q355.t").append()                 // v2
      s.sql("DELETE FROM graft_r16.q355.t WHERE lnum = '1'")  // v3 (COW)
      val v1 = s.sql("SELECT okey, lnum, flag FROM graft_r16.q355.t " +
        "VERSION AS OF 1").localCheckpoint()
      require(v1.exceptAll(b1).isEmpty && b1.exceptAll(v1).isEmpty,
        "VERSION AS OF 1 must equal the first append exactly")
      val cur = s.table("graft_r16.q355.t").localCheckpoint()
      val curTwin = b1.unionAll(b2).filter(col("lnum") =!= "1")
      require(cur.exceptAll(curTwin).isEmpty &&
        curTwin.exceptAll(cur).isEmpty,
        "the current version must reflect the copy-on-write DELETE")
      val hist = graft.sources.QuirkCsvVersions.history(s,
        s.conf.get("spark.sql.catalog.graft_r16.root") + "/q355/t")
        .orderBy("version").collect().map(_.getString(1)).toSeq
      require(hist == Seq("append", "append", "overwrite"),
        s"history must record the three mutations, got $hist")
      s.sql("SELECT okey, lnum, flag FROM graft_r16.q355.t VERSION AS OF 2")
        .localCheckpoint()
    },
    Some("""
      SELECT CAST(l_orderkey AS VARCHAR) AS okey,
             CAST(l_linenumber AS VARCHAR) AS lnum,
             l_returnflag AS flag
      FROM lineitem WHERE l_orderkey % 3 IN (0, 1)"""))

  /** Partitioned time travel: a dynamic partition overwrite (v2) and a
    * metadata-only DELETE (v3 — the value dir retires in ONE rename,
    * zero data files read) both stay partition-granular AND reversible.
    * REQUIREs: partitions untouched by v2/v3 keep byte-identical files
    * throughout; the snapshot read prunes to the probed partition's
    * single (attic) file. The oracle replays VERSION AS OF 1 — the
    * original load — which after both mutations can only be served
    * from retired bytes. */
  private val q356 = QueryDef(
    "q356_time_travel_partitioned",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r16.q356")
      s.sql("DROP TABLE IF EXISTS graft_r16.q356.t")
      s.sql("""CREATE TABLE graft_r16.q356.t (okey STRING, prio STRING)
        PARTITIONED BY (prio)""")
      val src = Tables.orders(s, d).select(
        col("o_orderkey").cast("string").as("okey"),
        col("o_orderpriority").as("prio"))
      src.writeTo("graft_r16.q356.t").append()                // v1
      val root = s.conf.get("spark.sql.catalog.graft_r16.root")
      def snap(dirName: String): Set[(String, Long, Long)] =
        new java.io.File(s"$root/q356/t/$dirName").listFiles()
          .filter(f => f.isFile && !f.getName.startsWith(".") &&
            !f.getName.startsWith("_"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      val untouched = Seq("prio=2-HIGH", "prio=3-MEDIUM", "prio=4-NOT+SPECIFIED")
        .map(n => n -> snap(n)).toMap
      src.filter(col("prio") === "1-URGENT" &&
          col("okey").cast("long") % 2 === 0)
        .writeTo("graft_r16.q356.t").overwritePartitions()    // v2
      s.sql("DELETE FROM graft_r16.q356.t WHERE prio = '5-LOW'") // v3
      untouched.foreach { case (n, before) =>
        require(snap(n) == before,
          s"partition $n was touched by a mutation scoped elsewhere")
      }
      val hist = graft.sources.QuirkCsvVersions.history(s, s"$root/q356/t")
        .orderBy("version").collect().map(_.getString(1)).toSeq
      require(hist == Seq("append", "dynamicOverwrite", "delete"),
        s"history must record the three mutations, got $hist")
      // snapshot partition pruning: the 5-LOW probe at v1 plans only the
      // retired dir's single file (served from the attic)
      val probe = s.read.format("graftcsv")
        .option("partitionCol", "prio")
        .option("asOfVersion", "1")
        .option("groupByPartition", "false")
        .load(s"$root/q356/t")
        .filter(col("prio") === "5-LOW")
      require(probe.rdd.getNumPartitions == 1,
        "the snapshot read must prune to the one retired file of the " +
          s"probed partition, planned ${probe.rdd.getNumPartitions}")
      s.sql("SELECT okey, prio FROM graft_r16.q356.t VERSION AS OF 1")
        .localCheckpoint()
    },
    Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS okey,
             o_orderpriority AS prio
      FROM orders"""))

  /** Near-dup index SERVED INCREMENTALLY from the catalog artifact
    * ([[graft.operators.NearDupIndex]]): the base corpus is banded once,
    * a new batch is banded alone and joined against the PERSISTED bands —
    * the pairs for "today vs everything" without re-shingling the corpus.
    * The REQUIRE pins incremental == the in-memory LSH pairing over the
    * union corpus restricted to pairs touching the new batch (both
    * exceptAll directions, string ids end to end); the oracle replays the
    * full MinHash banding in DuckDB with the same restriction. */
  private val q357 = QueryDef(
    "q357_neardup_index",
    (s, d) => {
      ensureCatalog(s)
      val docs = Tables.documents(s, d)
      val isNew = col("doc_id") % 10 >= 8
      FixtureOnce("q357", d) {
        graft.operators.NearDupIndex.build(s, "graft_r16", "q357", "nd",
          docs.filter(!isNew), "doc_id", "text",
          shingleN = 3, numHashes = 12, bandSize = 3)
        graft.operators.NearDupIndex.indexBatch(s, "graft_r16", "q357",
          "nd", docs.filter(isNew), "doc_id", "text", "b1")
      }
      val served = graft.operators.NearDupIndex.candidatePairsFor(
        s, "graft_r16", "q357", "nd", "b1").localCheckpoint()
      // twin: in-memory LSH over the UNION corpus with STRING ids (one
      // tie-break key type — the q351 lesson), restricted to pairs that
      // touch the new batch
      val docsStr = docs.select(col("doc_id").cast("string").as("doc_id"),
        col("text"))
      // twin checkpointed: BOTH exceptAll directions consume it — without
      // the snapshot the full banding recomputes once per direction
      val twin = graft.operators.NearDup.minHashLshCandidates(docsStr,
          "doc_id", "text", shingleN = 3, numHashes = 12, bandSize = 3)
        .filter(col("a_id").cast("long") % 10 >= 8 ||
          col("b_id").cast("long") % 10 >= 8)
        .localCheckpoint()
      require(served.exceptAll(twin).isEmpty &&
        twin.exceptAll(served).isEmpty,
        "index-served incremental candidates must equal the in-memory " +
          "LSH pairing over the union corpus restricted to the new batch")
      served
    },
    Some {
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
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)})
                 AS sh
             FROM t WHERE len(w) >= 3),
      sigs AS MATERIALIZED (SELECT doc_id,
             $sigCols
      FROM ws),
      bands0 AS MATERIALIZED (
        $bandSelects),
      bands AS MATERIALIZED (
        -- the hot-band cap pinned at build() (session default
        -- ${graft.operators.NearDup.DefaultMaxBandBucket}), counted over
        -- the WHOLE band table exactly as the serve does
        SELECT doc_id, band_id, band_key FROM bands0
        QUALIFY count(*) OVER (PARTITION BY band_id, band_key)
          <= ${graft.operators.NearDup.DefaultMaxBandBucket})
      SELECT DISTINCT
        LEAST(CAST(x.doc_id AS VARCHAR), CAST(y.doc_id AS VARCHAR)) AS a_id,
        GREATEST(CAST(x.doc_id AS VARCHAR), CAST(y.doc_id AS VARCHAR))
          AS b_id
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_key = y.band_key
       AND x.doc_id <> y.doc_id
      WHERE x.doc_id % 10 >= 8"""
    })

  /** Sidecar Bloom-filter file skipping (`TBLPROPERTIES
    * ('bloomCols'='okey')`): two interleaved appends (even / odd order
    * keys) produce files whose min/max STRING ranges fully overlap — the
    * layout range stats cannot prune without a clustered rewrite — yet
    * the equality probe REQUIREs exactly one data file planned on the
    * bloomed table while the bloom-less twin (same data, same layout)
    * must read both. The oracle replays the point lookup. */
  private val q358 = QueryDef(
    "q358_bloom_skipping",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r16.q358")
      // size the bloom FROM the data: ~16 bits per distinct value per
      // file (each append holds half the orders) — a saturated bloom
      // prunes nothing, so a fixed size would silently stop skipping at
      // the next scale factor (the sf0.1 bench caught exactly that)
      val perFile = Tables.orders(s, d).count() / 2
      val bloomBits = math.min(1L << 24,
        java.lang.Long.highestOneBit(math.max(8192L, perFile * 16) * 2 - 1))
      Seq("t", "twin").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS graft_r16.q358.$t")
        val props = if (t == "t")
          s" TBLPROPERTIES ('bloomCols'='okey', 'bloomBits'='$bloomBits')"
        else ""
        s.sql(s"CREATE TABLE graft_r16.q358.$t (okey STRING, prio STRING)" +
          props)
        val src = Tables.orders(s, d).select(
          col("o_orderkey").cast("string").as("okey"),
          col("o_orderpriority").as("prio"))
        Seq(0, 1).foreach { m =>
          src.filter(col("o_orderkey") % 2 === m).coalesce(1)
            .writeTo(s"graft_r16.q358.$t").append()
        }
      }
      val root = s.conf.get("spark.sql.catalog.graft_r16.root")
      // mid-range probe: inside BOTH files' string [min,max] (sf0.01
      // orders keys are dense 1..15000; 888 exists at sf0.001 too)
      def splits(t: String) = {
        val hit = s.read.format("graftcsv").load(s"$root/q358/$t")
          .filter(col("okey") === "888")
        (hit, hit.rdd.getNumPartitions)
      }
      // unpartitioned CATALOG tables plan the header-only seed as one
      // extra split (it has no sidecar entry): data-file counts are
      // splits - 1
      val (hit, nBloom) = splits("t")
      val (twinHit, nTwin) = splits("twin")
      require(nTwin == 3,
        s"bloom-less twin must read both interleaved files (+ seed), " +
          s"planned $nTwin")
      require(nBloom == 2,
        s"the bloomed table must skip the odd-keys file for probe 888 " +
          s"(+ seed), planned $nBloom")
      require(hit.collect().toSeq == twinHit.collect().toSeq,
        "bloomed and bloom-less tables must return identical rows")
      hit.localCheckpoint()
    },
    Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS okey,
             o_orderpriority AS prio
      FROM orders WHERE o_orderkey = 888"""))

  /** Row-level CHANGE FEED between versions
    * ([[graft.sources.QuirkCsvVersions.changes]]): the multiset diff of
    * two snapshots, computed over ONLY the files that differ between
    * them — common files cancel exactly, so a one-partition mutation
    * diffs one partition. The fixture overwrites a single partition
    * (dropping its odd keys); the REQUIRE pins every differing file to
    * that partition's directory and the oracle replays the change set
    * (pure deletes — the carried-over even rows cancel). */
  private val q359 = QueryDef(
    "q359_version_diff",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r16.q359")
      s.sql("DROP TABLE IF EXISTS graft_r16.q359.t")
      s.sql("""CREATE TABLE graft_r16.q359.t (okey STRING, prio STRING)
        PARTITIONED BY (prio)""")
      val src = Tables.orders(s, d).select(
        col("o_orderkey").cast("string").as("okey"),
        col("o_orderpriority").as("prio"))
      src.writeTo("graft_r16.q359.t").append()               // v1
      src.filter(col("prio") === "1-URGENT" &&
          col("okey").cast("long") % 2 === 0)
        .writeTo("graft_r16.q359.t").overwritePartitions()   // v2
      val root = s.conf.get("spark.sql.catalog.graft_r16.root") + "/q359/t"
      // the file delta must touch ONLY the overwritten partition — the
      // mechanism that makes the diff partition-local at 100 TB
      val (aOnly, bOnly) = graft.sources.QuirkCsvVersions
        .changedFileSets(s, root, 1, 2)
      require(aOnly.nonEmpty && bOnly.nonEmpty &&
        (aOnly ++ bOnly).forall(_.path.contains("prio=1-URGENT")),
        s"version diff v1->v2 must be confined to prio=1-URGENT, got " +
          s"${(aOnly ++ bOnly).map(_.path).mkString(", ")}")
      graft.sources.QuirkCsvVersions.changes(s, root, 1, 2)
        .localCheckpoint()
    },
    Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS okey,
             o_orderpriority AS prio,
             'delete' AS change_type
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 1"""))

  /** The table lifecycle driven ENTIRELY from SQL — `CALL
    * graft_cat.system.*` stored procedures ([[graft.sources
    * .QuirkCsvProcedures]]): two appends and a DELETE accumulate small
    * files and history; `compact` folds them (REQUIRE: file counts from
    * the CALL's own result row); `history` REQUIREs the full mutation
    * log incl. the compaction; `vacuum` pins the retention horizon
    * (REQUIRE: pre-horizon snapshot loud, post-horizon snapshot
    * serves). The emitted rows are the surviving table content — the
    * oracle certifies that SQL-driven maintenance changed the layout
    * and the history, never the data. */
  private val q360 = QueryDef(
    "q360_sql_maintenance",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r16.q360")
      s.sql("DROP TABLE IF EXISTS graft_r16.q360.t")
      s.sql("CREATE TABLE graft_r16.q360.t (okey STRING, flag STRING)")
      val src = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("string").as("okey"),
        col("l_returnflag").as("flag"))
      src.filter(col("l_orderkey") % 4 === 0).coalesce(1)
        .writeTo("graft_r16.q360.t").append()                     // v1
      src.filter(col("l_orderkey") % 4 === 1).coalesce(1)
        .writeTo("graft_r16.q360.t").append()                     // v2
      s.sql("DELETE FROM graft_r16.q360.t WHERE flag = 'R'")      // v3
      val folded = s.sql("CALL graft_r16.system.compact('q360.t', 1)")
        .collect()(0)
      require(folded.getLong(0) >= 2 && folded.getLong(1) == 1,
        s"compact must fold the accumulated files to one, got " +
          s"${folded.getLong(0)} -> ${folded.getLong(1)}")
      val hist = s.sql("CALL graft_r16.system.history('q360.t')")
        .orderBy("version").collect().map(_.getString(1)).toSeq
      require(hist == Seq("append", "append", "overwrite", "compact"),
        s"history must record the full SQL-driven lifecycle, got $hist")
      val horizon = s.sql("CALL graft_r16.system.vacuum('q360.t', 1)")
        .collect()(0).getLong(0)
      require(horizon == 3L, s"vacuum(retain 1) must pin horizon 3, " +
        s"got $horizon")
      val preHorizonLoud =
        try { s.sql("SELECT * FROM graft_r16.q360.t VERSION AS OF 1")
          .collect(); false }
        catch { case _: Exception => true }
      require(preHorizonLoud,
        "a vacuumed snapshot must fail loudly, not serve partial data")
      require(s.sql("SELECT * FROM graft_r16.q360.t VERSION AS OF 3")
        .count() == s.table("graft_r16.q360.t").count(),
        "the post-horizon snapshot must still serve")
      s.sql("SELECT okey, flag FROM graft_r16.q360.t").localCheckpoint()
    },
    Some("""
      SELECT CAST(l_orderkey AS VARCHAR) AS okey, l_returnflag AS flag
      FROM lineitem
      WHERE l_orderkey % 4 IN (0, 1) AND l_returnflag <> 'R'"""))

  /** RESTORE as the one-call undo ([[graft.sources.QuirkCsvVersions
    * .restore]], surfaced as `CALL system.restore`): a metadata DELETE
    * drops a whole partition, the restore brings it back AS A NEW
    * VERSION — history is never rewritten (REQUIRE: the action log and
    * both directions of time travel across the restore), and the
    * emitted current state hash-matches the original load. */
  private val q361 = QueryDef(
    "q361_restore",
    (s, d) => {
      ensureCatalog(s)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_r16.q361")
      s.sql("DROP TABLE IF EXISTS graft_r16.q361.t")
      s.sql("""CREATE TABLE graft_r16.q361.t (okey STRING, prio STRING)
        PARTITIONED BY (prio)""")
      Tables.orders(s, d).select(
          col("o_orderkey").cast("string").as("okey"),
          col("o_orderpriority").as("prio"))
        .writeTo("graft_r16.q361.t").append()                   // v1
      s.sql("DELETE FROM graft_r16.q361.t WHERE prio = '5-LOW'") // v2
      val restored = s.sql("CALL graft_r16.system.restore('q361.t', 1)")
        .collect()(0).getLong(0)
      require(restored == 3L, s"restore must land as version 3, got " +
        s"$restored")
      val hist = s.sql("CALL graft_r16.system.history('q361.t')")
        .orderBy("version").collect().map(_.getString(1)).toSeq
      require(hist == Seq("append", "delete", "restore-v1"),
        s"history must stay append-only across the restore, got $hist")
      // time travel works in BOTH directions across the restore
      require(s.sql(
        "SELECT * FROM graft_r16.q361.t VERSION AS OF 2")
        .filter(col("prio") === "5-LOW").count() == 0,
        "the deleted state must remain readable AT its version")
      require(s.sql(
        "SELECT * FROM graft_r16.q361.t VERSION AS OF 3")
        .filter(col("prio") === "5-LOW").count() > 0,
        "the restored state must hold the partition again")
      s.sql("SELECT okey, prio FROM graft_r16.q361.t").localCheckpoint()
    },
    Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS okey,
             o_orderpriority AS prio
      FROM orders"""))

  val all: Seq[QueryDef] = Seq(q355, q356, q357, q358, q359, q360, q361)
}
