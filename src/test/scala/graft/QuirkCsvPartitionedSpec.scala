package graft

import org.apache.spark.sql.functions._

/** Identity-partitioned graft_cat tables: hive-style `col=value` subdir
  * layout, routed writes under a clustered distribution, directory-level
  * partition pruning (incl. via pushed filters), and the append-only
  * guard rails. */
class QuirkCsvPartitionedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.conf.set("spark.sql.catalog.graft_part",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_part.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_part.ns")
    r
  }

  test("create partitioned table, routed insert, full read-back") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.t (id STRING, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_part.ns.t VALUES
      ('1','east'), ('2','west'), ('3','east'), ('4','south')""")
    // layout: one value subdir per region
    val sub = new java.io.File(s"$root/ns/t").listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
      .map(_.getName).sorted
    sub.toSeq shouldBe Seq("region=east", "region=south", "region=west")
    val back = spark.sql(
      "SELECT id, region FROM graft_part.ns.t ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    back.toSeq shouldBe Seq(("1", "east"), ("2", "west"), ("3", "east"),
      ("4", "south"))
    // the table reports its partitioning
    spark.sql("DESCRIBE TABLE EXTENDED graft_part.ns.t")
      .collect().map(_.toString).mkString("\n") should include("region")
  }

  test("partition pruning: equality and In filters skip whole directories") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.p (k STRING, part STRING)
      PARTITIONED BY (part)""")
    (0 until 4).foreach { i =>
      spark.range(10).selectExpr(
        s"CAST(id + ${i * 10} AS STRING) AS k", s"'p$i' AS part")
        .writeTo("graft_part.ns.p").append()
    }
    val eq = spark.table("graft_part.ns.p").filter(col("part") === "p2")
    eq.rdd.getNumPartitions shouldBe 1
    eq.count() shouldBe 10L
    val in = spark.table("graft_part.ns.p")
      .filter(col("part").isin("p0", "p3"))
    in.rdd.getNumPartitions shouldBe 2
    in.count() shouldBe 20L
    // a filter on a non-partition column can't drop DIRS, and in the
    // default grouped (SPJ) mode the VALUE GROUPS must stay stable —
    // zone maps prune files only WITHIN each group (k='5' falls only in
    // p0's "0".."9" string range, so 3 of the 4 groups carry no files)
    val byK = spark.table("graft_part.ns.p").filter(col("k") === "5")
    byK.rdd.getNumPartitions shouldBe 4 // groups kept for SPJ stability
    byK.count() shouldBe 1L
    // the ungrouped read shows the same pruning as SPLITS: one file
    val ungrouped = spark.read.format("graftcsv")
      .option("partitionCol", "part").option("groupByPartition", "false")
      .load(s"$root/ns/p").filter(col("k") === "5")
    ungrouped.rdd.getNumPartitions shouldBe 1
    ungrouped.count() shouldBe 1L
  }

  test("dynamic partition pruning: a broadcast join's runtime In-filter prunes dirs") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.f (v STRING, pk STRING)
      PARTITIONED BY (pk)""")
    (0 until 4).foreach { i =>
      spark.range(50).selectExpr(
        "CAST(id AS STRING) AS v", s"'k$i' AS pk")
        .writeTo("graft_part.ns.f").append()
    }
    // dim must be a real scan (not a LocalRelation) for DPP to inject
    val dimDir = java.nio.file.Files.createTempDirectory("part_dim").toString
    Seq(("k1", "keep")).toDF("pk", "tag")
      .write.format("graftcsv").mode("overwrite").save(dimDir)
    val dim = spark.read.format("graftcsv").load(dimDir)
      .filter(col("tag") === "keep")
    val joined = spark.table("graft_part.ns.f")
      .join(broadcast(dim), Seq("pk"))
    joined.count() shouldBe 50L
    // runtime filter reached the scan: only the k1 directory was read
    import scala.jdk.CollectionConverters._
    val scans = joined.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val metrics = joined.queryExecution.executedPlan.collectLeaves()
    // cheap and unambiguous: re-run as an explicit In filter and compare
    // planned partition counts
    spark.table("graft_part.ns.f").filter(col("pk") === "k1")
      .rdd.getNumPartitions shouldBe 1
  }

  test("whole-table statements: un-scoped static overwrite rejected; " +
      "explicit TRUNCATE / DELETE-all work") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.g (a STRING, b STRING)
      PARTITIONED BY (b)""")
    spark.sql("INSERT INTO graft_part.ns.g VALUES ('1','x')")
    // static-mode INSERT OVERWRITE with no partition scope would truncate
    // the whole table as an easy ACCIDENT of the default conf — rejected
    // with guidance toward the scoped forms (which are partition-granular
    // now: QuirkCsvPartitionedRowLevelSpec)
    withSQLConf("spark.sql.sources.partitionOverwriteMode" -> "static") {
      val ow = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft_part.ns.g VALUES ('2','y')")
      }
      ow.getMessage should include("never truncate whole-table")
    }
    spark.table("graft_part.ns.g").count() shouldBe 1L
    // EXPLICIT whole-table statements DO work: DELETE with no WHERE
    // (Spark routes its TrueLiteral condition to TruncatableTable before
    // the row-level rewrite) and TRUNCATE TABLE — both remove every
    // value dir and leave the table usable
    spark.sql("DELETE FROM graft_part.ns.g")
    spark.table("graft_part.ns.g").count() shouldBe 0L
    spark.sql("INSERT INTO graft_part.ns.g VALUES ('3','z'), ('4','w')")
    spark.table("graft_part.ns.g").count() shouldBe 2L
    spark.sql("TRUNCATE TABLE graft_part.ns.g")
    spark.table("graft_part.ns.g").count() shouldBe 0L
    new java.io.File(s"$root/ns/g").listFiles()
      .count(d => d.isDirectory && !d.getName.startsWith("_")) shouldBe
      0 // value dirs gone (retired into the versioning attic), seed kept
    spark.sql("INSERT INTO graft_part.ns.g VALUES ('5','v')")
    spark.table("graft_part.ns.g").count() shouldBe 1L
  }

  test("unconditional DELETE and TRUNCATE on an UNPARTITIONED table " +
      "remove all rows, keep the schema seed") {
    root
    spark.sql("CREATE TABLE graft_part.ns.flat (a STRING, b STRING)")
    spark.sql("INSERT INTO graft_part.ns.flat VALUES ('1','x'), ('2','y')")
    spark.sql("DELETE FROM graft_part.ns.flat")
    spark.table("graft_part.ns.flat").count() shouldBe 0L
    spark.sql("INSERT INTO graft_part.ns.flat VALUES ('3','z')")
    spark.sql("TRUNCATE TABLE graft_part.ns.flat")
    spark.table("graft_part.ns.flat").count() shouldBe 0L
    // schema survives the truncate (the seed file is preserved)
    spark.table("graft_part.ns.flat").columns.toSeq shouldBe Seq("a", "b")
    spark.sql("INSERT INTO graft_part.ns.flat VALUES ('4','w')")
    spark.table("graft_part.ns.flat").count() shouldBe 1L
  }

  test("per-directory zone maps prune files INSIDE surviving partitions") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.z (k STRING, part STRING)
      PARTITIONED BY (part)""")
    // three inserts per partition with DISJOINT zero-padded key ranges
    // (string order == numeric order) -> 3 one-range files per value dir
    (0 until 3).foreach { b =>
      spark.range(10).selectExpr(
        s"lpad(CAST(id + ${b * 100} AS STRING), 4, '0') AS k",
        "CASE WHEN id % 2 = 0 THEN 'pa' ELSE 'pb' END AS part")
        .coalesce(1)
        .writeTo("graft_part.ns.z").append()
    }
    // each value dir carries its own sidecar now
    new java.io.File(s"$root/ns/z/part=pa/_graft_zonemap.tsv")
      .exists() shouldBe true
    // partition filter drops a dir; the key filter then prunes to the
    // ONE file of part=pa whose [0100..0108] range covers the probe —
    // observable as one SPLIT on the ungrouped read (the grouped/SPJ
    // read plans one whole-VALUE split either way)
    val hit = spark.read.format("graftcsv")
      .option("partitionCol", "part").option("groupByPartition", "false")
      .load(s"$root/ns/z")
      .filter(col("part") === "pa" && col("k") === "0104")
    hit.rdd.getNumPartitions shouldBe 1
    hit.count() shouldBe 1L
    // a key outside every range prunes ALL files of the surviving dir
    spark.table("graft_part.ns.z")
      .filter(col("part") === "pa" && col("k") === "0999")
      .count() shouldBe 0L
    // without a non-partition predicate nothing extra is read per dir
    spark.table("graft_part.ns.z").filter(col("part") === "pa")
      .count() shouldBe 15L
    // copy-on-write keeps the sidecars honest: delete rows from one
    // range file, then re-probe — the rewritten dir still prunes right
    spark.sql("DELETE FROM graft_part.ns.z WHERE k = '0104'")
    spark.table("graft_part.ns.z")
      .filter(col("part") === "pa" && col("k") === "0104")
      .count() shouldBe 0L
    spark.table("graft_part.ns.z")
      .filter(col("part") === "pa" && col("k") === "0106")
      .count() shouldBe 1L
  }

  test("null partition values fail loudly at the write") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.n (a STRING, b STRING)
      PARTITIONED BY (b)""")
    val err = intercept[Exception] {
      spark.sql("INSERT INTO graft_part.ns.n VALUES ('1', NULL)")
    }
    err.getMessage should include("NULL value for partition column")
  }

  test("values needing encoding round-trip through the directory name") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.e (a STRING, b STRING)
      PARTITIONED BY (b)""")
    spark.sql("""INSERT INTO graft_part.ns.e VALUES
      ('1', 'has space'), ('2', 'a/b=c'), ('3', 'plain')""")
    val back = spark.table("graft_part.ns.e")
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    back shouldBe Set(("1", "has space"), ("2", "a/b=c"), ("3", "plain"))
    spark.table("graft_part.ns.e").filter(col("b") === "a/b=c")
      .rdd.getNumPartitions shouldBe 1
  }

  test("compactCsv refuses a partitioned table root (subdirs are the unit)") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.c (a STRING, b STRING)
      PARTITIONED BY (b)""")
    spark.sql("INSERT INTO graft_part.ns.c VALUES ('1','x'), ('2','x')")
    val err = intercept[Exception] {
      graft.operators.Scale.compactCsv(spark, s"$root/ns/c", 1)
    }
    err.getMessage should include("PARTITIONED")
    // the value subdir itself compacts fine (plain directory, no marker)
    spark.sql("INSERT INTO graft_part.ns.c VALUES ('3','x')")
    val (before, after) =
      graft.operators.Scale.compactCsv(spark, s"$root/ns/c/b=x", 1)
    before should be >= 2L
    after shouldBe 1L
    spark.table("graft_part.ns.c").count() shouldBe 3L
  }

  test("plain (optionless) reads and writes of a partitioned root fail loudly") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.l (a STRING, b STRING)
      PARTITIONED BY (b)""")
    spark.sql("INSERT INTO graft_part.ns.l VALUES ('1','x')")
    val rd = intercept[Exception] {
      spark.read.format("graftcsv").load(s"$root/ns/l").count()
    }
    rd.getMessage should include("PARTITIONED")
    val wr = intercept[Exception] {
      import spark.implicits._
      Seq(("9", "z")).toDF("a", "b").write.format("graftcsv")
        .mode("append").save(s"$root/ns/l")
    }
    wr.getMessage should include("PARTITIONED")
    spark.table("graft_part.ns.l").count() shouldBe 1L
  }

  test("partition management: SHOW PARTITIONS, ADD/DROP PARTITION as retention") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.r (v STRING, day STRING)
      PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft_part.ns.r VALUES
      ('a','2023-01-01'), ('b','2023-01-02'), ('c','2024-01-01')""")
    spark.sql("SHOW PARTITIONS graft_part.ns.r")
      .collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("day=2023-01-01", "day=2023-01-02", "day=2024-01-01")
    // retention: drop a whole day — the append-only table's deletion unit
    spark.sql(
      "ALTER TABLE graft_part.ns.r DROP PARTITION (day='2023-01-01')")
    spark.table("graft_part.ns.r").select("v")
      .collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("b", "c")
    spark.sql("SHOW PARTITIONS graft_part.ns.r").count() shouldBe 2L
    // ADD PARTITION pre-creates an empty value dir (visible, zero rows)
    spark.sql(
      "ALTER TABLE graft_part.ns.r ADD PARTITION (day='2025-01-01')")
    spark.sql("SHOW PARTITIONS graft_part.ns.r").count() shouldBe 3L
    spark.table("graft_part.ns.r").count() shouldBe 2L
    // duplicate ADD fails; DROP of a missing partition errors cleanly
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft_part.ns.r ADD PARTITION (day='2025-01-01')")
    }
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft_part.ns.r DROP PARTITION (day='1999-01-01')")
    }
  }

  test("partition management guards: unpartitioned tables, partial spec, LOCATION") {
    root
    // unpartitioned table: every partition-management statement fails
    spark.sql("CREATE TABLE graft_part.ns.u (a STRING)")
    val sp = intercept[Exception] {
      spark.sql("SHOW PARTITIONS graft_part.ns.u")
    }
    sp.getMessage.toLowerCase should include("partition")
    intercept[Exception] {
      spark.sql("ALTER TABLE graft_part.ns.u ADD PARTITION (a='x')")
    }
    // partial spec: SHOW PARTITIONS t PARTITION (day=...) filters
    spark.sql("""CREATE TABLE graft_part.ns.ps (v STRING, day STRING)
      PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO graft_part.ns.ps VALUES
      ('a','d1'), ('b','d2'), ('c','has space')""")
    spark.sql("SHOW PARTITIONS graft_part.ns.ps PARTITION (day='d2')")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("day=d2")
    // encoded values decode in the listing (round-trip through the dir)
    spark.sql(
      "SHOW PARTITIONS graft_part.ns.ps PARTITION (day='has space')")
      .count() shouldBe 1L
    // LOCATION cannot be honored — rejected, not silently dropped
    val loc = intercept[Exception] {
      spark.sql("""ALTER TABLE graft_part.ns.ps
        ADD PARTITION (day='ext') LOCATION '/tmp/elsewhere'""")
    }
    loc.getMessage should include("no properties")
  }

  test("ALTER ADD COLUMN composes with partitioning") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.w (a STRING, b STRING)
      PARTITIONED BY (b)""")
    spark.sql("INSERT INTO graft_part.ns.w VALUES ('1','x')")
    spark.sql("ALTER TABLE graft_part.ns.w ADD COLUMN c STRING")
    spark.sql("INSERT INTO graft_part.ns.w VALUES ('2','y','C2')")
    val rows = spark.sql(
      "SELECT a, b, c FROM graft_part.ns.w ORDER BY a")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    rows.toSeq shouldBe Seq(("1", "x", null), ("2", "y", "C2"))
  }

  test("clusterBy table property: a single INSERT writes disjoint " +
      "per-file key ranges inside each value dir") {
    root
    spark.sql("""CREATE TABLE graft_part.ns.cl (k STRING, p STRING)
      PARTITIONED BY (p) TBLPROPERTIES ('clusterBy'='k')""")
    // one INSERT, keys interleaved across partitions: the ordered
    // distribution (p, k) range-shuffles, so a dir that spans several
    // tasks gets several files with DISJOINT k ranges. (AQE would
    // coalesce this toy write to one task — pin 4 so the dir spans
    // range boundaries; at data volume the task count is natural.)
    val priorC = spark.conf.getOption(
      "spark.sql.adaptive.coalescePartitions.enabled")
    val priorN = spark.conf.getOption("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        "false")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.range(2000).selectExpr(
        "lpad(CAST(id AS STRING), 6, '0') AS k",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p")
        .writeTo("graft_part.ns.cl").append()
    } finally {
      priorC.fold(spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.enabled"))(
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", _))
      priorN.fold(spark.conf.unset("spark.sql.shuffle.partitions"))(
        spark.conf.set("spark.sql.shuffle.partitions", _))
    }
    val aDir = new java.io.File(s"$root/ns/cl/p=a")
    val files = aDir.listFiles().filter(f => f.isFile &&
      !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    files.length should be >= 2 // several range tasks held p=a rows
    val ranges = files.map { f =>
      val ks = spark.read.format("graftcsv").load(f.getPath)
        .collect().map(_.getString(0))
      (ks.min, ks.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2,
        s"file ranges overlap: $ranges")
      case _ =>
    }
    // and a mid-range probe plans fewer splits than there are files
    val probe = ranges(ranges.length / 2)._1
    val hit = spark.read.format("graftcsv")
      .option("partitionCol", "p").option("groupByPartition", "false")
      .load(s"$root/ns/cl")
      .filter(col("p") === "a" && col("k") === probe)
    hit.rdd.getNumPartitions shouldBe 1
    hit.count() shouldBe 1
    // rejected: clustering by the partition column itself — and the
    // failed CREATE leaves NO ghost directory, so the corrected retry
    // succeeds instead of throwing AlreadyExists
    val bad = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_part.ns.cl2 (k STRING, p STRING)
        PARTITIONED BY (p) TBLPROPERTIES ('clusterBy'='p')""")
    }
    bad.getMessage should include("partition column")
    new java.io.File(s"$root/ns/cl2").exists() shouldBe false
    spark.sql("""CREATE TABLE graft_part.ns.cl2 (k STRING, p STRING)
      PARTITIONED BY (p) TBLPROPERTIES ('clusterBy'='k')""")
    spark.sql("INSERT INTO graft_part.ns.cl2 VALUES ('1','a')")
    spark.table("graft_part.ns.cl2").count() shouldBe 1L
  }

  test("partition-filter-aware listing: excluded value dirs are never " +
    "LISTED, not merely pruned after listing") {
    // the countfs: scheme (a local FS recording every listStatus — see
    // CountingFileSystem) makes the directory RPCs observable: a filter
    // selecting ONE of 40 values must plan by listing the root and THAT
    // value dir only — at 100k partitions this is one directory RPC
    // instead of 100k per planning
    val local = java.nio.file.Files.createTempDirectory("graft_dirskip")
    val dir = s"countfs:$local"
    val n = 40
    val schema = Seq(("1", "0")).toDF("k", "day").schema
    spark.range(0, n.toLong * 2).select(
        col("id").cast("string").as("k"),
        (col("id") % n).cast("string").as("day"))
      .write.format("graftcsv").option("partitionCol", "day")
      .mode("append").save(dir)
    def plan(filtered: Boolean): Set[String] = {
      CountingFileSystem.listed.clear()
      val r = spark.read.format("graftcsv").schema(schema)
        .option("partitionCol", "day").load(dir)
      (if (filtered) r.filter(col("day") === "7") else r)
        .rdd.getNumPartitions should be >= 1
      val got = new java.util.HashSet(CountingFileSystem.listed)
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    val filteredDirs = plan(filtered = true).filter(_.contains("day="))
    filteredDirs.map(_.split("day=").last) shouldBe Set("7")
    val fullDirs = plan(filtered = false).filter(_.contains("day="))
    fullDirs.size shouldBe n
    // and the skip is exact: the filtered read returns the value's rows
    spark.read.format("graftcsv").schema(schema)
      .option("partitionCol", "day").load(dir)
      .filter(col("day") === "7")
      .select("k").collect().map(_.getString(0)).toSet shouldBe
      Set("7", (n + 7).toString)
  }
}
