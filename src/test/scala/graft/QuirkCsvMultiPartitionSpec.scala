package graft

import org.apache.spark.sql.functions._

/** Multi-column identity partitioning: `PARTITIONED BY (b, c)` lays data
  * out as nested `b=v1/c=v2/` value directories — pruning at ANY level,
  * partial-spec retention (DELETE on one level's predicate is
  * metadata-only), dynamic overwrite at leaf-tuple granularity in ONE
  * commit, SHOW PARTITIONS tuples, versioned time travel across all of
  * it, and the grouped (SPJ) scan keyed on the LEADING column. */
class QuirkCsvMultiPartitionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_mp").toString
    spark.conf.set("spark.sql.catalog.graft_mp",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mp.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_mp.ns")
    r
  }

  private def mkTable(name: String): Unit =
    spark.sql(s"""CREATE TABLE graft_mp.ns.$name
      (k STRING, b STRING, c STRING) PARTITIONED BY (b, c)""")

  private def fill(name: String): Unit =
    // 2 buckets x 3 batches x 4 rows
    spark.range(24).selectExpr(
      "CAST(id AS STRING) AS k",
      "CAST(id % 2 AS STRING) AS b",
      "concat('d', CAST((id / 2) % 3 AS INT)) AS c")
      .writeTo(s"graft_mp.ns.$name").append()

  test("nested layout on disk, full read-back, partitioning reported") {
    root
    mkTable("t")
    fill("t")
    val lvl1 = new java.io.File(s"$root/ns/t").listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
      .map(_.getName).sorted
    lvl1.toSeq shouldBe Seq("b=0", "b=1")
    val lvl2 = new java.io.File(s"$root/ns/t/b=0").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    lvl2.toSeq shouldBe Seq("c=d0", "c=d1", "c=d2")
    spark.table("graft_mp.ns.t").count() shouldBe 24L
    spark.table("graft_mp.ns.t")
      .select(col("k").cast("long")).agg(sum("k")).collect()(0)
      .getLong(0) shouldBe (0 until 24).sum.toLong
    val parts = spark.sql("SHOW PARTITIONS graft_mp.ns.t")
      .collect().map(_.getString(0)).sorted
    parts.length shouldBe 6
    parts.head shouldBe "b=0/c=d0"
  }

  test("pruning at EITHER level skips whole directories before listing") {
    root
    mkTable("p")
    fill("p")
    // leading-column filter: one level-1 dir (3 leaf dirs = 3 groups)
    val byB = spark.table("graft_mp.ns.p").filter(col("b") === "1")
    byB.count() shouldBe 12L
    // second-level filter: 2 leaf dirs survive, one per bucket
    val byC = spark.table("graft_mp.ns.p").filter(col("c") === "d1")
    byC.count() shouldBe 8L
    // both levels: exactly one leaf dir — read it raw to count files
    val byBoth = spark.table("graft_mp.ns.p")
      .filter(col("b") === "0" && col("c") === "d2")
    byBoth.count() shouldBe 4L
    byBoth.select(col("k").cast("long")).collect().map(_.getLong(0))
      .sorted.toSeq shouldBe Seq(4L, 10L, 16L, 22L)
  }

  test("partial-spec DELETE is metadata-only at leaf granularity and " +
      "versioned reads see the pre-delete state") {
    root
    mkTable("d")
    fill("d")
    val leaf = new java.io.File(s"$root/ns/d/b=0/c=d1")
    leaf.exists() shouldBe true
    // predicate on the SECOND level only: drops that batch in every
    // bucket — the two-level replay/retention story
    spark.sql("DELETE FROM graft_mp.ns.d WHERE c = 'd1'")
    spark.table("graft_mp.ns.d").count() shouldBe 16L
    spark.table("graft_mp.ns.d").filter(col("c") === "d1")
      .count() shouldBe 0L
    leaf.exists() shouldBe false
    // versioned: the delete retired dirs into the attic — AS OF reads
    // the full 24 rows
    val hist = spark.sql(
      "CALL graft_mp.system.current_version('ns.d')").collect()(0).getLong(0)
    spark.sql(
      s"SELECT count(*) FROM graft_mp.ns.d VERSION AS OF ${hist - 1}")
      .collect()(0).getLong(0) shouldBe 24L
    // predicate on the LEADING level
    spark.sql("DELETE FROM graft_mp.ns.d WHERE b = '1'")
    spark.table("graft_mp.ns.d").count() shouldBe 8L
  }

  test("dynamic partition overwrite replaces exactly the written leaf " +
      "tuples in ONE version-log commit") {
    root
    mkTable("o")
    fill("o")
    val v0 = spark.sql("CALL graft_mp.system.current_version('ns.o')")
      .collect()(0).getLong(0)
    // re-deliver batch d1 (both buckets) with revised content
    spark.range(8).selectExpr(
      "concat('r', CAST(id AS STRING)) AS k",
      "CAST(id % 2 AS STRING) AS b", "'d1' AS c")
      .writeTo("graft_mp.ns.o").overwritePartitions()
    val t = spark.table("graft_mp.ns.o")
    t.count() shouldBe 24L // 16 untouched + 8 replacement
    t.filter(col("c") === "d1").select("k").collect()
      .map(_.getString(0)).forall(_.startsWith("r")) shouldBe true
    t.filter(col("c") =!= "d1" && col("k").startsWith("r"))
      .count() shouldBe 0L
    // exactly ONE commit landed: replay is single-commit — a concurrent
    // reader sees the old batch or the new batch, never neither
    spark.sql("CALL graft_mp.system.current_version('ns.o')")
      .collect()(0).getLong(0) shouldBe (v0 + 1)
    // idempotent re-delivery converges (same rows, still one batch copy)
    spark.range(8).selectExpr(
      "concat('r', CAST(id AS STRING)) AS k",
      "CAST(id % 2 AS STRING) AS b", "'d1' AS c")
      .writeTo("graft_mp.ns.o").overwritePartitions()
    spark.table("graft_mp.ns.o").count() shouldBe 24L
  }

  test("SHOW PARTITIONS partial spec filters on the named level; ALTER " +
      "DROP PARTITION takes the full tuple") {
    root
    mkTable("s")
    fill("s")
    spark.sql("SHOW PARTITIONS graft_mp.ns.s PARTITION (b='1')")
      .collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("b=1/c=d0", "b=1/c=d1", "b=1/c=d2")
    spark.sql(
      "ALTER TABLE graft_mp.ns.s DROP PARTITION (b='1', c='d2')")
    spark.table("graft_mp.ns.s").count() shouldBe 20L
    spark.sql("SHOW PARTITIONS graft_mp.ns.s")
      .collect().length shouldBe 5
  }

  test("grouped (SPJ) scans key on the LEADING column: a self-join on " +
      "it plans zero shuffles while batches keep their own dirs") {
    root
    mkTable("j")
    fill("j")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val t = spark.table("graft_mp.ns.j")
      // 2 leading values -> 2 key groups, each chaining 3 batch dirs
      t.rdd.getNumPartitions shouldBe 2
      val joined = t.as("x").join(spark.table("graft_mp.ns.j").as("y"),
        col("x.b") === col("y.b"))
      joined.collect().length shouldBe 24 * 12
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      def shuffles(p: SparkPlan): Int = {
        val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case o => o.children
        }
        self + kids.map(shuffles).sum
      }
      shuffles(joined.queryExecution.executedPlan) shouldBe 0
    }
  }

  test("TRUNCATE and whole-table DELETE clear every level; the table " +
      "stays writable") {
    root
    mkTable("tr")
    fill("tr")
    spark.sql("TRUNCATE TABLE graft_mp.ns.tr")
    spark.table("graft_mp.ns.tr").count() shouldBe 0L
    fill("tr")
    spark.table("graft_mp.ns.tr").count() shouldBe 24L
    spark.sql("DELETE FROM graft_mp.ns.tr")
    spark.table("graft_mp.ns.tr").count() shouldBe 0L
  }

  test("time travel ACROSS a multi-level TRUNCATE: pre-truncate " +
      "snapshots resolve every nested leaf file from the attic, and " +
      "restore brings the rows back") {
    root
    mkTable("ttr")
    fill("ttr")                                            // v1: append
    spark.sql("TRUNCATE TABLE graft_mp.ns.ttr")            // v2: truncate
    spark.table("graft_mp.ns.ttr").count() shouldBe 0L
    // the regression: TRUNCATE retires LEVEL-1 dirs whose data files sit
    // in nested leaf dirs — a non-recursive retirement listing recorded
    // no R lines for them, so this read died with "expects live file …
    // history was modified out-of-band"
    val v1 = spark.sql("SELECT * FROM graft_mp.ns.ttr VERSION AS OF 1")
    v1.count() shouldBe 24L
    v1.select(col("k").cast("long")).agg(sum("k")).collect()(0)
      .getLong(0) shouldBe (0 until 24).sum.toLong
    // and the one-call undo works across the same boundary
    spark.sql("CALL graft_mp.system.restore('ns.ttr', 1)")
    spark.table("graft_mp.ns.ttr").count() shouldBe 24L
  }

  test("static overwrite scoped to the leading level replaces every " +
      "batch beneath it and nothing else") {
    root
    mkTable("st")
    fill("st")
    spark.sql("""INSERT OVERWRITE graft_mp.ns.st PARTITION (b = '0')
      SELECT concat('s', k) AS k, c FROM (
        SELECT CAST(id AS STRING) k, concat('d', CAST(id % 3 AS INT)) c
        FROM range(6))""")
    val t = spark.table("graft_mp.ns.st")
    t.filter(col("b") === "0").count() shouldBe 6L
    t.filter(col("b") === "0" && !col("k").startsWith("s"))
      .count() shouldBe 0L
    t.filter(col("b") === "1").count() shouldBe 12L // untouched
  }
}
