package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregate pushdown (`SupportsPushDownAggregates`) on the graftcsv
  * DSv2 source: COUNT(*) / COUNT(col) / MIN / MAX, optionally grouped,
  * computed inside the PartitionReader so a split returns its partials
  * instead of its rows. Every case cross-checks against the same
  * aggregate over the plain (row-returning) scan, and asserts from the
  * plan text that the pushdown actually happened (or, for the rejection
  * cases, that it did not and results are still right).
  */
class QuirkCsvAggSpec extends SparkSpec {

  private val csv = "/root/reference/Project1/superstore.csv"

  private def graft(opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graftcsv"))((r, kv) =>
      r.option(kv._1, kv._2)).load(csv)

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("global count(*)/count(col)/min/max push into the reader") {
    val agg = graft().agg(
      count(lit(1)).as("n"),
      count(col("PostalCode")).as("n_postal"),
      min(col("State")).as("lo"),
      max(col("State")).as("hi"))
    planOf(agg) should include("PushedAggregation: [COUNT(*), " +
      "COUNT(PostalCode), MIN(State), MAX(State)]")
    val expected = graft().agg(
      // force the un-pushed path by aggregating a derived column
      count(lit(1)) + lit(0L), count(col("PostalCode")) + lit(0L),
      min(concat(col("State"))), max(concat(col("State"))))
    agg.collect().head.toSeq shouldBe expected.collect().head.toSeq
  }

  test("metadata-only aggregate: unfiltered global agg folds from the " +
      "sidecars, zero data files read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qcsv_meta").toString
    Seq(("a", "1"), ("b", null)).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode("append").save(dir)
    Seq(("c", "3"), ("d", "4")).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode("append").save(dir)
    def agg(opts: (String, String)*) = opts.foldLeft(
      spark.read.format("graftcsv"))((r, kv) => r.option(kv._1, kv._2))
      .load(dir)
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("k")).as("lo"), max(col("k")).as("hi"))
    val meta = agg()
    planOf(meta) should include("MetadataOnlyAggregate: true")
    meta.collect().head.toSeq shouldBe Seq(4L, 3L, "a", "d")
    // the ZERO-READ proof: corrupt a data file's CONTENT keeping its
    // (length, mtime) identity — the metadata answer must not change
    // (nothing read it), while the opted-out scan sees the corruption
    // the victim must be the file actually HOLDING the "a" row — part
    // file names carry random job UUIDs, so name order won't find it
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".csv"))
      .find(f => java.nio.file.Files.readString(f.toPath,
        java.nio.charset.StandardCharsets.ISO_8859_1).contains("a,1")).get
    val content = java.nio.file.Files.readString(victim.toPath,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val mtime = victim.lastModified()
    java.nio.file.Files.writeString(victim.toPath,
      content.replace("a", "z"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    victim.setLastModified(mtime)
    new java.io.File(dir, s".${victim.getName}.crc").delete()
    agg().collect().head.toSeq shouldBe Seq(4L, 3L, "a", "d")
    val scanned = agg("metadataAgg" -> "false")
    planOf(scanned) should not include "MetadataOnlyAggregate"
    scanned.collect().head.getString(2) should not be "a" // read the bytes
    // restore for cleanliness
    java.nio.file.Files.writeString(victim.toPath, content,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    victim.setLastModified(mtime)
    new java.io.File(dir, s".${victim.getName}.crc").delete()
  }

  test("metadata-only aggregate bails to the scan on every unsafe case") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qcsv_meta2").toString
    Seq(("a", "1"), ("b", "2")).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode("append").save(dir)
    def base = spark.read.format("graftcsv").load(dir)
    // a filter blocks the metadata path (per-file stats can't apply it)
    val filtered = base.filter(col("v") === "2").agg(count(lit(1)).as("n"))
    planOf(filtered) should not include "MetadataOnlyAggregate"
    filtered.collect().head.getLong(0) shouldBe 1L
    // a stale entry (out-of-band append changes the length) blocks it
    val victim = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    java.nio.file.Files.writeString(victim.toPath, "e,5\r\n",
      java.nio.charset.StandardCharsets.ISO_8859_1,
      java.nio.file.StandardOpenOption.APPEND)
    new java.io.File(dir, s".${victim.getName}.crc").delete()
    val stale = base.agg(count(lit(1)).as("n"), max(col("k")).as("hi"))
    planOf(stale) should not include "MetadataOnlyAggregate"
    stale.collect().head.toSeq shouldBe Seq(3L, "e")
    // a hand-dropped file (no sidecar entry at all) blocks it too
    val dir2 = java.nio.file.Files.createTempDirectory("qcsv_meta3").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir2, "hand.csv"), "k,v\r\na,1\r\n",
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val hand = spark.read.format("graftcsv").load(dir2)
      .agg(count(lit(1)).as("n"))
    planOf(hand) should not include "MetadataOnlyAggregate"
    hand.collect().head.getLong(0) shouldBe 1L
    // a min/max candidate at the stats length cap may be truncated —
    // never served (a truncated bound is not a real data value)
    val dir3 = java.nio.file.Files.createTempDirectory("qcsv_meta4").toString
    Seq("x" * 300, "b").toDF("k").coalesce(1)
      .write.format("graftcsv").mode("append").save(dir3)
    val long = spark.read.format("graftcsv").load(dir3)
      .agg(max(col("k")).as("hi"), count(lit(1)).as("n"))
    planOf(long) should not include "MetadataOnlyAggregate"
    long.collect().head.getString(0) shouldBe "x" * 300
    // count-only on the same data is still metadata-servable
    val cnt = spark.read.format("graftcsv").load(dir3)
      .agg(count(lit(1)).as("n"))
    planOf(cnt) should include("MetadataOnlyAggregate: true")
    cnt.collect().head.getLong(0) shouldBe 2L
  }

  test("metadata-only aggregate spans a partitioned table's per-dir sidecars") {
    val root = java.nio.file.Files.createTempDirectory("qcsv_meta5").toString
    spark.conf.set("spark.sql.catalog.graft_ma",
      classOf[_root_.graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ma.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ma.ns")
    spark.sql("""CREATE TABLE graft_ma.ns.t (k STRING, p STRING)
      PARTITIONED BY (p)""")
    spark.sql("""INSERT INTO graft_ma.ns.t VALUES
      ('a','x'), ('b','x'), ('c','y')""")
    val agg = spark.table("graft_ma.ns.t")
      .agg(count(lit(1)).as("n"), min(col("k")).as("lo"),
        max(col("p")).as("hi"))
    planOf(agg) should include("MetadataOnlyAggregate: true")
    agg.collect().head.toSeq shouldBe Seq(3L, "a", "y")
    // a predicate purely on the PARTITION column is fully applied by
    // directory pruning, so the one-day count is still sidecar-served
    val oneDay = spark.table("graft_ma.ns.t").filter(col("p") === "x")
      .agg(count(lit(1)).as("n"), max(col("k")).as("hi"))
    planOf(oneDay) should include("MetadataOnlyAggregate: true")
    oneDay.collect().head.toSeq shouldBe Seq(2L, "b")
    // a predicate on a DATA column discriminates within files: scan
    val byK = spark.table("graft_ma.ns.t").filter(col("k") === "a")
      .agg(count(lit(1)).as("n"))
    planOf(byK) should not include "MetadataOnlyAggregate"
    byK.collect().head.getLong(0) shouldBe 1L
    // a partition predicate matching NOTHING still answers 0 (the
    // zero-partition synthetic partial), never NULL
    spark.table("graft_ma.ns.t").filter(col("p") === "zz")
      .agg(count(lit(1))).collect().head.getLong(0) shouldBe 0L
  }

  test("metadata-only aggregate engages on an UNPARTITIONED catalog " +
      "table (the schema seed is exempt from the sidecar gate)") {
    // the root schema seed (part-seed-*.csv) is header-only by contract
    // and never receives a sidecar entry — requiring one would silently
    // disable metadata aggregates and exact planner row counts for every
    // unpartitioned catalog table
    val root = java.nio.file.Files.createTempDirectory("qcsv_meta6").toString
    spark.conf.set("spark.sql.catalog.graft_mu",
      classOf[_root_.graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mu.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_mu.ns")
    spark.sql("CREATE TABLE graft_mu.ns.flat (k STRING, v STRING)")
    spark.sql("INSERT INTO graft_mu.ns.flat VALUES ('a','1'), ('b','2')")
    spark.sql("INSERT INTO graft_mu.ns.flat VALUES ('c','3')")
    new java.io.File(s"$root/ns/flat").listFiles()
      .exists(_.getName.startsWith("part-seed-")) shouldBe true
    val agg = spark.table("graft_mu.ns.flat")
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min(col("k")).as("lo"), max(col("k")).as("hi"))
    planOf(agg) should include("MetadataOnlyAggregate: true")
    agg.collect().head.toSeq shouldBe Seq(3L, 3L, "a", "c")
    // the exact sidecar row count also reaches the planner's statistics
    val stats = spark.table("graft_mu.ns.flat").queryExecution
      .optimizedPlan.stats
    stats.rowCount shouldBe Some(BigInt(3))
  }

  test("grouped aggregate pushes and merges across byte-range splits") {
    def grouped(df: DataFrame) = df.groupBy(col("Region"))
      .agg(count(lit(1)).as("n"), min(col("City")).as("lo"),
        max(col("City")).as("hi"))
    // 64 KiB splits: ~35 partial rows per group merge to one final row
    val pushed = grouped(graft("maxSplitBytes" -> "65536"))
    planOf(pushed) should include(
      "PushedAggregation: [COUNT(*), MIN(City), MAX(City) GROUP BY Region]")
    val plain = grouped(graft().withColumn("Region",
      concat(col("Region")))) // derived group key defeats the pushdown
    rowsAsStrings(pushed) shouldBe rowsAsStrings(plain)
  }

  test("pushed filters compose: rows are filtered before they are counted") {
    val agg = graft().filter(col("Region") === "West")
      .agg(count(lit(1)).as("n"))
    val plan = planOf(agg)
    plan should include("PushedAggregation: [COUNT(*)]")
    plan should include("EqualTo(Region,West)")
    agg.collect().head.getLong(0) shouldBe
      graft().filter(col("Region") === "West").count()
  }

  test("count(*) on an empty directory merges to 0, not NULL") {
    val dir = java.nio.file.Files.createTempDirectory("agg_empty").toString
    // one empty file so the scan plans zero splits
    val df = spark.read.format("graftcsv").schema("a string").load(dir)
    df.agg(count(lit(1))).collect().head.getLong(0) shouldBe 0L
  }

  test("single split claims COMPLETE pushdown: no Aggregate node at all") {
    // the whole file is one split -> the reader's result IS the answer
    val agg = graft().groupBy(col("Region")).agg(count(lit(1)).as("n"))
    val plan = planOf(agg)
    plan should include("PushedAggregation")
    plan should not include "Aggregate"
    rowsAsStrings(agg) shouldBe rowsAsStrings(
      graft().withColumn("Region", concat(col("Region")))
        .groupBy(col("Region")).agg(count(lit(1)).as("n")))
    // multi-split stays partial: a final merge aggregate remains
    val partial = graft("maxSplitBytes" -> "65536")
      .groupBy(col("Region")).agg(count(lit(1)).as("n"))
    planOf(partial) should include("Aggregate")
  }

  test("distinct and avg aggregates are NOT pushed; results unchanged") {
    val d = graft().agg(countDistinct(col("Region")).as("n"))
    planOf(d) should not include "PushedAggregation"
    d.collect().head.getLong(0) shouldBe 4L
    val a = graft().agg(avg(col("Quantity")).as("m"))
    planOf(a) should not include "PushedAggregation"
  }

  test("group-cardinality guard fails fast instead of accumulating") {
    val e = intercept[org.apache.spark.SparkException] {
      graft("maxAggGroupsPerSplit" -> "3")
        .groupBy(col("City")).agg(count(lit(1))).collect()
    }
    e.getMessage should include("maxAggGroupsPerSplit")
  }
}
