package graft

import org.apache.spark.sql.functions._

import graft.sources.QuirkCsvBloom

/** Per-file sidecar Bloom filters (`bloomCols`): equality/IN file
  * skipping on high-cardinality UNCLUSTERED columns — the probe class
  * min/max zone stats cannot prune because every file's range overlaps. */
class QuirkCsvBloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom codec: inserted values always answer true; a disjoint " +
      "probe set answers mostly false; absent bloom answers true") {
    val bits = new Array[Long](QuirkCsvBloom.DefaultBits / 64)
    val vals = (0 until 200).map(i => s"key-$i")
    vals.foreach(QuirkCsvBloom.set(bits, _))
    val hex = QuirkCsvBloom.toHex(bits)
    vals.foreach(v => QuirkCsvBloom.mightContain(hex, v) shouldBe true)
    val misses = (1000 until 1200).count(i =>
      !QuirkCsvBloom.mightContain(hex, s"key-$i"))
    misses should be > 190 // FPR under ~5% at this fill
    QuirkCsvBloom.mightContain("", "anything") shouldBe true
  }

  test("raw dir: interleaved appends overlap in min/max; the bloom " +
      "prunes an equality probe to the one holding file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val evens = (0 until 500).map(i => (i * 2).toString).toDF("k")
    val odds = (0 until 500).map(i => (i * 2 + 1).toString).toDF("k")
    Seq(evens, odds).foreach(_.coalesce(1).write.format("graftcsv")
      .mode("append").option("bloomCols", "k").save(dir))
    // both files span ~the same STRING range — min/max alone prunes
    // nothing for a mid-range probe
    def probe(v: String) = spark.read.format("graftcsv").load(dir)
      .filter(col("k") === v)
    probe("444").rdd.getNumPartitions shouldBe 1
    probe("444").collect().map(_.getString(0)).toSeq shouldBe Seq("444")
    probe("445").rdd.getNumPartitions shouldBe 1
    // a value in NEITHER file prunes both (range may admit, bloom denies)
    probe("888888").rdd.getNumPartitions shouldBe 0
    // without blooms the same layout reads both files
    val dir2 = java.nio.file.Files.createTempDirectory("graft_nobloom")
      .toString
    Seq(evens, odds).foreach(_.coalesce(1).write.format("graftcsv")
      .mode("append").save(dir2))
    spark.read.format("graftcsv").load(dir2).filter(col("k") === "444")
      .rdd.getNumPartitions shouldBe 2
  }

  test("catalog TBLPROPERTIES('bloomCols'): persists as a marker, " +
      "applies to every write, survives compaction; validation is loud") {
    val r = java.nio.file.Files.createTempDirectory("graft_bloomcat")
      .toString
    spark.conf.set("spark.sql.catalog.graft_bl",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_bl.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_bl.ns")
    spark.sql("""CREATE TABLE graft_bl.ns.t (k STRING, day STRING)
      PARTITIONED BY (day) TBLPROPERTIES ('bloomCols'='k')""")
    (0 until 3).foreach { m =>
      (0 until 300).filter(_ % 3 == m)
        .map(i => (i.toString, "d1")).toDF("k", "day")
        .writeTo("graft_bl.ns.t").append()
    }
    def splits(v: String) = spark.read.format("graftcsv")
      .option("partitionCol", "day").option("groupByPartition", "false")
      .load(s"$r/ns/t").filter(col("day") === "d1" && col("k") === v)
      .rdd.getNumPartitions
    splits("42") shouldBe 1 // 42 % 3 == 0: only the m=0 epoch file
    // compaction of the value dir keeps bloom skipping on the folds
    graft.operators.Scale.compactCsv(spark, s"$r/ns/t/day=d1",
      numFiles = 3)
    val after = splits("42")
    after should be < 3
    spark.table("graft_bl.ns.t").filter(col("k") === "42").count() shouldBe 1
    an[Exception] should be thrownBy spark.sql(
      """CREATE TABLE graft_bl.ns.bad (k STRING, day STRING)
        PARTITIONED BY (day) TBLPROPERTIES ('bloomCols'='day')""")
    an[Exception] should be thrownBy spark.sql(
      """CREATE TABLE graft_bl.ns.bad2 (k STRING)
        TBLPROPERTIES ('bloomCols'='nope')""")
  }
}
