package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Zone-map file skipping on the graftcsv source: the sink's commit
  * writes a `_graft_zonemap.tsv` sidecar (per-file min/max/null stats,
  * gathered row-by-row by the writers), and the scan prunes whole files
  * against pushed + runtime filters before planning splits. Stats are
  * keyed by (name, byte length) so a file rewritten outside the
  * committing writer falls back to "read it" — stale stats can cost
  * time, never correctness. */
class QuirkCsvZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val csv = "/root/reference/Project1/superstore.csv"

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"zm_$tag").toString

  private def readBack(dir: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(spark.read.format("graftcsv"))((r, kv) =>
      r.option(kv._1, kv._2)).load(dir)

  private val regions = Seq("Central", "East", "South", "West")

  /** One single-region file per append — a deterministic clustered
    * layout (range writes can leave empty partitions whose files are
    * then legitimately pruned by the implied IsNotNull). */
  private def writeClustered(dir: String): Unit =
    regions.foreach { r =>
      spark.read.format("graftcsv").load(csv)
        .filter(col("Region") === r).coalesce(1)
        .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    }

  test("region-clustered write + equality filter skips whole files") {
    val dir = freshDir("range")
    writeClustered(dir)
    new java.io.File(dir, "_graft_zonemap.tsv").exists() shouldBe true
    val west = readBack(dir).filter(col("Region") === "West")
    // 4 range files; only the one whose [min,max] covers "West" is read
    west.rdd.getNumPartitions shouldBe 1
    west.count() shouldBe spark.read.format("graftcsv").load(csv)
      .filter(col("Region") === "West").count()
    // un-prunable predicate shapes read everything
    readBack(dir).filter(col("Region").contains("est"))
      .rdd.getNumPartitions shouldBe 4
    // pruning can be switched off
    readBack(dir, "zoneMapPruning" -> "false")
      .filter(col("Region") === "West").rdd.getNumPartitions shouldBe 4
  }

  test("range predicates push down and zone-prune to the covering files") {
    val dir = freshDir("rangecmp")
    writeClustered(dir) // one file per region, alphabetical ranges
    // plain-string ordering: "Central" < "East" < "South" < "West"
    val ge = readBack(dir).filter(col("Region") >= "South")
    ge.rdd.getNumPartitions shouldBe 2 // South + West files
    ge.select(col("Region")).distinct().collect()
      .map(_.getString(0)).toSet shouldBe Set("South", "West")
    val lt = readBack(dir).filter(col("Region") < "East")
    lt.rdd.getNumPartitions shouldBe 1 // Central only
    lt.select(col("Region")).distinct().collect()
      .map(_.getString(0)).toSet shouldBe Set("Central")
    // a BETWEEN composes both bounds: exactly the covering file
    val between = readBack(dir)
      .filter(col("Region") >= "East" && col("Region") <= "Egg")
    between.rdd.getNumPartitions shouldBe 1
    between.count() shouldBe spark.read.format("graftcsv").load(csv)
      .filter(col("Region") === "East").count()
    // row-level evaluation agrees with Spark's own (no rows lost/added)
    readBack(dir).filter(col("Region") > "Central").count() shouldBe
      spark.read.format("graftcsv").load(csv)
        .filter(col("Region") =!= "Central").count()
  }

  test("truncated (256-char-capped) bounds stay conservative under " +
    "range predicates: looser pruning, never a lost row") {
    val dir = freshDir("trunc")
    // values longer than the stats cap: 300-char strings with the
    // DISCRIMINATING suffix past the cap — bounds truncate, so pruning
    // must answer "might match" rather than dropping the file
    val pad = "x" * 299
    Seq(s"${pad}a", s"${pad}b").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    Seq(s"${pad}y", s"${pad}z").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val probe = readBack(dir).filter(col("k") >= s"${pad}y")
    // both files' truncated [min,max] admit the probe (prefixes equal up
    // to the cap) — conservative: no pruning, but ALL matching rows back
    probe.collect().map(_.getString(0)).toSet shouldBe
      Set(s"${pad}y", s"${pad}z")
  }

  test("length drift disables the stale entry, not the others") {
    val dir = freshDir("stale")
    writeClustered(dir)
    // tamper with one non-West file: its stats must stop being trusted
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".csv"))
      .find { f =>
        val df = readBack(f.getPath)
        df.filter(col("Region") === "West").isEmpty
      }.get
    val out = new java.io.FileOutputStream(victim, true)
    out.write('\n'); out.close()
    // drop Hadoop's local-FS checksum sidecar — out-of-band edits would
    // otherwise fail the read for the wrong reason
    new java.io.File(victim.getParentFile, s".${victim.getName}.crc")
      .delete()
    val west = readBack(dir).filter(col("Region") === "West")
    west.rdd.getNumPartitions shouldBe 2 // the West file + the tampered one
    west.count() shouldBe spark.read.format("graftcsv").load(csv)
      .filter(col("Region") === "West").count()
  }

  test("null-count stats prune IsNotNull / IsNull; appends merge") {
    val dir = freshDir("nulls")
    val allNull = Seq(("k1", null: String), ("k2", null: String))
      .toDF("k", "v")
    val noNull = Seq(("k3", "x"), ("k4", "y")).toDF("k", "v")
    allNull.coalesce(1).write.format("graftcsv")
      .mode(SaveMode.Append).save(dir)
    noNull.coalesce(1).write.format("graftcsv")
      .mode(SaveMode.Append).save(dir) // second commit merges the sidecar
    val back = readBack(dir)
    back.count() shouldBe 4
    val notNull = back.filter(col("v").isNotNull)
    notNull.rdd.getNumPartitions shouldBe 1
    notNull.count() shouldBe 2
    val isNull = back.filter(col("v").isNull)
    isNull.rdd.getNumPartitions shouldBe 1
    isNull.count() shouldBe 2
  }

  test("multi-KB values truncate to conservative bounds in the sidecar") {
    val dir = freshDir("wide")
    val big = "z" * 5000 // a blob-sized field
    Seq(("a", big), ("b", "small")).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    // the sidecar stays small: bounds are capped, not stored verbatim
    val sidecar = java.nio.file.Files.readString(
      new java.io.File(dir, "_graft_zonemap.tsv").toPath)
    sidecar.length should be < 2000
    // and bounds stay CONSERVATIVE: the equality probe for the big
    // value must still read the file (truncated max was bumped past it)
    val hit = readBack(dir).filter(col("v") === big)
    hit.rdd.getNumPartitions shouldBe 1
    hit.count() shouldBe 1
    // something ABOVE the bumped bound ('~' > 'z'+1) is pruned
    readBack(dir).filter(col("v") === ("~" + big))
      .rdd.getNumPartitions shouldBe 0
  }

  test("0xFF at the truncation edge keeps the bound conservative") {
    // regression: bumping 0xFF past latin-1 used to mangle the encoded
    // bound BELOW real values, wrongly pruning the file
    val dir = freshDir("ff")
    val v = "a" * 255 + "ÿ" + "zzzz"
    Seq(("r1", v)).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val hit = readBack(dir).filter(col("v") === v)
    hit.rdd.getNumPartitions shouldBe 1
    hit.count() shouldBe 1
  }

  test("single-column NULL rows survive the round-trip") {
    // regression: a (NULL) row under a 1-column schema serializes to a
    // blank line, which the dialect's blank-row skip used to eat
    val dir = freshDir("null1")
    val df = Seq(Some("x"), None, Some("y")).toDF("v")
    df.coalesce(1).write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val back = readBack(dir)
    back.count() shouldBe 3
    back.filter(col("v").isNull).count() shouldBe 1
    // and the sidecar's counts now agree with what the scan returns
    back.filter(col("v").isNull).rdd.getNumPartitions shouldBe 1
  }

  test("global COUNT keeps one split when pruning empties the scan") {
    val dir = freshDir("empty")
    Seq(("a", "1"), ("b", "2")).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    // single split + single file -> COMPLETE pushdown; the filter rules
    // out every file, but count(*) must still return 0, not no-rows
    val df = readBack(dir).filter(col("k") === "zzz")
      .agg(count(lit(1)).as("n"))
    df.collect().map(_.getLong(0)).toSeq shouldBe Seq(0L)
  }

  test("a pre-v3 sidecar is distrusted wholesale (scan, never serve)") {
    // v2 sidecars can hold an UNPADDED truncated max (a bumped prefix
    // shorter than the stats cap) — indistinguishable from a real value,
    // so serving it as a metadata-only MAX would fabricate data. The
    // loader therefore rejects anything but v3: pruning and metadata
    // aggregates degrade to the scan until a commit rewrites the sidecar.
    val dir = freshDir("v2")
    Seq(("a", "1"), ("b", "2")).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val sidecar = new java.io.File(dir, "_graft_zonemap.tsv")
    val content = java.nio.file.Files.readString(sidecar.toPath,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    content should startWith("graft-zonemap-v3\n")
    java.nio.file.Files.writeString(sidecar.toPath,
      content.replace("graft-zonemap-v3", "graft-zonemap-v2"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // no pruning (both the hit and the miss read the file) ...
    readBack(dir).filter(col("k") === "zzz")
      .rdd.getNumPartitions shouldBe 1
    // ... and no metadata-only aggregate
    val agg = readBack(dir).agg(max(col("k")).as("hi"))
    agg.queryExecution.executedPlan.toString should
      not include "MetadataOnlyAggregate"
    agg.collect().head.getString(0) shouldBe "b"
    // the next commit rewrites v3 and restores the fast paths
    Seq(("c", "3")).toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    java.nio.file.Files.readString(sidecar.toPath,
      java.nio.charset.StandardCharsets.ISO_8859_1) should
      startWith("graft-zonemap-v3\n")
  }
}
