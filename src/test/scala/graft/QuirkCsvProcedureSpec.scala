package graft

import org.apache.spark.sql.functions._

/** `CALL graft_cat.system.<p>(…)` — SQL stored procedures for table
  * lifecycle maintenance over the ProcedureCatalog tier. */
class QuirkCsvProcedureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_proc").toString
    spark.conf.set("spark.sql.catalog.graft_proc",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_proc.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.ns")
    r
  }

  test("history / current_version / vacuum through pure SQL") {
    root
    spark.sql("CREATE TABLE graft_proc.ns.t (k STRING)")
    Seq("1").toDF("k").writeTo("graft_proc.ns.t").append()  // v1
    spark.sql("DELETE FROM graft_proc.ns.t WHERE k = '1'")  // v2
    Seq("2").toDF("k").writeTo("graft_proc.ns.t").append()  // v3
    val hist = spark.sql("CALL graft_proc.system.history('ns.t')")
    hist.columns.toSeq shouldBe Seq("version", "action",
      "committed_at_ms", "n_added", "n_retired")
    hist.orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "append"), (2L, "overwrite"), (3L, "append"))
    spark.sql("CALL graft_proc.system.current_version('ns.t')")
      .collect()(0).getLong(0) shouldBe 3L
    spark.sql("CALL graft_proc.system.vacuum('ns.t', 1)")
      .collect()(0).getLong(0) shouldBe 2L
    // vacuumed snapshot now fails loudly; recent one still serves
    an[Exception] should be thrownBy
      spark.sql("SELECT * FROM graft_proc.ns.t VERSION AS OF 1").collect()
    spark.sql("SELECT k FROM graft_proc.ns.t VERSION AS OF 3")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("2")
  }

  test("compact folds a flat table and every value dir of a " +
      "partitioned one; bad procedure and bad table are loud") {
    root
    spark.sql("CREATE TABLE graft_proc.ns.c (k STRING)")
    (0 until 3).foreach(i =>
      Seq(s"$i").toDF("k").writeTo("graft_proc.ns.c").append())
    val res = spark.sql("CALL graft_proc.system.compact('ns.c', 1)")
      .collect()(0)
    (res.getLong(0), res.getLong(1)) shouldBe ((4L, 1L)) // incl. the seed
    spark.table("graft_proc.ns.c").orderBy("k").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("0", "1", "2")
    spark.sql("""CREATE TABLE graft_proc.ns.p (k STRING, day STRING)
      PARTITIONED BY (day)""")
    (0 until 2).foreach(i =>
      Seq((s"$i", "d1"), (s"$i", "d2")).toDF("k", "day")
        .writeTo("graft_proc.ns.p").append())
    val pres = spark.sql("CALL graft_proc.system.compact('ns.p', 1)")
      .collect()(0)
    (pres.getLong(0), pres.getLong(1)) shouldBe ((4L, 2L))
    spark.table("graft_proc.ns.p").count() shouldBe 4L
    an[Exception] should be thrownBy
      spark.sql("CALL graft_proc.system.nope('ns.c')").collect()
    an[Exception] should be thrownBy
      spark.sql("CALL graft_proc.system.history('ns.missing')").collect()
  }

  test("sweep removes aged crash residue (pre-replay asides, staged " +
      "dirs) and leaves live data plus fresh residue alone") {
    root
    spark.sql("CREATE TABLE graft_proc.ns.sw (k STRING)")
    Seq("1").toDF("k").writeTo("graft_proc.ns.sw").append()
    val dir = new java.io.File(s"$root/ns/sw")
    // plant residue: an orphaned pre-replay aside in the table dir and
    // an orphaned staging dir beside it
    val aside = new java.io.File(dir, ".part-x-00000.csv.pre-replay")
    java.nio.file.Files.write(aside.toPath, "k\nold\n".getBytes)
    val staged = new java.io.File(s"$root/ns/.staged-sw-deadbeef")
    staged.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(staged, "part-seed-00000.csv").toPath, "k\n".getBytes)
    // ...and a crashed holder's index-maintenance lock marker
    val lock = new java.io.File(s"$root/ns/.graft-maint-idx.lock")
    java.nio.file.Files.write(lock.toPath, "dead 0".getBytes)
    // a HIGH age gate keeps everything (residue may belong to a live
    // stream/CTAS/maintenance)
    val kept = spark.sql("CALL graft_proc.system.sweep('ns.sw', 60)")
      .collect()(0)
    kept.getLong(0) shouldBe 0L
    aside.exists() shouldBe true
    staged.exists() shouldBe true
    lock.exists() shouldBe true
    // age 0 sweeps the aside and the staged dir, but NOT the fresh lock
    // marker: lock markers' age gate is floored at StaleLockMs — a live
    // maintenance heartbeats its marker, so only one older than the
    // lease can be crash residue, whatever the caller's gate says
    val swept = spark.sql("CALL graft_proc.system.sweep('ns.sw', 0)")
      .collect()(0)
    swept.getLong(0) shouldBe 2L
    swept.getLong(1) should be > 0L
    aside.exists() shouldBe false
    staged.exists() shouldBe false
    lock.exists() shouldBe true
    // an actually-stale marker (mtime past the lease) goes, floor or not
    lock.setLastModified(System.currentTimeMillis() -
      graft.operators.IndexMaintenanceLock.StaleLockMs - 60000)
    spark.sql("CALL graft_proc.system.sweep('ns.sw', 0)")
      .collect()(0).getLong(0) shouldBe 1L
    lock.exists() shouldBe false
    spark.table("graft_proc.ns.sw").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("1")
  }

  test("compact on a 120-partition table folds value dirs from the " +
      "parallel driver pool with identical content") {
    root
    spark.sql("""CREATE TABLE graft_proc.ns.wide (k STRING, b STRING)
      PARTITIONED BY (b)""")
    // 120 value dirs x 3 epoch files each
    val src = spark.range(0, 1200).select(
      col("id").cast("string").as("k"),
      (col("id") % 120).cast("string").as("b"),
      ((col("id") / 120).cast("long") % 3).as("epoch"))
    (0 until 3).foreach { e =>
      src.filter(col("epoch") === e).drop("epoch")
        .writeTo("graft_proc.ns.wide").append()
    }
    val before = spark.table("graft_proc.ns.wide")
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    val valueDirs = new java.io.File(s"$root/ns/wide").listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
    valueDirs.length shouldBe 120
    // every dir holds >1 data file pre-compaction (3 epochs, but an
    // epoch write may route a dir's rows into one task file)
    val preFiles = valueDirs.map(d => d.listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))).sum
    val res = spark.sql("CALL graft_proc.system.compact('ns.wide', 1)")
      .collect()(0)
    res.getLong(0) shouldBe preFiles.toLong
    res.getLong(1) shouldBe 120L // one folded file per value dir
    val after = spark.table("graft_proc.ns.wide")
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    after should contain theSameElementsInOrderAs before
  }
}
