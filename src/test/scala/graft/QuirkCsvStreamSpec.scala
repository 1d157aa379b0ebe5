package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** graftcsv as a DSv2 micro-batch streaming source: file-drop intake
  * through the same quirk-repairing, split-planning reader as batch. */
class QuirkCsvStreamSpec extends SparkSpec {

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("", "\r\n", "\r\n").getBytes(StandardCharsets.ISO_8859_1))

  test("each dropped file arrives exactly once, quirks repaired, splits planned") {
    val dir = Files.createTempDirectory("qcsv_stream").toString
    // quirky: trailing ';' on every line, one fully-wrapped row
    writeFile(dir, "part-0001.csv", Seq(
      "id,name,seg;",
      "1,alpha,A;",
      "\"2,\"\"beta, inc\"\",B\";")) // wrapped row with embedded comma
    val sdf = spark.readStream.format("graftcsv")
      .option("maxSplitBytes", "16") // force multi-split planning per file
      .load(dir)
    val q = sdf.writeStream.format("memory").queryName("qcsv_s1").start()
    try {
      q.processAllAvailable()
      val t1 = spark.table("qcsv_s1").collect()
      t1.length shouldBe 2
      t1.map(_.getString(1)).toSet shouldBe Set("alpha", "beta, inc")

      writeFile(dir, "part-0002.csv", Seq(
        "id,name,seg;",
        "3,gamma,A;",
        "4,delta,C;",
        "5,epsilon,A;"))
      q.processAllAvailable()
      val t2 = spark.table("qcsv_s1")
      t2.count() shouldBe 5
      t2.select("id").distinct().count() shouldBe 5 // exactly once
    } finally q.stop()
  }

  test("a PARTITIONED catalog table streams: subdir files arrive, the " +
      "schema seed never surfaces, late partitions are picked up") {
    val root = Files.createTempDirectory("qcsv_pstream").toString
    spark.conf.set("spark.sql.catalog.graft_ps",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ps.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ps.ns")
    spark.sql("""CREATE TABLE graft_ps.ns.ev (id STRING, day STRING)
      PARTITIONED BY (day)""")
    spark.sql("INSERT INTO graft_ps.ns.ev VALUES ('1','d1'), ('2','d2')")
    val q = spark.readStream.table("graft_ps.ns.ev")
      .writeStream.format("memory").queryName("qcsv_ps").start()
    try {
      q.processAllAvailable()
      val t1 = spark.table("qcsv_ps").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // stream == batch: partition-column values ride in the rows and
      // the header-only schema seed contributed nothing
      t1 shouldBe Set(("1", "d1"), ("2", "d2"))
      // a new file in an EXISTING partition and a whole NEW partition
      // both arrive exactly once
      spark.sql("INSERT INTO graft_ps.ns.ev VALUES ('3','d1'), ('4','d9')")
      q.processAllAvailable()
      val t2 = spark.table("qcsv_ps").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      t2 shouldBe Set(("1", "d1"), ("2", "d2"), ("3", "d1"), ("4", "d9"))
      spark.table("qcsv_ps").count() shouldBe 4L // exactly once
    } finally q.stop()
  }

  test("pruning and filter pushdown ride the micro-batch path") {
    val dir = Files.createTempDirectory("qcsv_stream2").toString
    writeFile(dir, "part-0001.csv", Seq(
      "id,name,seg;", "1,a,A;", "2,b,B;", "3,c,A;"))
    val sdf = spark.readStream.format("graftcsv").load(dir)
      .filter(col("seg") === "A").select("id")
    val q = sdf.writeStream.format("memory").queryName("qcsv_s2").start()
    try {
      q.processAllAvailable()
      spark.table("qcsv_s2").collect().map(_.getString(0)).toSet shouldBe
        Set("1", "3")
      writeFile(dir, "part-0002.csv", Seq("id,name,seg;", "4,d,A;"))
      q.processAllAvailable()
      spark.table("qcsv_s2").count() shouldBe 3
    } finally q.stop()
  }
}
