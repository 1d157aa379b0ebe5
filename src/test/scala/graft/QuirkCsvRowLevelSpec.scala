package graft

import org.apache.spark.sql.functions._

/** SQL row-level operations on graftcsv tables (SupportsRowLevelOperations,
  * group-based copy-on-write): the reference's MERGE statements
  * (SQLproject1.sql:390-416,485-513) runnable literally against
  * `graft_cat`, plus UPDATE / DELETE. The correctness crux is carry-over:
  * rows the statement does not touch must survive the whole-table
  * replacement. */
class QuirkCsvRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_rlo").toString
    spark.conf.set("spark.sql.catalog.graft_rloc",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rloc.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_rloc.rlo")
    r
  }

  private var n = 0
  private def freshTable(rows: Seq[(String, String)]): String = {
    root
    n += 1
    val t = s"graft_rloc.rlo.t$n"
    spark.sql(s"CREATE TABLE $t (k STRING, v STRING)")
    if (rows.nonEmpty)
      spark.sql(s"INSERT INTO $t VALUES " +
        rows.map { case (k, v) => s"('$k','$v')" }.mkString(", "))
    t
  }

  private def content(t: String): Set[(String, String)] =
    spark.table(t).as[(String, String)].collect().toSet

  test("MERGE INTO ... WHEN NOT MATCHED THEN INSERT (the J7 shape)") {
    val t = freshTable(Seq("a" -> "1", "b" -> "2"))
    Seq("b" -> "x", "c" -> "3").toDF("k", "v").createOrReplaceTempView("src1")
    spark.sql(s"""MERGE INTO $t t USING src1 s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""")
    // matched 'b' untouched (insert-only), unmatched target 'a' carried
    content(t) shouldBe Set("a" -> "1", "b" -> "2", "c" -> "3")
  }

  test("MERGE with matched UPDATE and DELETE clauses") {
    val t = freshTable(Seq("a" -> "1", "b" -> "2", "c" -> "3"))
    Seq(("a", "10", "upd"), ("c", "", "del"), ("d", "4", "ins"))
      .toDF("k", "v", "op").createOrReplaceTempView("src2")
    spark.sql(s"""MERGE INTO $t t USING src2 s ON t.k = s.k
      WHEN MATCHED AND s.op = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    content(t) shouldBe Set("a" -> "10", "b" -> "2", "d" -> "4")
  }

  test("UPDATE and DELETE statements") {
    val t = freshTable(Seq("a" -> "1", "b" -> "2", "c" -> "2"))
    spark.sql(s"UPDATE $t SET v = 'z' WHERE k = 'a'")
    content(t) shouldBe Set("a" -> "z", "b" -> "2", "c" -> "2")
    spark.sql(s"DELETE FROM $t WHERE v = '2'")
    content(t) shouldBe Set("a" -> "z")
    // DELETE with no matches leaves everything (carry-over only)
    spark.sql(s"DELETE FROM $t WHERE k = 'nope'")
    content(t) shouldBe Set("a" -> "z")
  }

  test("NULL keys never match ON (SQL join semantics), rows still carry") {
    val t = freshTable(Seq.empty)
    spark.sql(s"INSERT INTO t${n} VALUES ('a','1'), (NULL,'keepme')"
      .replace(s"t$n", s"graft_rloc.rlo.t$n"))
    Seq("a" -> "9").toDF("k", "v").createOrReplaceTempView("src3")
    spark.sql(s"""MERGE INTO graft_rloc.rlo.t$n t USING src3 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    spark.table(s"graft_rloc.rlo.t$n").collect()
      .map(r => (Option(r.getString(0)), r.getString(1))).toSet shouldBe
      Set((Some("a"), "9"), (None, "keepme"))
  }

  test("the rewritten scan does not offer runtime filtering (no row loss)") {
    // a big-ish table where a dynamic-pruning filter WOULD have fired if
    // the replacement scan offered it: all rows must survive an update
    // that touches only one key
    val t = freshTable((1 to 500).map(i => (s"k$i", i.toString)))
    Seq("k1" -> "updated").toDF("k", "v").createOrReplaceTempView("src4")
    spark.sql(s"""MERGE INTO $t t USING src4 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    spark.table(t).count() shouldBe 500
    spark.table(t).filter($"k" === "k1").select("v")
      .as[String].head() shouldBe "updated"
  }

  test("_file metadata column: per-row provenance on plain reads") {
    val t = freshTable(Seq("a" -> "1", "b" -> "2"))
    val rows = spark.sql(s"SELECT k, _file FROM $t").collect()
    rows.length shouldBe 2
    // every row names a real CSV file inside the table directory
    rows.foreach { r =>
      r.getString(1) should include(s"rlo/t$n")
      r.getString(1) should endWith(".csv")
    }
    // metadata columns never leak into SELECT *
    spark.table(t).columns.toSeq shouldBe Seq("k", "v")
  }

  test("zone-map sidecar is rebuilt after a row-level op; pruning works") {
    val t = freshTable(Seq("aaa" -> "1", "mmm" -> "2", "zzz" -> "3"))
    spark.sql(s"DELETE FROM $t WHERE k = 'mmm'")
    val dir = new java.io.File(new java.io.File(root, "rlo"), s"t$n")
    new java.io.File(dir, "_graft_zonemap.tsv").exists() shouldBe true
    content(t) shouldBe Set("aaa" -> "1", "zzz" -> "3")
  }
}
