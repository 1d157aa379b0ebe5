package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The graftcsv columnar read path (`columnar=true`): batched
  * ColumnarBatch output through reused on-heap vectors, set-equal to the
  * row path on the real quirk file, composing with pushdown/pruning, and
  * falling back to rows where the batched shape doesn't apply. */
class QuirkCsvColumnarSpec extends SparkSpec {

  private val csv = "/root/reference/Project1/superstore.csv"
  private def available = new java.io.File(csv).exists()

  private def read(path: String, opts: (String, String)*): DataFrame =
    opts.foldLeft(
      spark.read.format("graftcsv").option("columnar", "true"))(
      (r, kv) => r.option(kv._1, kv._2)).load(path)

  test("columnar read equals the row read on the real quirk file") {
    assume(available)
    val colDf = read(csv)
    val rowDf = spark.read.format("graftcsv").load(csv)
    colDf.count() shouldBe 9994
    rowsAsStrings(colDf) shouldBe rowsAsStrings(rowDf)
    // the plan actually takes the batched path
    colDf.queryExecution.executedPlan.toString should include("ColumnarToRow")
  }

  test("small batch size exercises multi-batch splits") {
    assume(available)
    read(csv, "columnarBatchSize" -> "100").count() shouldBe 9994
  }

  test("filters still push and evaluate inside the batched scan") {
    assume(available)
    val west = read(csv).filter(col("Region") === "West")
    west.queryExecution.executedPlan.toString should
      include("EqualTo(Region,West)")
    west.count() shouldBe spark.read.format("graftcsv").load(csv)
      .filter(col("Region") === "West").count()
  }

  test("NULLs and quoted fields survive the vector round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("col_rt").toString
    Seq(("a", null: String), ("b", ""), ("c", "x,\"y\";"), ("déjà", "ÿ"))
      .toDF("k", "v").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val back = read(dir)
    back.filter(col("v").isNull).count() shouldBe 1
    back.filter(col("v") === "").count() shouldBe 1
    back.filter(col("v") === "x,\"y\";").count() shouldBe 1
    back.filter(col("k") === "déjà").select("v")
      .collect().head.getString(0) shouldBe "ÿ"
  }

  test("_file metadata column works batched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("col_file").toString
    Seq("r1", "r2").toDF("k").coalesce(1)
      .write.format("graftcsv").mode(SaveMode.Append).save(dir)
    val files = read(dir).select(col("_file")).distinct().collect()
    files.length shouldBe 1
    files.head.getString(0) should endWith(".csv")
  }

  test("pushed limit and top-N fall back to the row path") {
    assume(available)
    val lim = read(csv).limit(5)
    lim.collect().length shouldBe 5
    val top = read(csv).orderBy(col("OrderID")).limit(3)
    top.collect().length shouldBe 3
  }
}
