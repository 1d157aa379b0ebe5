package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Streaming DSIR intake gate == batch scoring, driven end-to-end
  * through the graftcsv micro-batch source: docs arrive as CSV file
  * drops, each batch is scored against PRE-FIT target/raw models
  * (Dsir.scoreAgainst — a doc's score cannot depend on its batch), and
  * the accepted set matches a one-shot batch run over the same files. */
class DsirStreamSpec extends SparkSpec {
  import spark.implicits._

  private val buckets = 128

  private def targetDf = Seq(
    (100L, "alpha beta gamma alpha beta"),
    (101L, "beta gamma alpha beta gamma")).toDF("doc_id", "text")

  private def writeDocs(dir: String, name: String,
                        rows: Seq[(String, String)]): Unit =
    Files.write(Paths.get(dir, name),
      ("id,text\n" + rows.map { case (i, t) => s"$i,$t" }.mkString("", "\n", "\n"))
        .getBytes(StandardCharsets.ISO_8859_1))

  test("foreachBatch gate over the graftcsv stream equals batch scoring") {
    val dir = Files.createTempDirectory("dsir_stream").toString
    writeDocs(dir, "b-0001.csv", Seq(
      "1" -> "alpha beta gamma beta", // target-like
      "2" -> "zig zag zog zug"))      // noise
    // models pre-fit on the target corpus and a frozen reference pool
    val pool = Seq(
      (900L, "alpha beta zag"), (901L, "zog zug gamma"),
      (902L, "quux corge beta")).toDF("doc_id", "text")
    val tgtModel = Dsir.fitModel(targetDf, "doc_id", "text", buckets).cache()
    val rawModel = Dsir.fitModel(pool, "doc_id", "text", buckets).cache()

    def score(df: DataFrame): DataFrame =
      Dsir.scoreAgainst(df.select(col("id").cast("long").as("doc_id"),
          col("text")), "doc_id", "text", tgtModel, rawModel, buckets)

    val accepted = scala.collection.mutable.Map.empty[Long, Long]
    val q = spark.readStream.format("graftcsv").load(dir)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        score(batch).collect().foreach(r =>
          accepted(r.getLong(0)) = r.getLong(1))
      }.start()
    try {
      q.processAllAvailable()
      writeDocs(dir, "b-0002.csv", Seq(
        "3" -> "beta gamma alpha",
        "4" -> "thud mumble xyzzy"))
      q.processAllAvailable()
    } finally q.stop()

    val batchScores = score(spark.read.format("graftcsv").load(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    accepted.toMap shouldBe batchScores
    // and the gate ranks target-like docs above noise in both paths
    accepted(1L) should be > accepted(2L)
    accepted(3L) should be > accepted(4L)
  }
}
