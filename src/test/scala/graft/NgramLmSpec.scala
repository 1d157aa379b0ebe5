package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** The pre-fit NgramModel lifecycle around Stupid Backoff: incremental
  * count maintenance equals refit, the model round-trips through
  * parquet, and a streaming intake scores against the frozen model
  * exactly like batch. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "text")

  private val evalDocs = docs(
    10L -> "a b c a",
    11L -> "b a b",
    12L -> "a b z q")

  private def scores(m: Corpus.NgramModel): Map[Long, Double] =
    Corpus.stupidBackoffScoreWith(evalDocs, m, "id", "text")
      .collect().map(r =>
        r.getAs[Long]("id") -> r.getAs[Double]("sb_nats")).toMap

  test("updateNgramModel(fit(A), B) == fitNgramModel(A union B)") {
    val a = docs(1L -> "a b c a b c", 2L -> "c a b a")
    val b = docs(3L -> "a b c z", 4L -> "b c a b")
    val incremental = Corpus.updateNgramModel(
      Corpus.fitNgramModel(a, "text"), b, "text")
    val refit = Corpus.fitNgramModel(a.unionAll(b), "text")
    scores(incremental) shouldBe scores(refit)
  }

  test("the model round-trips through parquet") {
    val m = Corpus.fitNgramModel(
      docs(1L -> "a b c a b c", 2L -> "c a b a"), "text")
    val dir = Files.createTempDirectory("ngram_lm").toString
    m.uni.write.parquet(s"$dir/uni")
    m.bi.write.parquet(s"$dir/bi")
    m.tri.write.parquet(s"$dir/tri")
    val back = Corpus.NgramModel(
      spark.read.parquet(s"$dir/uni"),
      spark.read.parquet(s"$dir/bi"),
      spark.read.parquet(s"$dir/tri"))
    scores(back) shouldBe scores(m)
  }

  test("streaming intake scores against the frozen model == batch") {
    val fit = Corpus.fitNgramModel(
      docs(1L -> "a b c a b c", 2L -> "c a b a"), "text")
    val m = Corpus.NgramModel(fit.uni.cache(), fit.bi.cache(),
      fit.tri.cache())
    val dir = Files.createTempDirectory("ngram_stream").toString
    def drop(name: String, rows: Seq[(String, String)]): Unit =
      Files.write(Paths.get(dir, name),
        ("id,text\n" + rows.map { case (i, t) => s"$i,$t" }
          .mkString("", "\n", "\n")).getBytes(StandardCharsets.ISO_8859_1))
    drop("b-0001.csv", Seq("10" -> "a b c a", "11" -> "b a b"))
    val got = scala.collection.mutable.Map.empty[Long, Double]
    val q = spark.readStream.format("graftcsv").load(dir)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        Corpus.stupidBackoffScoreWith(
          batch.select(col("id").cast("long").as("id"), col("text")),
          m, "id", "text")
          .collect().foreach(r => got(r.getAs[Long]("id")) =
            r.getAs[Double]("sb_nats"))
      }.start()
    try {
      q.processAllAvailable()
      drop("b-0002.csv", Seq("12" -> "a b z q"))
      q.processAllAvailable()
    } finally q.stop()
    got.toMap shouldBe scores(m)
  }
}
