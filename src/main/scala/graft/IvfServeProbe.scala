package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for serving ANN queries FROM the persisted IVF index at
  * data volume (not part of the driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.IvfServeProbe <embeddingsParquet> <k> <nprobe>" }}}
  *
  * Builds the index once (catalog tables under a scratch root), then
  * compares index-served top-k ([[operators.IvfIndex.topK]]) against the
  * guard-bypassed brute-force scoring of every (query, vector) pair. The
  * scale claim measured, not guessed: the SCORED fraction — candidate
  * pairs taken off the persisted assignment vs all pairs — should sit
  * near nprobe/k_centroids, and serving never re-assigns the corpus
  * (the assignment table is the only corpus-sized input besides the
  * candidates' embedding fetch). */
object IvfServeProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0)
      else "/tmp/scale_probe/x100g/embeddings.parquet"
    val kCent = if (args.length > 1) args(1).toInt else 64
    val nprobe = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft_ivfp",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_ivfp.root",
      java.nio.file.Files.createTempDirectory("graft_ivfp").toString)
    val e = spark.read.parquet(src)
    val nVec = e.count()
    val isQuery = col("vec_id") % 9973 === 0 // a thin deterministic sample
    val nQ = e.filter(isQuery).count()
    println(s"corpus=$nVec vectors, queries=$nQ, k_cent=$kCent, nprobe=$nprobe")

    var t0 = System.nanoTime
    graft.operators.IvfIndex.build(spark, "graft_ivfp", "p", "ann",
      e, "vec_id", "embedding", kCent)
    println(f"index build (train + full base assignment): " +
      f"${(System.nanoTime - t0) / 1e9}%.1f s")

    // serving: fresh plan per run (AQE stage-reuse trap)
    def served() = graft.operators.IvfIndex.topK(spark, "graft_ivfp", "p",
      "ann", e, "vec_id", "embedding", isQuery, k = 10, nprobe = nprobe)
    (1 to 2).foreach { i =>
      t0 = System.nanoTime
      val n = served().count()
      println(f"index-served run$i: ${(System.nanoTime - t0) / 1e9}%.2f s " +
        s"(result rows=$n)")
    }
    // scored-fraction accounting: candidates off the persisted assignment
    val cents = graft.operators.IvfIndex.centroids(spark, "graft_ivfp", "p", "ann")
    val q = e.filter(isQuery)
      .select(col("vec_id").cast("string").as("q_id"),
        col("embedding").as("__q_emb"))
    val qc = q.crossJoin(broadcast(cents))
      .withColumn("__cos", call_function("vec_cosine",
        col("__q_emb"), col("centroid_emb")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("__cos").desc, col("centroid_id"))))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("centroid_id"))
    val cand = qc.join(
      graft.operators.IvfIndex.assignment(spark, "graft_ivfp", "p", "ann")
        .select(col("vec_id").as("n_id"), col("centroid_id")),
      Seq("centroid_id")).count()
    val allPairs = nQ * nVec
    println(f"scored pairs: $cand of $allPairs " +
      f"(fraction=${cand.toDouble / allPairs}%.4f, " +
      f"nprobe/k=${nprobe.toDouble / kCent}%.4f)")

    // brute-force baseline: every (query, vector) pair scored
    def brute() = {
      val n = e.select(col("vec_id").cast("string").as("n_id"),
        col("embedding").as("__n_emb"))
      q.crossJoin(n)
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cosine", call_function("vec_cosine",
          col("__q_emb"), col("__n_emb")))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
            .orderBy(col("cosine").desc, col("n_id"))))
        .filter(col("rank") <= 10)
    }
    (1 to 2).foreach { i =>
      t0 = System.nanoTime
      val n = brute().count()
      println(f"brute-force run$i: ${(System.nanoTime - t0) / 1e9}%.2f s " +
        s"(result rows=$n)")
    }
    spark.stop()
  }
}
