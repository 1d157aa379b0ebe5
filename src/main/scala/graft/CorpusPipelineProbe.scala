package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the FULL [[operators.CorpusPipeline.run]] chain at
  * growing data volume (not part of the driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.CorpusPipelineProbe <documentsParquet> <Ks>" }}}
  *
  * The HotBandProbe discipline applied to the whole pipeline
  * (normalize → length gate → quality gate → exact dedup → near dedup →
  * decontaminate): the corpus is unioned K times with offset ids and a
  * ONE-TOKEN-APPENDED per-copy tweak — copies survive EXACT dedup
  * (distinct md5) but SimHash-cluster as a K-member near-dup clique
  * sharing band buckets, the boilerplate-with-per-mirror-tweaks
  * pathology. Uncapped, the banded self-join emits ≥ docs × C(K,2)
  * pairs (quadratic in K); with the pipeline's default-on
  * `nearDupMaxBucket` below K the saturated buckets drop before the
  * join and every stage grows ≤ linearly in K. The probe sweeps K with
  * the cap on AND off and prints stage rows, candidate pairs, and wall
  * time so the growth law is measured, not asserted (PLANS.md records
  * the measured law). */
object CorpusPipelineProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0)
      else "/root/testdata/sf0.01/documents.parquet"
    val ks = (if (args.length > 1) args(1) else "1,3,10")
      .split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet(src)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint()
    val nBase = base.count()
    // a small fixed eval set so decontamination has real work
    val evalDocs = base.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"base corpus: $nBase docs, eval set: ${evalDocs.count()}")
    for (k <- ks) {
      // copy i: ids offset, one copy-unique token appended — md5 differs
      // (survives exact dedup), SimHash nearly identical (near-dup
      // clique), band buckets shared across the clique
      val docs = (0 until k).map(i =>
          base.select(
            (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
            concat(col("text"), lit(s" uniq$i")).as("text")))
        .reduce(_ unionByName _).localCheckpoint()
      def run(cap: Int): (Seq[(String, Long)], Double) = {
        val t0 = System.nanoTime
        val r = graft.operators.CorpusPipeline.run(spark, docs, "doc_id",
          "text", evalDocs,
          graft.operators.CorpusPipeline.Config(nearDupMaxBucket = cap))
        val report = r.report.orderBy("stage").collect()
          .map(x => x.getString(1) -> x.getLong(3)).toSeq // (name, n_out)
        (report, (System.nanoTime - t0) / 1e9)
      }
      val cap = math.max(2, k - 1) // below the clique size
      val (repCap, tCap) = run(cap)
      val (repUn, tUn) = run(0)
      // the candidate-pair law itself (the stage the cap protects):
      // uncapped grows ∝ docs × C(K,2), capped stays ~flat
      def pairs(c: Int): Long = graft.operators.Corpus
        .simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3,
          bits = 64, numBands = 4, maxBucket = c).count()
      val (pCap, pUn) = (pairs(cap), pairs(0))
      def fmt(rep: Seq[(String, Long)]) =
        rep.map { case (s, n) => s"$s=$n" }.mkString(" ")
      println(f"K=$k%2d docs=${nBase * k}%8d | cap=$cap: $tCap%6.1f s " +
        f"pairs=$pCap%9d  ${fmt(repCap)}")
      println(f"      uncapped: $tUn%6.1f s pairs=$pUn%9d  ${fmt(repUn)}")
    }
    spark.stop()
  }
}
