package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the LSH hot-band cap at data volume (not part of the
  * driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.HotBandProbe <documentsParquet> <Ks>" }}}
  *
  * Replica-clique pathology, the offset-key duplication protocol: the
  * corpus is unioned K times with offset doc_ids and UNCHANGED text, so
  * every document becomes a K-member clique whose members share every
  * band bucket. Uncapped, [[operators.NearDup.minHashLshCandidates]]
  * emits ≥ docs × C(K,2) pairs — quadratic in K; with the pinned cap
  * below K the saturated buckets are dropped before the self-join and
  * the candidate volume stays flat. The probe sweeps K and prints both
  * columns so the growth law is measured, not asserted. */
object HotBandProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0)
      else "/root/testdata/sf0.01/documents.parquet"
    val ks = (if (args.length > 1) args(1) else "1,5,10")
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
    println(s"base corpus: $nBase docs from $src")
    for (k <- ks) {
      val docs = (0 until k).map(i =>
          base.select((col("doc_id") + lit(i.toLong * 10000000L))
            .cast("string").as("doc_id"), col("text")))
        .reduce(_ unionByName _).localCheckpoint()
      def run(cap: Long): (Long, Double) = {
        val t0 = System.nanoTime
        val n = graft.operators.NearDup.minHashLshCandidates(
          docs, "doc_id", "text", maxBucket = cap).count()
        (n, (System.nanoTime - t0) / 1e9)
      }
      val (nUn, tUn) = run(0L)
      val cap = math.max(k - 1, 2).toLong // below the clique size
      val (nCap, tCap) = run(cap)
      println(f"K=$k%2d docs=${nBase * k}%8d | uncapped: $nUn%10d pairs " +
        f"$tUn%6.1f s | cap=$cap: $nCap%10d pairs $tCap%6.1f s")
    }
    spark.stop()
  }
}
