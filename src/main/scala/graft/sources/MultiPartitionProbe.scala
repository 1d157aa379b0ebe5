package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for MULTI-LEVEL identity partitioning at leaf-count volume
  * (not part of the driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.MultiPartitionProbe <buckets> <batches>" }}}
  *
  * Builds a two-level `(b, c)` graftcsv table with buckets × batches
  * leaf directories and measures the maintenance operations the
  * two-level index layouts lean on, at growing leaf counts:
  *
  *  - '''leaf walk''' ([[QuirkCsv.leafValueDirs]]) — the
  *    listing behind overwrite-where targeting, partial-spec deletes,
  *    and compaction/sweep; fans out from the bounded pool past 16
  *    dirs per level, so wall time should grow ~leaf/16, not ~leaf.
  *  - '''partial-spec DELETE''' on the SECOND level (`c = '<v>'`) —
  *    metadata-only: one versioned commit retiring `buckets` leaf dirs,
  *    zero rows read.
  *  - '''single-batch dynamic overwrite replay''' — the co-located
  *    index land shape: rows for ONE c-value across every bucket.
  *  - '''two-level-pruned read''' — the equality probe on both levels
  *    must stay flat in total leaf count (one dir listed).
  *
  * Laws worth recording: walk ≈ sub-linear in leaves (pool-bounded),
  * delete ≈ linear in BUCKETS (renames) but zero data I/O, read ≈ flat. */
object MultiPartitionProbe {
  def main(args: Array[String]): Unit = {
    val shapes: Seq[(Int, Int)] =
      if (args.length >= 2) Seq((args(0).toInt, args(1).toInt))
      else Seq((8, 8), (32, 16), (64, 32))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      // toy row counts: AQE would coalesce the clustered write to ONE
      // task writing every leaf file sequentially — the known toy-scale
      // artifact (see PLANS), not the layout's law; keep 32 write tasks
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_mpp").toString
    spark.conf.set("spark.sql.catalog.graft_mpp",
      classOf[QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mpp.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_mpp.ns")
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime
      val r = body
      (r, (System.nanoTime - t0) / 1e9)
    }
    shapes.foreach { case (buckets, batches) =>
      val t = s"t_${buckets}_$batches"
      spark.sql(s"DROP TABLE IF EXISTS graft_mpp.ns.$t")
      spark.sql(s"""CREATE TABLE graft_mpp.ns.$t (k STRING, b STRING,
        c STRING) PARTITIONED BY (b, c)""")
      // 4 rows per leaf
      val n = buckets * batches * 4
      val (_, tLoad) = timed {
        spark.range(n).selectExpr(
            "CAST(id AS STRING) AS k",
            s"CAST(id % $buckets AS STRING) AS b",
            s"concat('d', CAST((id / $buckets) % $batches AS INT)) AS c")
          .writeTo(s"graft_mpp.ns.$t").append()
      }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val (leaves, tWalk) = timed {
        QuirkCsv.leafValueDirs(fs,
          new org.apache.hadoop.fs.Path(s"$root/ns/$t"),
          Seq("b", "c")).size
      }
      val (_, tDelete) = timed {
        spark.sql(s"DELETE FROM graft_mpp.ns.$t WHERE c = 'd0'")
      }
      val (_, tReplay) = timed {
        spark.range(buckets * 4).selectExpr(
            "concat('r', CAST(id AS STRING)) AS k",
            s"CAST(id % $buckets AS STRING) AS b", "'d1' AS c")
          .writeTo(s"graft_mpp.ns.$t").overwritePartitions()
      }
      val (rows, tRead) = timed {
        spark.table(s"graft_mpp.ns.$t")
          .filter(col("b") === "0" && col("c") === "d2").count()
      }
      println(f"leaves=${buckets * batches}%5d (b=$buckets%3d c=$batches%3d)" +
        f" | load $tLoad%6.2f s | walk($leaves) $tWalk%6.2f s | " +
        f"delete-level2 $tDelete%6.2f s | replay-1-batch $tReplay%6.2f s" +
        f" | 2-level read($rows rows) $tRead%6.2f s")
    }
    spark.stop()
  }
}
