package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the CO-LOCATED index layout at data volume (not part
  * of the driver contract — run by hand):
  *
  * {{{ sbt "runMain graft.ColocatedIndexProbe <documentsParquet> <newPct>" }}}
  *
  * Same daily-increment protocol as [[NearDupIndexProbe]], run against
  * BOTH layouts of the same index (batch-partitioned default vs
  * band_bucket co-located) under BOTH join regimes:
  *
  *  - broadcast available (the small-batch day): the fresh side
  *    broadcasts, so NEITHER layout shuffles the band table — the
  *    co-location costs nothing and buys nothing.
  *  - broadcast off (the big-batch day, or a batch past the driver's
  *    broadcast ceiling): the default layout must SHUFFLE THE WHOLE
  *    BAND TABLE into a sort-merge join every day; the co-located
  *    layout plans storage-partitioned with zero exchange beneath the
  *    join. This regime is what the layout exists for at 100 TB.
  *
  * Answers are REQUIREd identical everywhere. The probe prints batch
  * and serve wall times plus the shuffle count BENEATH the candidate
  * join (the co-location metric; the trailing distinct's exchange is
  * layout-independent). Since the two-level `(band_bucket, batch)`
  * layout landed, BOTH flavors land a batch as one overwrite commit —
  * the old row-level DELETE + append price is gone; the probe verifies
  * the land-cost gap closed. */
object ColocatedIndexProbe {

  private def joinShuffles(df: DataFrame): Seq[Int] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def below(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      self + unwrap(p).map(below).sum
    }
    def joins(p: SparkPlan): Seq[BaseJoinExec] = p match {
      case j: BaseJoinExec => Seq(j)
      case other => unwrap(other).flatMap(joins)
    }
    joins(df.queryExecution.executedPlan)
      .filterNot(_.isInstanceOf[BroadcastHashJoinExec])
      .map(j => j.children.map(below).sum)
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0)
      else "/root/testdata/sf0.1/documents.parquet"
    val newPct = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.catalog.graft_cip",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cip.root",
      java.nio.file.Files.createTempDirectory("graft_cip").toString)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val docs = spark.read.parquet(src).select(col("doc_id"), col("text"))
    val isNew = col("doc_id") % 100 < newPct
    println(s"corpus=${docs.count()} docs, new batch=" +
      s"${docs.filter(isNew).count()} (${newPct}%)")

    def serveOnce(name: String): (Long, Double, Seq[Int]) = {
      val t0 = System.nanoTime
      val served = graft.operators.NearDupIndex.candidatePairsFor(spark,
        "graft_cip", "p", name, "day1")
      val n = served.localCheckpoint().count()
      val t = (System.nanoTime - t0) / 1e9
      (n, t, joinShuffles(served))
    }

    def drive(name: String, joinBuckets: Int): Unit = {
      graft.operators.NearDupIndex.build(spark, "graft_cip", "p", name,
        docs.filter(!isNew), "doc_id", "text", joinBuckets = joinBuckets)
      val t0 = System.nanoTime
      graft.operators.NearDupIndex.indexBatch(spark, "graft_cip", "p",
        name, docs.filter(isNew), "doc_id", "text", "day1")
      val tIndex = (System.nanoTime - t0) / 1e9
      val (nB, tB, jsB) = serveOnce(name)
      val (nS, tS, jsS) = {
        val priors = Seq("spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
          .map(k => k -> spark.conf.getOption(k))
        priors.foreach { case (k, _) => spark.conf.set(k, "-1") }
        try serveOnce(name)
        finally priors.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      require(nB == nS, s"regimes must agree ($nB vs $nS)")
      println(f"$name%-8s batch $tIndex%5.1f s | serve(bcast) $tB%5.1f s " +
        f"join-shuffles=${jsB.sum} | serve(no-bcast) $tS%5.1f s " +
        f"join-shuffles=${jsS.sum} ($nB pairs)")
    }
    drive("default", 0)
    drive("colo", 32)
    spark.stop()
  }
}
