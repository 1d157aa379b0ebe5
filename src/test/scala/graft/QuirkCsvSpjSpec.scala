package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over graft_cat tables: two tables
  * identity-partitioned on the join key, joined with
  * spark.sql.sources.v2.bucketing.enabled — the plan must contain NO
  * shuffle exchange on either side (the splits line up by partition
  * value via HasPartitionKey / KeyGroupedPartitioning). */
class QuirkCsvSpjSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_spj").toString
    spark.conf.set("spark.sql.catalog.graft_spj",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_spj.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_spj.ns")
    r
  }

  /** Every shuffle in the executed plan, descending through AQE nodes. */
  private def shuffles(plan: SparkPlan): Seq[SparkPlan] = {
    def deep(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
      case q: QueryStageExec => deep(q.plan)
      case s: ShuffleExchangeLike => Seq(s)
    }.flatten
    deep(plan)
  }

  private def withSpj[T](body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-partitioned join plans ZERO shuffles and returns exact results") {
    root
    spark.sql("""CREATE TABLE graft_spj.ns.sales (amount STRING, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("""CREATE TABLE graft_spj.ns.quota (target STRING, region STRING)
      PARTITIONED BY (region)""")
    val regions = Seq("east", "west", "north", "south")
    regions.zipWithIndex.foreach { case (r, i) =>
      spark.range(20).selectExpr(
        s"CAST(id + ${i * 100} AS STRING) AS amount", s"'$r' AS region")
        .writeTo("graft_spj.ns.sales").append()
      spark.range(2).selectExpr(
        s"CAST(id + ${i * 10} AS STRING) AS target", s"'$r' AS region")
        .writeTo("graft_spj.ns.quota").append()
    }
    withSpj {
      val joined = spark.table("graft_spj.ns.sales")
        .join(spark.table("graft_spj.ns.quota"), Seq("region"))
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n"))
      val rows = joined.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap
      rows shouldBe regions.map(_ -> 40L).toMap // 20 sales x 2 quotas
      // the join itself must be exchange-free: the only permitted
      // shuffle is the post-join aggregation's
      val plan = joined.queryExecution.executedPlan
      val joinShuffles = shuffles(plan)
      // locate the join node and assert no shuffle occurs BELOW it
      def deepFind(p: SparkPlan)(f: SparkPlan => Boolean): Seq[SparkPlan] =
        p.collect {
          case a: AdaptiveSparkPlanExec => deepFind(a.executedPlan)(f)
          case q: QueryStageExec => deepFind(q.plan)(f)
          case x if f(x) => Seq(x)
        }.flatten
      val joins = deepFind(plan)(p =>
        p.getClass.getSimpleName.contains("Join"))
      joins should not be empty
      // a broadcast join would ALSO show zero shuffles — rule out the
      // masked win: the SPJ plan is a SortMergeJoin with no exchange of
      // ANY kind beneath it (adaptive broadcast threshold is -1 above)
      joins.foreach { j =>
        j.getClass.getSimpleName should include("SortMergeJoin")
        shuffles(j) shouldBe empty
        deepFind(j)(_.getClass.getSimpleName.contains("BroadcastExchange"))
          .isEmpty shouldBe true
      }
    }
  }

  test("with the bucketing conf OFF the same join shuffles (grouping follows the conf)") {
    root
    spark.sql("""CREATE TABLE graft_spj.ns.s2 (amount STRING, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("""CREATE TABLE graft_spj.ns.q2 (target STRING, region STRING)
      PARTITIONED BY (region)""")
    Seq("east", "west").foreach { r =>
      spark.range(20).selectExpr(
        "CAST(id AS STRING) AS amount", s"'$r' AS region")
        .writeTo("graft_spj.ns.s2").append()
      spark.range(2).selectExpr(
        "CAST(id AS STRING) AS target", s"'$r' AS region")
        .writeTo("graft_spj.ns.q2").append()
    }
    val joined = spark.table("graft_spj.ns.s2")
      .join(spark.table("graft_spj.ns.q2"), Seq("region"))
    val overrides = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // v2 bucketing defaults TRUE in Spark 4 — grouping follows it;
      // with it off, partitioned scans plan ordinary byte-range splits
      // and the join pays its exchanges like any other
      "spark.sql.sources.v2.bucketing.enabled" -> "false")
    val prior = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      joined.count() shouldBe 80L
      shuffles(joined.queryExecution.executedPlan) should not be empty
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("pushdowns take precedence over grouping (agg scan stays split-parallel)") {
    root
    withSpj {
      val t = spark.table("graft_spj.ns.sales")
      // a pushed aggregate is NOT a join input: the scan keeps its
      // split-parallel pushed partials instead of one task per value
      val agg = t.groupBy("region").agg(count(lit(1)).as("n"))
      agg.queryExecution.executedPlan.toString should
        include("PushedAggregation")
      agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
        Map("east" -> 20L, "west" -> 20L, "north" -> 20L, "south" -> 20L)
      // pushed limit/top-N similarly opt the scan out of grouping
      t.orderBy("amount").limit(3).collect().length shouldBe 3
    }
  }

  test("one split per partition value, files chained") {
    root
    withSpj {
      // sales: 4 regions -> exactly 4 splits regardless of file count
      spark.table("graft_spj.ns.sales").rdd.getNumPartitions shouldBe 4
    }
  }
}
