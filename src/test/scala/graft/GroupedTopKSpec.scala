package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK
import graft.plans.GroupedTopKExec

/** The custom grouped-top-k physical operator vs the window plan it
  * replaces: identical answers under a total order, partial+final execs
  * in the plan, and flush-cap degradation that stays correct.
  */
class GroupedTopKSpec extends SparkSpec {
  import spark.implicits._

  // 4 partitions, 40 groups x 50 rows, value not unique -> tiebreak on id
  private lazy val data: DataFrame = spark
    .range(0, 2000, 1, 4)
    .select(
      (col("id") % 40).as("g"),
      (pmod(col("id") * 2654435761L, lit(97))).as("v"),
      col("id"))
    .cache()

  private def windowed(k: Int): DataFrame =
    data.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= k).drop("rn")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("matches the window row_number plan under a total order") {
    val topk = TopK.perGroup(data, Seq(col("g")),
      Seq(col("v").desc, col("id")), 5)
    sortedRows(topk) shouldBe sortedRows(windowed(5))
  }

  test("k larger than every group returns the full input") {
    val topk = TopK.perGroup(data, Seq(col("g")),
      Seq(col("v"), col("id")), 1000)
    topk.count() shouldBe data.count()
  }

  test("plans as partial + final around one exchange") {
    val topk = TopK.perGroup(data, Seq(col("g")), Seq(col("v"), col("id")), 3)
    topk.collect() // materialize so AQE finalizes the plan
    val plan = topk.queryExecution.executedPlan.toString
    plan should include("GroupedTopKPartial")
    plan should include("GroupedTopKFinal")
    plan should include("Exchange hashpartitioning(g")
  }

  test("partial flush cap of 1 group still yields the exact answer") {
    val key = graft.plans.GroupedTopKExec.MaxGroupsConf
    spark.conf.set(key, "1")
    try {
      val topk = TopK.perGroup(data, Seq(col("g")),
        Seq(col("v").desc, col("id")), 5)
      sortedRows(topk) shouldBe sortedRows(windowed(5))
    } finally spark.conf.unset(key)
  }

  test("multi-column grouping and ascending order") {
    val df = data.withColumn("g2", col("id") % 2)
    val topk = TopK.perGroup(df, Seq(col("g"), col("g2")),
      Seq(col("v"), col("id")), 2)
    val expect = df.withColumn("rn", row_number().over(
        Window.partitionBy("g", "g2").orderBy(col("v"), col("id"))))
      .filter(col("rn") <= 2).drop("rn")
    sortedRows(topk) shouldBe sortedRows(expect)
  }

  test("composes downstream: aggregating the top-k output") {
    val topk = TopK.perGroup(data, Seq(col("g")),
      Seq(col("v").desc, col("id")), 5)
    val agg = topk.groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val expect = windowed(5).groupBy("g")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
    sortedRows(agg) shouldBe sortedRows(expect)
  }

  test("group-key filters push through the node to the source") {
    // filter AFTER top-k on a group column: with the pushdown rule the
    // predicate lands below GroupedTopK (whole groups selected, same
    // answer), instead of scanning every group and discarding
    val topk = TopK.perGroup(data, Seq(col("g")),
      Seq(col("v").desc, col("id")), 5)
    val filtered = topk.filter(col("g") < 10)
    sortedRows(filtered) shouldBe sortedRows(windowed(5).filter(col("g") < 10))
    val optimized = filtered.queryExecution.optimizedPlan
    // the Filter must sit BELOW the GroupedTopKNode after optimization
    val node = optimized.collectFirst {
      case t: graft.plans.GroupedTopKNode => t }.get
    node.child.toString should include("Filter")
    optimized.toString.indexOf("graft.plans.GroupedTopKNode") // node present
  }

  test("filters on non-key or computed-key columns are NOT pushed") {
    // predicate on the ORDER column must stay above (it would change
    // each group's top-k if applied first)
    val topk = TopK.perGroup(data, Seq(col("g")),
      Seq(col("v").desc, col("id")), 5)
    val byValue = topk.filter(col("v") > 50)
    sortedRows(byValue) shouldBe sortedRows(windowed(5).filter(col("v") > 50))
    val n1 = byValue.queryExecution.optimizedPlan.collectFirst {
      case t: graft.plans.GroupedTopKNode => t }.get
    n1.child.toString should not include "Filter"

    // computed group key (g % 2): a filter on g feeds the key but does
    // not select whole groups — must stay above
    val computed = TopK.perGroup(data, Seq(col("g") % 2),
      Seq(col("v").desc, col("id")), 5).filter(col("g") < 10)
    val n2 = computed.queryExecution.optimizedPlan.collectFirst {
      case t: graft.plans.GroupedTopKNode => t }.get
    n2.child.toString should not include "Filter"
  }

  test("rejects non-positive k and empty group list") {
    an[IllegalArgumentException] should be thrownBy
      TopK.perGroup(data, Seq(col("g")), Seq(col("v")), 0)
    an[IllegalArgumentException] should be thrownBy
      TopK.perGroup(data, Seq.empty, Seq(col("v")), 1)
  }
}
