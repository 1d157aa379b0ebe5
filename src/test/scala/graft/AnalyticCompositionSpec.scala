package graft

/** Plan-shape audits for the round-4 analytic compositions (q117-q119):
  * the fact table must be the ONLY shuffling side — every dim join
  * broadcast, the top-k taken as a partial TakeOrderedAndProject, the
  * monthly lag window over the already-aggregated (tiny) rollup. Runs on
  * sf0.001 — plan shape, not data volume, is under test. */
class AnalyticCompositionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q117: customer dim broadcast; top-10 is a partial TakeOrdered") {
    val plan = Queries.byName("q117_unshipped_topk").fn(spark, sf)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("TakeOrderedAndProject")
  }

  test("q118: all four dim sides broadcast, fact shuffles at most once") {
    val plan = Queries.byName("q118_region_revenue").fn(spark, sf)
      .queryExecution.executedPlan.toString
    // region/nation fold into customer's broadcast; customer and supplier
    // broadcast against the fact side
    "BroadcastHashJoin".r.findAllIn(plan).size should be >= 3
    // the only sort-merge-join permitted is orders ⋈ lineitem (fact-fact)
    "SortMergeJoin".r.findAllIn(plan).size should be <= 1
  }

  test("q119: lag window runs over the post-aggregation rollup") {
    val df = Queries.byName("q119_mom_growth").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // window after aggregate: the Window operator's child chain contains
    // the HashAggregate, not the raw scan directly
    plan should include("Window")
    plan should include("HashAggregate")
    df.count() should be > 0L
  }
}
