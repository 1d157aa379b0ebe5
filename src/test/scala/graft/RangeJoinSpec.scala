package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** RangeJoin correctness: the binned equi-join must produce EXACTLY the
  * rows of the naive BETWEEN join, each exactly once, for every bin-width
  * choice — bins move cost, never results. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 59L), (3L, 60L), (4L, 61L), (5L, 150L),
    (6L, 600L), (7L, -30L), (8L, 1000000L))
    .toDF("p_id", "pt")
  private lazy val intervals = Seq(
    (10L, 0L, 60L),        // spans a full bin, inclusive edges
    (11L, 59L, 61L),       // straddles the 60-boundary
    (12L, 100L, 200L),
    (13L, 500L, 400L),     // inverted: matches nothing
    (14L, -50L, -10L),     // negative domain
    (15L, 999999L, 1000001L))
    .toDF("i_id", "lo", "hi")
  private lazy val nullIntervals =
    Seq((16L, Some(5L), None: Option[Long]), (17L, None: Option[Long], Some(5L)))
      .toDF("i_id", "lo", "hi")

  private def naive(ps: DataFrame, is: DataFrame): Seq[(Long, Long)] =
    ps.join(is, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted

  test("pointInInterval == naive BETWEEN join for several bin widths") {
    val expected = naive(points, intervals)
    expected should not be empty // fixture sanity: edges actually match
    for (w <- Seq(1L, 7L, 60L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "pt", intervals,
          "lo", "hi", binWidth = w)
        .select("p_id", "i_id").as[(Long, Long)].collect().toSeq.sorted
      withClue(s"binWidth=$w: ") { got shouldBe expected }
    }
  }

  test("each matching pair is emitted exactly once (no bin-overlap dupes)") {
    val got = RangeJoin.pointInInterval(points, "pt", intervals,
        "lo", "hi", binWidth = 10)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSeq
    got.distinct.size shouldBe got.size
  }

  test("NULL bounds and NULL points match nothing") {
    val ps = points.unionByName(Seq((9L, Option.empty[Long])).toDF("p_id", "pt"))
    RangeJoin.pointInInterval(ps, "pt", nullIntervals, "lo", "hi", 10)
      .count() shouldBe 0L
  }

  test("broadcastIntervals variant matches and plans a broadcast join") {
    val plain = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 60)
    val bcast = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 60,
      broadcastIntervals = true)
    rowsAsStrings(bcast) shouldBe rowsAsStrings(plain)
    bcast.queryExecution.executedPlan.toString should include("BroadcastHashJoin")
    // and no nested loop anywhere — the whole point of binning
    bcast.queryExecution.executedPlan.toString should not include "NestedLoop"
  }

  test("intervalOverlap == naive overlap join, exactly once per pair") {
    val left = Seq((1L, 0L, 100L), (2L, 90L, 95L), (3L, 200L, 300L),
      (4L, 400L, 350L)).toDF("l_id", "l_lo", "l_hi")
    val right = Seq((10L, 50L, 250L), (11L, 301L, 500L), (12L, 0L, 0L))
      .toDF("r_id", "r_lo", "r_hi")
    val expected = left.join(right,
        col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .filter(col("l_lo") <= col("l_hi") && col("r_lo") <= col("r_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    expected should not be empty
    for (w <- Seq(1L, 60L, 10000L)) {
      val got = RangeJoin.intervalOverlap(left, "l_lo", "l_hi",
          right, "r_lo", "r_hi", binWidth = w)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
      withClue(s"binWidth=$w: ") { got shouldBe expected }
    }
  }

  test("reserved __bin column is rejected") {
    val bad = points.withColumn("__bin", lit(1))
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(bad, "pt", intervals, "lo", "hi", 10)
  }
}
