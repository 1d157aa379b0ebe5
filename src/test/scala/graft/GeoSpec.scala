package graft

import org.apache.spark.sql.functions._

import graft.operators.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*) =
    rows.toDF("k", "latC0", "lonC0")

  // -------------------------------------------- gridKnn

  test("gridKnn picks the true nearest inside the neighborhood") {
    val queries = pts((1L, 5000L, 5000L))
    val points = pts((10L, 5100L, 5000L), (11L, 5000L, 5300L),
      (12L, 5900L, 5900L))
    val got = Geo.gridKnn(queries, "k", points.withColumnRenamed("k", "p"),
      "p", cellCenti = 1000).collect()
    got.length shouldBe 1
    got.head.getAs[Long]("p") shouldBe 10L
    got.head.getAs[Long]("dist2") shouldBe 100L * 100L
    got.head.getAs[Long]("n_candidates") shouldBe 3L
  }

  test("gridKnn is radius-bounded: empty neighborhood drops the query") {
    val queries = pts((1L, 500L, 500L))
    val points = pts((10L, 9500L, 9500L)) // far away, different cells
    Geo.gridKnn(queries, "k", points.withColumnRenamed("k", "p"), "p",
      cellCenti = 1000).count() shouldBe 0L
  }

  test("gridKnn sees points in adjacent cells, ties break on point key") {
    // query at the very edge of cell (0,0); candidates equidistant
    val queries = pts((1L, 999L, 999L))
    val points = pts((20L, 999L, 1099L), (10L, 999L, 899L)) // both d=100
    val got = Geo.gridKnn(queries, "k", points.withColumnRenamed("k", "p"),
      "p", cellCenti = 1000).collect()
    got.head.getAs[Long]("p") shouldBe 10L
    got.head.getAs[Long]("dist2") shouldBe 100L * 100L
  }

  test("gridKnn plan is an equi-join, never a nested loop") {
    val queries = pts((1L, 5000L, 5000L), (2L, 100L, 100L))
    val points = pts((10L, 5100L, 5000L))
    val plan = Geo.gridKnn(queries, "k",
      points.withColumnRenamed("k", "p"), "p", 1000)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("gridKnn matches a brute-force argmin whenever the true nearest " +
    "is inside the 3x3 neighborhood") {
    // deterministic scatter; cell 1000 => neighborhood radius >= 1000
    val queries = pts((1 to 40).map(i =>
      (i.toLong, (i * 397L) % 18000, (i * 811L) % 36000)): _*)
    val points = pts((1 to 60).map(i =>
      (i.toLong, (i * 577L) % 18000, (i * 233L) % 36000)): _*)
    val q = queries.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p = points.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = q.flatMap { case (qk, qla, qlo) =>
      val cand = p.filter { case (_, pla, plo) =>
        math.abs(qla / 1000 - pla / 1000) <= 1 &&
          math.abs(qlo / 1000 - plo / 1000) <= 1
      }
      if (cand.isEmpty) None
      else {
        val best = cand.minBy { case (pk, pla, plo) =>
          ((qla - pla) * (qla - pla) + (qlo - plo) * (qlo - plo), pk)
        }
        Some((qk, best._1))
      }
    }.toMap
    val got = Geo.gridKnn(queries, "k", points.withColumnRenamed("k", "p"),
      "p", 1000).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("p")).toMap
    got shouldBe expected
  }

  // -------------------------------------------- cellDensity

  test("cellDensity counts and min/max per cell") {
    val df = pts((1L, 100L, 100L), (2L, 200L, 900L), (3L, 1500L, 100L))
      .withColumn("m", col("k").cast("double") * 10)
    val got = Geo.cellDensity(df, col("m"), 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_points"), r.getAs[Double]("min_measure"),
          r.getAs[Double]("max_measure"))).toMap
    got((0L, 0L)) shouldBe ((2L, 10.0, 20.0))
    got((1L, 0L)) shouldBe ((1L, 30.0, 30.0))
  }

  // -------------------------------------------- geofenceAssign

  test("geofenceAssign matches brute-force BETWEEN semantics") {
    val points = pts((1 to 50).map(i =>
      (i.toLong, (i * 397L) % 18000, (i * 811L) % 36000)): _*)
    val fences = Seq(
      (100L, 0L, 2500L, 0L, 9000L),     // spans 3 lat bands
      (200L, 4900L, 5100L, 0L, 36000L), // thin band-straddling strip
      (300L, 17000L, 17999L, 30000L, 35999L))
      .toDF("fence_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    val expected = points.collect().flatMap { r =>
      val (k, la, lo) = (r.getLong(0), r.getLong(1), r.getLong(2))
      fences.collect().collect {
        case f if la >= f.getLong(1) && la <= f.getLong(2) &&
          lo >= f.getLong(3) && lo <= f.getLong(4) =>
          (f.getLong(0), k)
      }
    }.toSet
    val got = Geo.geofenceAssign(points, "k", fences, "fence_id", 1000)
      .collect().map(r => (r.getAs[Long]("fence_id"), r.getAs[Long]("k")))
      .toSet
    got shouldBe expected
    expected.nonEmpty shouldBe true
  }

  test("geofenceAssign plan avoids nested-loop joins") {
    val points = pts((1L, 100L, 100L))
    val fences = Seq((100L, 0L, 2500L, 0L, 9000L))
      .toDF("fence_id", "lat_lo", "lat_hi", "lon_lo", "lon_hi")
    val plan = Geo.geofenceAssign(points, "k", fences, "fence_id", 1000)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
