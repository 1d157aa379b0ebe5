package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Geo

/** Round-7 wave 1: grid-bucketed spatial operators (a family the engine
  * lacked entirely).
  *
  * Points live on an integer centidegree grid (exact math, see
  * [[graft.operators.Geo]]), coordinates derived deterministically from
  * entity keys. q244 is bounded-radius nearest-neighbor (customer → closest
  * supplier in the 3×3 cell neighborhood), q245 per-cell density, q246
  * rectangle containment via latitude-band binning. The scale story is the
  * point: all three are equi-joins/aggregations on a grid key — never a
  * cartesian or nested-loop plan, which is what a naive spatial join
  * produces and what dies first at 100 TB.
  */
object R7Queries {

  /** Shared oracle SQL fragments deriving the synthetic coordinates. */
  private def oCoords(table: String, key: String): String = s"""
      SELECT $key AS k,
             ($key * 7919) % 18000 AS latC0,
             ($key * 104729) % 36000 AS lonC0
      FROM $table"""

  private val q244 = QueryDef(
    "q244_geo_grid_knn",
    (s, d) => Geo.gridKnn(
      Geo.withDerivedCoords(Tables.customer(s, d), col("c_custkey")),
      "c_custkey",
      Geo.withDerivedCoords(Tables.supplier(s, d), col("s_suppkey")),
      "s_suppkey",
      cellCenti = 1000),
    Some(s"""
      WITH c AS (${oCoords("customer", "c_custkey")}),
      sp AS (${oCoords("supplier", "s_suppkey")}),
      cand AS (
        SELECT c.k AS c_custkey, sp.k AS s_suppkey,
               (c.latC0 - sp.latC0) * (c.latC0 - sp.latC0)
                 + (c.lonC0 - sp.lonC0) * (c.lonC0 - sp.lonC0) AS dist2
        FROM c JOIN sp
          ON abs(c.latC0 // 1000 - sp.latC0 // 1000) <= 1
         AND abs(c.lonC0 // 1000 - sp.lonC0 // 1000) <= 1),
      ranked AS (
        SELECT c_custkey, s_suppkey, dist2,
               CAST(count(*) OVER (PARTITION BY c_custkey) AS BIGINT)
                 AS n_candidates,
               row_number() OVER (PARTITION BY c_custkey
                 ORDER BY dist2, s_suppkey) AS rn
        FROM cand)
      SELECT c_custkey, s_suppkey, dist2, n_candidates
      FROM ranked WHERE rn = 1"""))

  private val q245 = QueryDef(
    "q245_geo_density",
    (s, d) => Geo.cellDensity(
      Geo.withDerivedCoords(Tables.customer(s, d), col("c_custkey")),
      col("c_acctbal"),
      cellCenti = 1000),
    Some(s"""
      WITH c AS (
        SELECT (c_custkey * 7919) % 18000 AS latC0,
               (c_custkey * 104729) % 36000 AS lonC0,
               c_acctbal
        FROM customer)
      SELECT latC0 // 1000 AS cell_r, lonC0 // 1000 AS cell_c,
             CAST(count(*) AS BIGINT) AS n_points,
             min(c_acctbal) AS min_measure,
             max(c_acctbal) AS max_measure
      FROM c GROUP BY 1, 2"""))

  /** Fences: one rectangle per nation, corners derived from the nation
    * key (height 12°, width 30° — wide enough that most fences catch
    * customers at sf0.01). */
  private val q246 = QueryDef(
    "q246_geofence_assign",
    (s, d) => {
      val fences = Tables.nation(s, d).select(
        col("n_nationkey").cast("long").as("fence_id"),
        pmod(col("n_nationkey").cast("long") * 977, lit(16800L)).as("lat_lo"),
        (pmod(col("n_nationkey").cast("long") * 977, lit(16800L)) + 1200)
          .as("lat_hi"),
        pmod(col("n_nationkey").cast("long") * 3301, lit(33000L)).as("lon_lo"),
        (pmod(col("n_nationkey").cast("long") * 3301, lit(33000L)) + 3000)
          .as("lon_hi"))
      Geo.geofenceAssign(
        Geo.withDerivedCoords(Tables.customer(s, d), col("c_custkey")),
        "c_custkey", fences, "fence_id", bandCenti = 1000)
    },
    Some(s"""
      WITH f AS (
        SELECT CAST(n_nationkey AS BIGINT) AS fence_id,
               (n_nationkey * 977) % 16800 AS lat_lo,
               (n_nationkey * 977) % 16800 + 1200 AS lat_hi,
               (n_nationkey * 3301) % 33000 AS lon_lo,
               (n_nationkey * 3301) % 33000 + 3000 AS lon_hi
        FROM nation),
      c AS (${oCoords("customer", "c_custkey")})
      SELECT f.fence_id, c.k AS c_custkey, c.latC0, c.lonC0
      FROM c JOIN f
        ON c.latC0 BETWEEN f.lat_lo AND f.lat_hi
       AND c.lonC0 BETWEEN f.lon_lo AND f.lon_hi"""))

  val all: Seq[QueryDef] = Seq(q244, q245, q246)
}
