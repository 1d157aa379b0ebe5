package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial operators.
  *
  * Coordinates are integer CENTIDEGREES (`latC0` in 0..17999 ≡ −90°..+90°,
  * `lonC0` in 0..35999 ≡ −180°..+180°) so every distance and cell id is
  * exact integer arithmetic — no trig, no float rounding, and therefore
  * bit-stable across engines (the DuckDB oracles replay the same math).
  *
  * Scale posture: the naive nearest-neighbor join is a cartesian product
  * (O(|queries|·|points|) — 10^16 pairs at 100 TB). Every operator here
  * buckets both sides onto a grid-cell key first, so the join is a plain
  * equi-join Catalyst shuffles on the cell id; the points side is exploded
  * ×9 onto its 3×3 neighborhood (a constant-factor map-side expansion, the
  * standard trick that keeps the candidate set local). No operator ever
  * compares points across non-adjacent cells.
  */
object Geo {

  /** Deterministic synthetic coordinates for an integer entity key:
    * `latC0 = (key·7919) mod 18000`, `lonC0 = (key·104729) mod 36000`.
    * Multipliers are primes coprime to the moduli, so keys spread evenly.
    * Exact integer math — identical in any engine. */
  def withDerivedCoords(df: DataFrame, key: Column): DataFrame =
    df.withColumn("latC0", pmod(key * lit(7919L), lit(18000L)))
      .withColumn("lonC0", pmod(key * lit(104729L), lit(36000L)))

  /** Exact integer floor division: subtracting the floor-mod first makes
    * the quotient an exact integer, so the double division is lossless. */
  private def idiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  private def cellCols(cellCenti: Int): (Column, Column) =
    (idiv(col("latC0"), cellCenti), idiv(col("lonC0"), cellCenti))

  /** Bounded-radius nearest neighbor: for each query point, the closest
    * point (squared centidegree distance, ties to the smallest point key)
    * among points in the 3×3 neighborhood of its `cellCenti`-sized grid
    * cell. Queries with an empty neighborhood are absent from the output —
    * the contract is radius-bounded kNN (radius ≥ one cell side), not
    * global kNN.
    *
    * Plan: points exploded ×9 onto neighbor cells, then one equi-join on
    * (cell_r, cell_c) and one per-query-key window for the argmin. The
    * join never degrades to a nested loop.
    */
  def gridKnn(queries: DataFrame, queryKey: String,
              points: DataFrame, pointKey: String,
              cellCenti: Int = 1000): DataFrame = {
    val (qr, qc) = cellCols(cellCenti)
    val q = queries.select(col(queryKey), col("latC0").as("q_lat"),
      col("lonC0").as("q_lon"), qr.as("cell_r"), qc.as("cell_c"))
    val (pr, pc) = cellCols(cellCenti)
    val offsets = array((-1 to 1).flatMap(dr => (-1 to 1).map(dc =>
      struct(lit(dr.toLong).as("dr"), lit(dc.toLong).as("dc")))): _*)
    val p = points.select(col(pointKey), col("latC0").as("p_lat"),
        col("lonC0").as("p_lon"), pr.as("p_r"), pc.as("p_c"))
      .withColumn("o", explode(offsets))
      .select(col(pointKey), col("p_lat"), col("p_lon"),
        (col("p_r") + col("o.dr")).as("cell_r"),
        (col("p_c") + col("o.dc")).as("cell_c"))
    val joined = q.join(p, Seq("cell_r", "cell_c"))
      .withColumn("dist2",
        (col("q_lat") - col("p_lat")) * (col("q_lat") - col("p_lat"))
          + (col("q_lon") - col("p_lon")) * (col("q_lon") - col("p_lon")))
    val w = Window.partitionBy(col(queryKey))
    joined
      .withColumn("n_candidates", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(
        w.orderBy(col("dist2"), col(pointKey))))
      .filter(col("__rn") === 1)
      .select(col(queryKey), col(pointKey), col("dist2"),
        col("n_candidates"))
  }

  /** Per-cell point density: count plus exact (order-independent)
    * min/max of `measure`. One shuffle on the cell id. */
  def cellDensity(df: DataFrame, measure: Column,
                  cellCenti: Int = 1000): DataFrame = {
    val (r, c) = cellCols(cellCenti)
    df.select(r.as("cell_r"), c.as("cell_c"), measure.as("m"))
      .groupBy("cell_r", "cell_c")
      .agg(count(lit(1)).as("n_points"),
        min(col("m")).as("min_measure"),
        max(col("m")).as("max_measure"))
  }

  /** Assign points to rectangular fences (`lat_lo..lat_hi` ×
    * `lon_lo..lon_hi`, centidegrees, bounds inclusive).
    *
    * Scale: instead of a nested-loop BETWEEN join, each fence is exploded
    * onto the `bandCenti`-sized latitude bands it overlaps (a few rows per
    * fence when bands ≳ fence height) and the join becomes an equi-join on
    * the band id with a residual range filter — the same binning strategy
    * as [[RangeJoin]], applied to the latitude dimension.
    */
  def geofenceAssign(points: DataFrame, pointKey: String,
                     fences: DataFrame, fenceKey: String,
                     bandCenti: Int = 1000): DataFrame = {
    val f = fences.select(col(fenceKey), col("lat_lo"), col("lat_hi"),
        col("lon_lo"), col("lon_hi"))
      .withColumn("band", explode(sequence(
        idiv(col("lat_lo"), bandCenti), idiv(col("lat_hi"), bandCenti))))
    points
      .select(col(pointKey), col("latC0"), col("lonC0"),
        idiv(col("latC0"), bandCenti).as("band"))
      .join(f, Seq("band"))
      .filter(col("latC0").between(col("lat_lo"), col("lat_hi"))
        && col("lonC0").between(col("lon_lo"), col("lon_hi")))
      .select(col(fenceKey), col(pointKey), col("latC0"), col("lonC0"))
  }
}
