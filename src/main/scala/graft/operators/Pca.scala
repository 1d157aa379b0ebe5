package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Top principal component by deterministic integer power iteration.
  *
  * Float power iteration is not oracle-checkable (accumulation order
  * changes the low bits every run), so the whole pipeline is exact
  * integer arithmetic end to end:
  *
  *  1. components quantized to `q = floor(x · qScale)` (exact, same as
  *     [[Similarity.quantizedCovariance]]);
  *  2. the scatter matrix `M = n·S_ij − s_i·s_j` (covariance × n², an
  *     eigenvector-preserving scaling) assembled from distributed BIGINT
  *     sums;
  *  3. power iteration on integers: `w = M·v`, then renormalize to the
  *     2^20 grid with `v′ = floorDiv(w · 2^20, max|w|)` — every engine
  *     that replays these steps (the DuckDB oracle unrolls them as CTEs)
  *     produces bit-identical vectors;
  *  4. sign fixed by making the largest-|v| component (lowest position on
  *     ties) positive.
  *
  * Scale posture: the data-sized work — quantization, the d² pair sums,
  * the projection — is fully distributed; only the d×d integer scatter
  * matrix (a few KB regardless of corpus size) is collected for the
  * iteration, and the resulting d-vector is broadcast back into the
  * projection scan. Nothing proportional to the row count ever reaches
  * the driver.
  */
object Pca {

  private val Grid = 1L << 20

  private def floorDiv(a: BigInt, m: BigInt): BigInt = (a - a.mod(m)) / m

  /** Distributed moment sums → driver-side integer power iteration.
    * Returns (v on the 2^20 grid, n, per-position sums s, scatter
    * matrix M) — M is returned so callers never pay the distributed
    * pair-sum pass twice. Empty vector when the scatter matrix is
    * identically zero (degenerate input). */
  private[operators] def iterate(embeddings: DataFrame, idCol: String,
                                 embCol: String, qScale: Int, iters: Int)
      : (Array[Long], Long, Array[Long], Array[Array[BigInt]]) = {
    val cells = Similarity.quantizedCovariance(embeddings, idCol, embCol,
      qScale).select("i", "j", "n", "s_i", "s_j", "s_ij").collect()
    if (cells.isEmpty) return (Array.empty, 0L, Array.empty, Array.empty)
    val n = cells.head.getAs[Long]("n")
    val dim = cells.map(_.getAs[Int]("j")).max + 1
    val m = Array.ofDim[BigInt](dim, dim)
    val s = Array.ofDim[Long](dim)
    cells.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val v = BigInt(n) * BigInt(r.getAs[Long]("s_ij")) -
        BigInt(r.getAs[Long]("s_i")) * BigInt(r.getAs[Long]("s_j"))
      m(i)(j) = v
      m(j)(i) = v
      s(i) = r.getAs[Long]("s_i")
      s(j) = r.getAs[Long]("s_j")
    }
    var v = Array.fill(dim)(BigInt(Grid))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + m(i)(j) * v(j)))
      val mx = w.map(_.abs).max
      if (mx == 0) return (Array.empty, n, s, m) // degenerate: zero scatter
      v = w.map(wi => floorDiv(wi * Grid, mx))
      it += 1
    }
    // sign convention: largest |v| (lowest pos on ties) points positive
    val anchor = v.zipWithIndex.maxBy { case (x, p) => (x.abs, -p) }._1
    if (anchor < 0) v = v.map(-_)
    (v.map(_.toLong), n, s, m)
  }

  /** (pos, v20, rayleigh): the top-eigenvector components on the 2^20
    * integer grid plus the Rayleigh quotient v'Mv / v'v of the scatter
    * matrix (one exact integer division to double at the end). */
  def topComponent(embeddings: DataFrame, idCol: String, embCol: String,
                   qScale: Int = 1024, iters: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (v, _, _, m) = iterate(embeddings, idCol, embCol, qScale, iters)
    if (v.isEmpty)
      return Seq.empty[(Int, Long, Double)].toDF("pos", "v20", "rayleigh")
    // one more exact matvec (driver-side, on the already-collected M)
    // for the Rayleigh quotient
    val dim = v.length
    val num = (0 until dim).foldLeft(BigInt(0)) { (acc, i) =>
      acc + BigInt(v(i)) * (0 until dim).foldLeft(BigInt(0))((a, j) =>
        a + m(i)(j) * BigInt(v(j)))
    }
    val den = v.foldLeft(BigInt(0))((a, x) => a + BigInt(x) * BigInt(x))
    val rayleigh = num.toDouble / den.toDouble
    v.zipWithIndex.map { case (x, p) => (p, x, rayleigh) }
      .toSeq.toDF("pos", "v20", "rayleigh")
  }

  /** Projection of every (centered) vector onto the top component:
    * score = (n·Σ q_j·v_j − Σ s_j·v_j) / (n · 2^20 · qScale). Exact
    * integer numerator/denominator, one double division per row. */
  def projectScores(embeddings: DataFrame, idCol: String, embCol: String,
                    qScale: Int = 1024, iters: Int = 20): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (v, n, s, _) = iterate(embeddings, idCol, embCol, qScale, iters)
    if (v.isEmpty) return Seq.empty[(Long, Double)].toDF(idCol, "score")
    val vArr = array(v.map(lit): _*)
    val sv = s.zip(v).foldLeft(BigInt(0)) { case (a, (si, vi)) =>
      a + BigInt(si) * BigInt(vi) }
    val dec = DecimalType(38, 0)
    val den = BigInt(n) * BigInt(Grid) * BigInt(qScale)
    embeddings.filter(col(embCol).isNotNull)
      .select(col(idCol),
        aggregate(
          zip_with(
            transform(col(embCol), x =>
              floor(x.cast("double") * lit(qScale.toDouble)).cast("long")),
            vArr, (q, w) => q * w),
          lit(0L), (acc, x) => acc + x).as("__qv"))
      .select(col(idCol),
        ((lit(n).cast(dec) * col("__qv").cast(dec)
          - lit(sv.toString).cast(dec)).cast("double")
          / lit(den.toString).cast(dec).cast("double")).as("score"))
  }
}
