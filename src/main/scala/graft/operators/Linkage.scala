package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probabilistic record linkage scoring (Fellegi–Sunter).
  *
  * The reference resolves entities by exact key equality (its MERGE
  * natural keys); real-world linkage weighs EVIDENCE per field: how much
  * more likely is agreement on a field among true matches (m-probability)
  * than among non-matches (u-probability)? The log of m/u is the field's
  * match weight; scoring a candidate pair sums the weights of its
  * agreeing fields. This operator estimates m and u from labeled pair
  * sets — the supervised variant of FS estimation (the unsupervised EM
  * variant iterates exactly this aggregation with soft labels).
  *
  * Exact-integer discipline: agreement tallies accumulate as BIGINT with
  * add-one (Laplace) smoothing folded in as integer `+1` / `+2`; m, u
  * and the weight RATIO (m/u — the log is left to the caller, same
  * convention as the q57 raw-ratio idf) are each ONE correctly-rounded
  * double division / quotient of exact BIGINT products, so results are
  * bit-identical across engines.
  */
object Linkage {

  /** Estimate per-field m/u probabilities and match-weight ratios.
    *
    * `pairs` carries one row per labeled candidate pair with a boolean
    * `isMatchCol` and one boolean agreement column per field in
    * `fields`. NULL agreement (field missing on either side) counts as
    * disagreement — the conservative linkage convention.
    *
    * Scale: one unpivot (explode over a `fields.size` literal array —
    * rows × |fields|, map-side only) into one map-combined groupBy over
    * |fields| groups. No joins, no windows; the output frame is
    * |fields| rows. */
  def fellegiSunterWeights(pairs: DataFrame, isMatchCol: String,
                           fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val long1 = lit(1L)
    val unpivoted = pairs.select(
      col(isMatchCol).as("__m"),
      explode(array(fields.map(f => struct(lit(f).as("field"),
        coalesce(col(f), lit(false)).as("__agree"))): _*)).as("__f"))
      .select(col("__m"), col("__f.field").as("field"),
        col("__f.__agree").as("__agree"))
    unpivoted.groupBy(col("field"))
      .agg(
        sum(when(col("__m") && col("__agree"), long1).otherwise(0L))
          .as("m_agree"),
        sum(when(col("__m"), long1).otherwise(0L)).as("n_match"),
        sum(when(!col("__m") && col("__agree"), long1).otherwise(0L))
          .as("u_agree"),
        sum(when(!col("__m"), long1).otherwise(0L)).as("n_unmatch"))
      .select(col("field"), col("m_agree"), col("n_match"),
        col("u_agree"), col("n_unmatch"),
        ((col("m_agree") + 1L).cast("double") /
          (col("n_match") + 2L).cast("double")).as("m_prob"),
        ((col("u_agree") + 1L).cast("double") /
          (col("n_unmatch") + 2L).cast("double")).as("u_prob"),
        (((col("m_agree") + 1L) * (col("n_unmatch") + 2L)).cast("double") /
          ((col("n_match") + 2L) * (col("u_agree") + 1L)).cast("double"))
          .as("weight_ratio"))
  }
}
