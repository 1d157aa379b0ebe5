package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Hashing-trick vectorization (feature hashing): fixed-dimension sparse
  * feature vectors from unbounded token vocabularies, with no vocabulary
  * table at all — the step a 100 TB featurization pipeline runs instead
  * of a fit-then-transform vocabulary build (which would need a full
  * distinct shuffle plus a broadcast dictionary that may not fit).
  *
  * Bucket and sign come from md5 slices (the [[Sketches]] discipline:
  * reproducible in the DuckDB oracle), with independent salts so the
  * sign is not a function of the bucket. Signed counting keeps the
  * hashed inner products unbiased (Weinberger et al.'s signed hash
  * kernel) — collisions cancel in expectation instead of always adding.
  *
  * All weights are exact integers; nothing in the operator touches a
  * float, so the oracle comparison is exact.
  */
object Vectorize {

  private def nib16(salt: String, v: Column): Column =
    conv(substring(md5(concat(lit(salt), v)), 1, 4), 16, 10).cast("int")

  /** Sparse hashed bag-of-words: one row per (doc, bucket) with the
    * signed collision-cancelling weight and the raw token count.
    *
    * Scale: tokenize-explode then ONE map-combined groupBy on
    * (doc_id, bucket) — per-doc output is bounded by min(dl, dim). */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     dim: Int = 256): DataFrame = {
    require(dim >= 2 && dim <= 65536, s"dim must be in [2,65536], got $dim")
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .select(col("doc_id"),
        (nib16("b:", col("token")) % dim).as("bucket"),
        (when(nib16("s:", col("token")) % 2 === 0, 1L).otherwise(-1L))
          .as("sign"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("weight"), count(lit(1)).as("n_tokens"))
  }
}
