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

  /** Score candidate pairs by the product of per-field agreement
    * weights: score = Π (agree_f ? w_f : 1). The multiplicative FS
    * score without logs — the fold is a fixed-order row expression, so
    * the double product is deterministic and engine-identical (a
    * log-sum AGGREGATION would not be). Weights come from
    * [[fellegiSunterWeights]] (collect the |fields|-row frame) or
    * domain priors. */
  def scorePairs(pairs: DataFrame,
                 weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    val score = weights.foldLeft(lit(1.0)) { case (acc, (f, w)) =>
      acc * when(coalesce(col(f), lit(false)), lit(w)).otherwise(lit(1.0)) }
    pairs.withColumn("score", score)
  }

  /** End-to-end entity resolution: threshold the scored candidate
    * pairs into match edges, resolve transitive match groups
    * (A≈B≈C is one entity even if A,C never paired), and emit every
    * record with its entity id (= min member id), entity size, and a
    * canonical flag. The full linkage pipeline —
    * block → score → threshold → cluster → survivorship — as one call.
    *
    * Scale: edges are the thresholded candidate set (blocking-bounded);
    * component resolution runs over edges only; the records side
    * shuffles once for the label join (Clusters.connectedComponents
    * posture applies, including the reliable-checkpoint option). */
  def resolveEntities(records: DataFrame, idCol: String,
                      scoredPairs: DataFrame, threshold: Double,
                      checkpointDir: Option[String] = None): DataFrame = {
    val edges = scoredPairs.filter(col("score") >= threshold)
      .select(col("a_id"), col("b_id"))
    val labels = Clusters.connectedComponents(
      records.select(col(idCol)), idCol, edges, "a_id", "b_id",
      checkpointDir = checkpointDir)
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("entity_size"))
    labels.join(sizes, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id").as("entity_id"),
        col("entity_size"),
        (col(idCol) === col("cluster_id")).as("is_canonical"))
  }

  /** Blocked Jaro–Winkler pairing over a value column: pairs sharing a
    * lowercased `blockLen`-char prefix with |len diff| ≤ `maxLenDiff`,
    * scored by the codegen `jaro_winkler_ppm` expression (exact integer
    * ppm — see [[graft.expressions.JaroWinklerPpm]]), kept at
    * `>= minPpm`. Emits (a_value, b_value, jw_ppm) with a < b.
    *
    * Scale: the self-join is an equi-join on the prefix block key;
    * per-block cost is bounded by the block's size², the standard
    * blocked-linkage contract (choose blockLen so blocks stay small —
    * the q185 blocking-quality report measures exactly that). */
  def jaroWinklerPairs(df: DataFrame, valueCol: String,
                       blockLen: Int = 2, maxLenDiff: Int = 2,
                       minPpm: Long = 0L): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    val voc = df.filter(col(valueCol).isNotNull && length(col(valueCol)) > 0)
      .select(col(valueCol).as("v")).distinct()
      .withColumn("__blk", lower(substring(col("v"), 1, blockLen)))
    val a = voc.select(col("v").as("a_value"), col("__blk"))
    val b = voc.select(col("v").as("b_value"), col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("a_value") < col("b_value") &&
        abs(length(col("a_value")) - length(col("b_value"))) <= maxLenDiff)
      .withColumn("jw_ppm",
        call_function("jaro_winkler_ppm", col("a_value"), col("b_value")))
      .filter(col("jw_ppm") >= minPpm)
      .select(col("a_value"), col("b_value"), col("jw_ppm"))
  }

  /** Reciprocal best match: keep only pairs where each side is the
    * other's highest-scoring partner (ties broken to the
    * lexicographically smallest partner). The classic high-precision
    * filter on a scored candidate set — a record can have many
    * above-threshold partners, but mutual-argmax pairs are almost
    * always true matches.
    *
    * Input: (a_value, b_value, score) with a < b (each undirected pair
    * once). Output: the mutual pairs, same shape. Scale: one explode ×2
    * to symmetrize, one window argmax per side — no joins beyond the
    * final pair check. */
  def reciprocalBestMatch(pairs: DataFrame, scoreCol: String = "jw_ppm")
      : DataFrame = {
    val sym = pairs.select(col("a_value").as("src"),
        col("b_value").as("dst"), col(scoreCol))
      .unionAll(pairs.select(col("b_value").as("src"),
        col("a_value").as("dst"), col(scoreCol)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(col(scoreCol).desc, col("dst"))
    val best = sym.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("src"), col("dst"), col(scoreCol))
    best.alias("x").join(best.alias("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
      .filter(col("x.src") < col("x.dst"))
      .select(col("x.src").as("a_value"), col("x.dst").as("b_value"),
        col(s"x.$scoreCol").as(scoreCol))
  }

  /** Iterated mutual-best matching: repeat [[reciprocalBestMatch]] over
    * the still-unmatched records, `rounds` times. Round 1 is the
    * high-precision mutual-argmax set; each later round matches records
    * whose best partner was taken earlier — the distributed analogue of
    * greedy score-descending assignment (which is inherently
    * sequential), converging to a maximal matching as rounds grow.
    * Emits (a_value, b_value, score, round).
    *
    * Scale: per round, two windows and two anti-joins — all keyed, no
    * quadratic step beyond the input candidate set; the shrinking pair
    * frame is `localCheckpoint`ed per round (it feeds the next round
    * twice). */
  def iterativeMatching(pairs: DataFrame, scoreCol: String = "jw_ppm",
                        rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var remaining = pairs
      .select(col("a_value"), col("b_value"), col(scoreCol))
      .localCheckpoint(true)
    var acc: Option[DataFrame] = None
    (1 to rounds).foreach { r =>
      val matched = reciprocalBestMatch(remaining, scoreCol)
        .withColumn("round", lit(r))
        .localCheckpoint(true)
      acc = Some(acc.fold(matched)(_.unionByName(matched)))
      val used = matched.select(col("a_value").as("v"))
        .unionAll(matched.select(col("b_value").as("v")))
      remaining = remaining
        .join(used.withColumnRenamed("v", "a_value"), Seq("a_value"),
          "left_anti")
        .join(used.withColumnRenamed("v", "b_value"), Seq("b_value"),
          "left_anti")
        .select(col("a_value"), col("b_value"), col(scoreCol))
        .localCheckpoint(true)
    }
    acc.get
  }
}
