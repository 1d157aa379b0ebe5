package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation / label-QA operators for training-data pipelines: retrieval
  * ranking metrics (MRR / hit@k / NDCG@k), inter-annotator agreement
  * (Cohen's kappa), and nearest-centroid classifier evaluation
  * (per-class precision / recall / F1).
  *
  * These close the loop the reference's dashboard closes for sales data
  * (reference: KPI views, SQLproject1.sql:680-736): once a corpus has
  * labels, embeddings, and retrieval indexes, the pipeline needs
  * first-class queries that measure how good they are.
  *
  * Numeric discipline (the psiDrift/labelCentroidCosine contract): every
  * accumulated quantity is an exact integer (quantized dots, confusion
  * counts, floor-scaled log discounts); doubles appear only in final
  * single divisions / sqrt of those integers, which IEEE rounds
  * identically in any engine — so results hash-match DuckDB bit-for-bit.
  */
object Eval {

  /** floor(x * qScale) per slot — the labelCentroidCosine quantization. */
  private def quantize(emb: Column, qScale: Int): Column =
    transform(emb, x => floor(x.cast("double") * lit(qScale.toDouble)).cast("long"))

  /** Binary-gain DCG discount constants for ranks 1..k (2^30-scaled).
    * Exposed so query oracles can embed the identical literals. */
  def discountTable(k: Int): Array[Long] =
    (1 to k).map(r =>
      math.floor(1073741824.0 / (math.log(r + 1.0) / math.log(2.0))).toLong).toArray

  /** Retrieval eval: rank the corpus for each query vector by exact
    * quantized cosine and score the ranking against same-label relevance.
    *
    * Emits one row per query: `q_id, label, n_rel, hit1, hits_k,
    * first_rel_rank, rr, dcg, ndcg` where relevance = "corpus vector has
    * the query's label", `rr` is the within-top-k reciprocal rank (0 when
    * no relevant vector ranks <= k), and `ndcg` uses binary-gain DCG with
    * the discount table D(r) = floor(2^30 / log2(r+1)) accumulated as
    * BIGINT (null when the query's label has no other members).
    *
    * Scale: the corpus is scanned once and never re-shuffled; the query
    * side is guarded by the similarity broadcast cap, so the join is a
    * broadcast hash join producing |corpus| x |queries| scored rows that
    * immediately collapse through a WindowGroupLimit top-k (rank <= k is
    * pushed below the exchange); label counts and the rank spine are
    * label-cardinality / k-sized broadcasts.
    */
  def rankingMetrics(embeddings: DataFrame, idCol: String, embCol: String,
                     labelCol: String, queryPredicate: Column, k: Int = 10,
                     qScale: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.GraftExtensions.register(embeddings.sparkSession)
    def idot(a: Column, b: Column): Column = call_function("q8_dot", a, b)
    // discount table D(r) = floor(2^30 / log2(r+1)), materialized as Long
    // LITERALS so both engines index the same constants instead of racing
    // their libm log2 implementations at a floor boundary
    val discounts = discountTable(k)
    def discount(rank: Column): Column =
      element_at(lit(discounts), rank.cast("int"))

    val corpus = embeddings
      .filter(col(labelCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).as("lbl"),
        quantize(col(embCol), qScale).as("__q"))
      .withColumn("__nn", idot(col("__q"), col("__q")))
      .filter(col("__nn") > 0)

    val queries = Similarity.requireBroadcastable(
      corpus.filter(queryPredicate)
        .select(col("id").as("q_id"), col("lbl").as("q_lbl"),
          col("__q").as("__qa"), col("__nn").as("__na")),
      "rankingMetrics query side (queryPredicate)",
      "Tighten the predicate; ranking metrics are defined per query, so " +
        "sample the query set rather than ranking for every vector.")

    // n_rel from label counts (self excluded) — no second corpus pass at
    // the pair grain
    val labelCounts = corpus.groupBy(col("lbl")).agg(count(lit(1)).as("__c"))
    val withRel = queries
      .join(broadcast(labelCounts), col("q_lbl") === col("lbl"))
      .select(col("q_id"), col("q_lbl"), col("__qa"), col("__na"),
        (col("__c") - 1).as("n_rel"))

    val scored = corpus
      .join(broadcast(withRel), col("id") =!= col("q_id"))
      .select(col("q_id"), col("q_lbl"), col("n_rel"), col("id"), col("lbl"),
        (idot(col("__q"), col("__qa")).cast("double") /
          (sqrt(col("__nn").cast("double")) * sqrt(col("__na").cast("double"))))
          .as("cos"))
    val ranked = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .withColumn("rel", (col("lbl") === col("q_lbl")).cast("int"))

    val perQuery = ranked.groupBy(col("q_id"))
      .agg(
        first(col("q_lbl")).as("label"),
        first(col("n_rel")).as("n_rel"),
        max(when(col("rank") === 1, col("rel")).otherwise(lit(0))).as("hit1"),
        sum(col("rel")).cast("long").as("hits_k"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel_rank"),
        sum(when(col("rel") === 1, discount(col("rank")))
          .otherwise(lit(0L))).as("dcg"))

    // ideal DCG: all relevant stacked at ranks 1..min(n_rel, k)
    val spine = embeddings.sparkSession.range(1, k + 1L)
      .select(col("id").cast("int").as("i"))
    val idcg = perQuery.select(col("q_id"), col("n_rel"))
      .join(broadcast(spine), col("i") <= least(col("n_rel"), lit(k)))
      .groupBy(col("q_id"))
      .agg(sum(discount(col("i"))).as("__idcg"))

    perQuery.join(idcg, Seq("q_id"), "left")
      .select(
        col("q_id"), col("label"), col("n_rel"), col("hit1"), col("hits_k"),
        col("first_rel_rank"),
        coalesce(lit(1.0) / col("first_rel_rank").cast("double"), lit(0.0))
          .as("rr"),
        col("dcg"),
        when(col("__idcg").isNull, lit(null).cast("double"))
          .otherwise(col("dcg").cast("double") / col("__idcg").cast("double"))
          .as("ndcg"))
  }

  /** Cohen's kappa between two categorical rating columns, with the full
    * confusion surface: one row per observed (rating_a, rating_b) cell
    * carrying the cell count, both marginals, and the dataset-level
    * observed agreement / expected agreement / kappa (constant across
    * rows — emitted per cell so the oracle hashes the whole surface).
    *
    * po = sum(diag)/N; pe = sum_c(rowMarg_c * colMarg_c)/N^2 accumulated
    * as exact BIGINT products; kappa = (po - pe) / (1 - pe), NULL at the
    * pe = 1 degeneracy (both raters constant). Rows where either rating
    * is NULL are excluded (an unrated item is not a disagreement).
    *
    * Scale: one groupBy at the cell grain (|A| x |B| cells), then all
    * arithmetic runs on the tiny cell frame; marginals and totals are
    * broadcast joins back onto it.
    */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df
      .select(aCol.as("rating_a"), bCol.as("rating_b"))
      .filter(col("rating_a").isNotNull && col("rating_b").isNotNull)
      .groupBy(col("rating_a"), col("rating_b"))
      .agg(count(lit(1)).as("n"))
    val margA = cells.groupBy(col("rating_a")).agg(sum(col("n")).as("n_a"))
    val margB = cells.groupBy(col("rating_b")).agg(sum(col("n")).as("n_b"))
    val withMarg = cells
      .join(broadcast(margA), Seq("rating_a"))
      .join(broadcast(margB), Seq("rating_b"))
    val totals = withMarg.agg(
      sum(col("n")).as("__N"),
      sum(when(col("rating_a") === col("rating_b"), col("n"))
        .otherwise(lit(0L))).as("__diag"))
    // pe numerator needs every (a,b) marginal product exactly once:
    // join the two marginal frames directly (cells may be sparse)
    val peNum = margA.crossJoin(margB)
      .filter(col("rating_a") === col("rating_b"))
      .agg(sum(col("n_a") * col("n_b")).as("__pe_num"))
    val po = col("__diag").cast("double") / col("__N").cast("double")
    val pe = col("__pe_num").cast("double") /
      (col("__N") * col("__N")).cast("double")
    withMarg
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(peNum))
      .select(
        col("rating_a"), col("rating_b"), col("n"), col("n_a"), col("n_b"),
        po.as("observed_agreement"),
        pe.as("expected_agreement"),
        when(pe === 1.0, lit(null).cast("double"))
          .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Nearest-centroid classifier eval: assign every vector to the label
    * centroid with the highest exact quantized cosine, then score the
    * assignment against the true labels — one row per class with
    * `label, support, tp, fp, fn, precision, recall, f1`.
    *
    * F1 uses the single-division form 2*tp / (2*tp + fp + fn) (equal to
    * the harmonic mean when defined, and well-defined whenever the class
    * appears in truth or predictions); precision / recall are NULL when
    * their denominator is 0.
    *
    * Scale: centroids derive from one posexplode pass (the
    * labelCentroidCosine component frame, labels x dim rows, broadcast);
    * per-vector scoring re-explodes the corpus once and combines at the
    * (vector, label) grain, so the corpus is never shuffled at the pair
    * grain and the argmax window partitions by vector id.
    */
  def nearestCentroidEval(embeddings: DataFrame, idCol: String,
                          embCol: String, labelCol: String,
                          qScale: Int = 1024): DataFrame = {
    require(qScale > 0 && (qScale & (qScale - 1)) == 0,
      s"qScale must be a positive power of two, got $qScale")
    val base = embeddings
      .filter(col(labelCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).as("lbl"),
        posexplode(quantize(col(embCol), qScale)).as(Seq("pos", "q")))
    val comp = base.groupBy(col("lbl"), col("pos"))
      .agg(sum(col("q")).as("c"))
    val cnorm = comp.groupBy(col("lbl")).agg(sum(col("c") * col("c")).as("cnn"))
    val vnorm = base.groupBy(col("id")).agg(sum(col("q") * col("q")).as("vnn"))

    val dots = base
      .join(broadcast(comp.select(col("lbl").as("cand"), col("pos"), col("c"))),
        Seq("pos"))
      .groupBy(col("id"), col("cand"))
      .agg(first(col("lbl")).as("truth"), sum(col("q") * col("c")).as("dot"))
    val scoredRaw = dots
      .join(broadcast(cnorm.select(col("lbl").as("cand"), col("cnn"))),
        Seq("cand"))
      .join(vnorm, Seq("id"))
      .filter(col("vnn") > 0 && col("cnn") > 0)
    val predicted = scoredRaw
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("vnn").cast("double")) * sqrt(col("cnn").cast("double"))))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cand").asc)))
      .filter(col("__rk") === 1)
      .select(col("id"), col("truth"), col("cand").as("pred"))

    val classes = predicted.select(col("truth").as("label")).distinct()
      .union(predicted.select(col("pred").as("label")).distinct())
      .distinct()
    val truthSide = predicted.groupBy(col("truth").as("label"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("pred") === col("truth"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") =!= col("truth"), 1L).otherwise(0L)).as("fn"))
    val predSide = predicted.groupBy(col("pred").as("label"))
      .agg(sum(when(col("pred") =!= col("truth"), 1L).otherwise(0L)).as("fp"))
    classes
      .join(truthSide, Seq("label"), "left")
      .join(predSide, Seq("label"), "left")
      .select(
        col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") === 0, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double")))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") /
            (col("tp") + col("fn")).cast("double")))
      .withColumn("f1",
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0,
          lit(null).cast("double"))
          .otherwise((lit(2) * col("tp")).cast("double") /
            (lit(2) * col("tp") + col("fp") + col("fn")).cast("double")))
  }

  /** Margin-based uncertainty sampling: the `k` vectors whose top-2
    * label-centroid cosines are closest — the annotation-priority queue
    * of an active-learning loop (label what the model is least sure of).
    *
    * Emits (id, label, pred1, cos1, pred2, cos2, margin), ordered
    * selection = bottom-k by (margin asc, id asc). Same exactness
    * contract as [[nearestCentroidEval]]: integer dots/norms, one IEEE
    * division per cosine; margin is the difference of two bit-identical
    * doubles, so the selected set is engine-identical.
    *
    * Scale: the centroid frame (labels × dim) broadcasts; the corpus is
    * exploded once; the per-vector top-2 is a rank-limited window
    * (WindowGroupLimit prunes before the exchange); the global bottom-k
    * is a TakeOrdered, never a full sort. */
  def uncertaintySample(embeddings: DataFrame, idCol: String,
                        embCol: String, labelCol: String, k: Int,
                        qScale: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(qScale > 0 && (qScale & (qScale - 1)) == 0,
      s"qScale must be a positive power of two, got $qScale")
    val base = embeddings
      .filter(col(labelCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).as("lbl"),
        posexplode(quantize(col(embCol), qScale)).as(Seq("pos", "q")))
    val comp = base.groupBy(col("lbl"), col("pos"))
      .agg(sum(col("q")).as("c"))
    val cnorm = comp.groupBy(col("lbl")).agg(sum(col("c") * col("c")).as("cnn"))
    val vnorm = base.groupBy(col("id")).agg(sum(col("q") * col("q")).as("vnn"))
    val dots = base
      .join(broadcast(comp.select(col("lbl").as("cand"), col("pos"), col("c"))),
        Seq("pos"))
      .groupBy(col("id"), col("cand"))
      .agg(min(col("lbl")).as("truth"), sum(col("q") * col("c")).as("dot"))
    val scored = dots
      .join(broadcast(cnorm.select(col("lbl").as("cand"), col("cnn"))),
        Seq("cand"))
      .join(vnorm, Seq("id"))
      .filter(col("vnn") > 0 && col("cnn") > 0)
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("vnn").cast("double")) * sqrt(col("cnn").cast("double"))))
    val top2 = scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cand").asc)))
      .filter(col("__rk") <= 2)
      .groupBy(col("id"))
      .agg(min(col("truth")).as("label"),
        max(when(col("__rk") === 1, col("cand"))).as("pred1"),
        max(when(col("__rk") === 1, col("cos"))).as("cos1"),
        max(when(col("__rk") === 2, col("cand"))).as("pred2"),
        max(when(col("__rk") === 2, col("cos"))).as("cos2"))
      .filter(col("pred2").isNotNull)
      .withColumn("margin", col("cos1") - col("cos2"))
    top2.orderBy(col("margin").asc, col("id").asc).limit(k)
  }

  /** Label-separability report: over LSH-bucketed candidate pairs, the
    * histogram of pairwise cosines split by same-label vs cross-label —
    * the "are my labels separable in this embedding space" readout a
    * contrastive-training or mislabel audit starts from. Well-separated
    * labels put same-label mass in high-cosine bins and cross-label
    * mass low; heavy overlap means the space (or the labels) are noisy.
    *
    * Determinism: cosines come from the codegen `vec_cosine` expression
    * (strict in-order fold, the q37/q98 oracle-proven path) and bin by
    * `floor(cos·bins)` — identical doubles, identical floors.
    * Scale: candidates are same-bucket LSH pairs (never all-pairs);
    * the histogram is a map-combined groupBy over 2·2·bins cells. */
  def labelSeparability(embeddings: DataFrame, idCol: String,
                        embCol: String, labelCol: String, numPlanes: Int,
                        dim: Int, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    graft.GraftExtensions.register(embeddings.sparkSession)
    val b = Similarity.lshBucketed(embeddings, idCol, embCol, numPlanes,
      dim)
    val lab = embeddings.select(col(idCol), col(labelCol).as("__lab"),
      col(embCol).as("__e"))
    val pairs = b.as("x").join(b.as("y"),
        col(s"x.bucket") === col(s"y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .join(lab.select(col(idCol).as("a_id"), col("__lab").as("__la"),
        col("__e").as("__ea")), Seq("a_id"))
      .join(lab.select(col(idCol).as("b_id"), col("__lab").as("__lb"),
        col("__e").as("__eb")), Seq("b_id"))
    pairs
      .withColumn("__cos", call_function("vec_cosine",
        col("__ea"), col("__eb")))
      .filter(col("__cos").isNotNull)
      .withColumn("cos_bin",
        least(floor(col("__cos") * bins).cast("int"), lit(bins - 1)))
      .withColumn("same_label", col("__la") === col("__lb"))
      .groupBy(col("same_label"), col("cos_bin"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Leakage-free (out-of-fold) target encoding: each (feature value,
    * fold) cell's encoding is the target mean over all OTHER folds —
    * the K-fold trick that lets mean-encodings be used as features
    * without the row's own label leaking into it. NULL when the value
    * occurs only inside this fold (no out-of-fold evidence).
    *
    * Exactness: per-cell and per-value sums are DECIMAL(38,0) cents;
    * each encoding is one double division. Scale: one map-combined
    * groupBy to (value, fold) cells + one per-value window over the
    * cells frame. */
  def targetEncodeOof(df: DataFrame, value: Column, fold: Column,
                      yCents: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df
      .select(value.as("value"), fold.as("fold"),
        yCents.cast("long").as("__y"))
      .filter(col("value").isNotNull && col("__y").isNotNull)
      .groupBy(col("value"), col("fold"))
      .agg(count(lit(1)).as("n_in_fold"),
        sum(col("__y").cast(dec)).as("__s"))
    val w = Window.partitionBy(col("value"))
    cells
      .withColumn("__ct", sum(col("n_in_fold")).over(w))
      .withColumn("__st", sum(col("__s")).over(w))
      .withColumn("encoding",
        when(col("__ct") > col("n_in_fold"),
          (col("__st") - col("__s")).cast("double")
            / ((col("__ct") - col("n_in_fold")) * 100).cast("double")))
      .select(col("value"), col("fold"), col("n_in_fold"), col("encoding"))
  }

  /** Cumulative gains / lift chart: rank by score descending, cut into
    * `tiles` equal tiles (ntile semantics — identical in every engine
    * given the deterministic (score, id) order), and report per tile
    * the cumulative capture rate of positives and the lift over random
    * targeting — the "top 20% of scores captures 64% of converters"
    * table. Every ratio is one exact-integer double division.
    *
    * Scale: one global rank window over the scored-entity frame (swap
    * in Scale.globalRowNumber's telescoped numbering for billion-row
    * frames), then a tiles-sized aggregate. */
  def gainsChart(scored: DataFrame, idCol: String, score: Column,
                 label: Column, tiles: Int = 10): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2, got $tiles")
    val w = Window.orderBy(score.desc, col(idCol))
    val tiled = scored
      .withColumn("__pos", when(label, 1L).otherwise(0L))
      .withColumn("tile", ntile(tiles).over(w))
    val perTile = tiled.groupBy(col("tile"))
      .agg(count(lit(1)).as("n"), sum(col("__pos")).as("pos"))
    val all = Window.partitionBy(lit(1))
    val cumW = all.orderBy(col("tile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTile
      .withColumn("__cn", sum(col("n")).over(cumW))
      .withColumn("__cp", sum(col("pos")).over(cumW))
      .withColumn("__tn", sum(col("n")).over(all))
      .withColumn("__tp", sum(col("pos")).over(all))
      .select(col("tile"), col("n"), col("pos"),
        (col("__cp").cast("double") / col("__tp").cast("double"))
          .as("cum_capture"),
        ((col("__cp") * col("__tn")).cast("double")
          / (col("__cn") * col("__tp")).cast("double")).as("lift"))
  }

  /** Split-conformal prediction intervals around a per-group mean
    * predictor, with the guaranteed-coverage quantile rule
    * `k = ⌈(100−alphaPct)·(n_cal+1)/100⌉` (clamped to n_cal).
    *
    * Rows split deterministically by md5 bucket of `keyCol`
    * (train < trainPct ≤ calib < trainPct+calibPct ≤ test). The
    * predictor is the train-split group mean; the conformal radius is
    * the k-th smallest absolute calibration residual; reported
    * coverage is the fraction of test rows inside ±radius.
    *
    * Exact-integer discipline: residuals are compared as
    * `|n_tr·cents − S_tr|` (scaled by the train count, exact BIGINT —
    * same ordering as the rational residual, no division until the
    * final per-group output columns). The k-th order statistic and the
    * coverage count are therefore engine-exact; `center`, `q_hat`, and
    * `coverage` are each one correctly-rounded double division.
    *
    * Scale: one scan to split, one broadcast of the per-group train
    * moments (|groups| rows), one per-group window for the order
    * statistic, one aggregate for coverage. Nothing quadratic, nothing
    * driver-side. */
  def conformalIntervals(df: DataFrame, groupCols: Seq[String],
                         keyCol: String, valueCents: Column,
                         trainPct: Int = 60, calibPct: Int = 20,
                         alphaPct: Int = 10): DataFrame = {
    require(trainPct > 0 && calibPct > 0 && trainPct + calibPct < 100,
      s"bad split percentages ($trainPct, $calibPct)")
    require(alphaPct > 0 && alphaPct < 100, s"bad alphaPct $alphaPct")
    val groups = groupCols.map(col)
    val bucket = conv(substring(md5(col(keyCol).cast("string")), 1, 4),
      16, 10).cast("int") % 100
    val base = df.select(groups :+ col(keyCol) :+
      valueCents.cast("long").as("__y") :+ bucket.as("__b"): _*)
    val tr = base.filter(col("__b") < trainPct)
      .groupBy(groups: _*)
      .agg(count(lit(1)).as("n_train"), sum(col("__y")).as("__s"))
    val rest = base.filter(col("__b") >= trainPct)
      .join(broadcast(tr), groupCols)
      .withColumn("__r", abs(col("n_train") * col("__y") - col("__s")))
    val calW = Window.partitionBy(groups: _*)
    val qhat = rest.filter(col("__b") < trainPct + calibPct)
      .withColumn("__rn", row_number().over(
        calW.orderBy(col("__r"), col(keyCol))))
      .withColumn("n_calib", count(lit(1)).over(calW))
      .withColumn("__k", least(col("n_calib"),
        (((lit(100L - alphaPct) * (col("n_calib") + 1) + 99)
          - pmod(lit(100L - alphaPct) * (col("n_calib") + 1) + 99, lit(100L)))
          / 100).cast("long")))
      .filter(col("__rn") === col("__k"))
      .select(groups :+ col("n_calib") :+ col("__r").as("__q"): _*)
    val cov = rest.filter(col("__b") >= trainPct + calibPct)
      .join(broadcast(qhat.select(groups :+ col("__q"): _*)), groupCols)
      .groupBy(groups: _*)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__r") <= col("__q"), 1L).otherwise(0L))
          .as("__covered"))
    tr.join(qhat, groupCols).join(cov, groupCols)
      .select(groups ++ Seq(
        col("n_train"), col("n_calib"), col("n_test"),
        (col("__s").cast("double")
          / (col("n_train") * 100).cast("double")).as("center"),
        (col("__q").cast("double")
          / (col("n_train") * 100).cast("double")).as("q_hat"),
        (col("__covered").cast("double") / col("n_test").cast("double"))
          .as("coverage")): _*)
  }
}
