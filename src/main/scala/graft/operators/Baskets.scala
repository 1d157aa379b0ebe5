package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: which items appear together in the same
  * group (order, session, document)?
  *
  * The pair self-join's work is Σ per-group |items|², so ONE pathological
  * group (a crawler session with 10⁵ items) would dominate the whole
  * job. `maxItemsPerGroup` bounds that: groups with more distinct items
  * are DROPPED ENTIRELY (documented semantics — a cap-to-first-k would
  * silently bias pair counts toward the kept items, while dropping the
  * group keeps every reported count exact over the retained groups). The
  * surviving join is bounded by groups × cap².
  */
object Baskets {

  /** Distinct (group, item) rows with over-cap groups dropped whole —
    * the shared prep for [[coOccurrence]] and [[associationRules]]. */
  private def sizedItems(df: DataFrame, groupCol: String, itemCol: String,
                         maxItemsPerGroup: Int): DataFrame = {
    require(maxItemsPerGroup >= 2,
      s"maxItemsPerGroup must be >= 2, got $maxItemsPerGroup")
    df.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("__n") <= maxItemsPerGroup)
      .select(col("g"), col("item"))
  }

  /** Top-k co-occurring item pairs across groups. Emits
    * (item_a, item_b, n_groups, rank), item_a < item_b, rank by
    * (n_groups desc, item_a, item_b). */
  def coOccurrence(df: DataFrame, groupCol: String, itemCol: String,
                   maxItemsPerGroup: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val sized = sizedItems(df, groupCol, itemCol, maxItemsPerGroup)
    val pairs = sized.as("a")
      .join(sized.as("b"),
        col("a.g") === col("b.g") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_groups"))
    // top-k as orderBy + limit (TakeOrderedAndProject: per-partition
    // partial top-k, k-row driver merge), NOT a global row_number window
    // — with a high-cardinality item column the pair aggregate is
    // items²-sized and a single-task window sort over it is the exact
    // hazard the group cap exists to avoid; the rank window then runs
    // over only the k surviving rows
    pairs
      .orderBy(col("n_groups").desc, col("item_a"), col("item_b"))
      .limit(topK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_groups").desc, col("item_a"), col("item_b")))
        .cast("int"))
  }

  /** Directed association rules antecedent→consequent over the same
    * capped-basket universe: support = P(both), confidence =
    * P(consequent | antecedent), lift = confidence / P(consequent). Both
    * directions of every co-occurring pair are emitted (confidence is
    * asymmetric), filtered to rules seen in at least `minPairGroups`
    * baskets. All three metrics are single divisions over exact integer
    * products — deterministic.
    *
    * Scale: the pair join is the [[coOccurrence]] bounded self-join; the
    * basket total is a 1-row broadcast and item supports join back on
    * the (small) item key. */
  def associationRules(df: DataFrame, groupCol: String, itemCol: String,
                       maxItemsPerGroup: Int,
                       minPairGroups: Long = 1L): DataFrame = {
    require(minPairGroups >= 1, s"minPairGroups must be >= 1")
    val sized = sizedItems(df, groupCol, itemCol, maxItemsPerGroup)
    val total = sized.select(col("g")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = sized.groupBy(col("item"))
      .agg(count(lit(1)).as("__ni"))
    val pairs = sized.as("a")
      .join(sized.as("b"),
        col("a.g") === col("b.g") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("__ia"), col("b.item").as("__ib"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairGroups)
    val directed = pairs
      .select(col("__ia").as("antecedent"), col("__ib").as("consequent"),
        col("n_both"))
      .unionByName(pairs.select(col("__ib").as("antecedent"),
        col("__ia").as("consequent"), col("n_both")))
    directed
      .join(itemCounts.select(col("item").as("antecedent"),
        col("__ni").as("n_antecedent")), Seq("antecedent"))
      .join(itemCounts.select(col("item").as("consequent"),
        col("__ni").as("n_consequent")), Seq("consequent"))
      .crossJoin(broadcast(total))
      .withColumn("support",
        col("n_both").cast("double") / col("n_baskets").cast("double"))
      .withColumn("confidence",
        col("n_both").cast("double") / col("n_antecedent").cast("double"))
      .withColumn("lift",
        (col("n_both") * col("n_baskets")).cast("double") /
          (col("n_antecedent") * col("n_consequent")).cast("double"))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_antecedent"), col("n_consequent"), col("n_baskets"),
        col("support"), col("confidence"), col("lift"))
  }

  /** Item-item cosine similarity over the (group × item) incidence
    * matrix — the item-based collaborative-filtering artifact:
    * sim(a,b) = cooc(a,b) / √(n_a·n_b) where n_i counts groups holding
    * item i. Emits each item's top-`k` neighbors (both directions of
    * every pair, since neighbor lists are per-item).
    *
    * Exactness: cooc and the n_a·n_b product are exact BIGINTs; the
    * cosine is one sqrt + one division of their doubles — engine-
    * bit-identical. Ties → min neighbor id.
    *
    * Scale: same capped-basket posture as [[coOccurrence]] (Σ basket²
    * bounded by the group cap); supports join back on the small item
    * key; the per-item top-k is a rank-limited window. */
  def itemSimilarity(df: DataFrame, groupCol: String, itemCol: String,
                     maxItemsPerGroup: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sized = sizedItems(df, groupCol, itemCol, maxItemsPerGroup)
    val supports = sized.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val half = sized.as("a")
      .join(sized.as("b"),
        col("a.g") === col("b.g") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("cooc"))
    val sym = half.unionByName(half.select(
      col("item_b").as("item_a"), col("item_a").as("item_b"), col("cooc")))
    sym
      .join(supports.select(col("item").as("item_a"), col("n").as("n_item")),
        Seq("item_a"))
      .join(supports.select(col("item").as("item_b"),
        col("n").as("n_neighbor")), Seq("item_b"))
      .withColumn("cosine", col("cooc").cast("double") /
        sqrt((col("n_item") * col("n_neighbor")).cast("double")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("item_a"))
          .orderBy(col("cosine").desc, col("item_b"))).cast("int"))
      .filter(col("rank") <= k)
      .select(col("item_a").as("item"), col("item_b").as("neighbor"),
        col("cooc"), col("n_item"), col("n_neighbor"), col("cosine"),
        col("rank"))
  }

  /** Frequent item TRIPLES with A-priori candidate pruning: a triple is
    * counted only when all three of its pairs are themselves frequent
    * (the downward-closure property), so the 3-way extension join runs
    * over frequent-pair survivors instead of all cap³ combinations —
    * the property that makes level-wise mining feasible at scale.
    *
    * Emits (item_a, item_b, item_c, n_groups, support) with
    * a < b < c, n_groups ≥ minSupport, support = n_groups / total
    * retained baskets (one exact division).
    *
    * Scale: pair counting is the bounded [[coOccurrence]] self-join;
    * candidate extension joins frequent pairs (a,b)×(a,c) — quadratic
    * only in the FREQUENT pair list — and both prune semi-joins and the
    * final count join are equi-joins on (group/item) keys. */
  def frequentTriples(df: DataFrame, groupCol: String, itemCol: String,
                      maxItemsPerGroup: Int, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val sized = sizedItems(df, groupCol, itemCol, maxItemsPerGroup)
    val nBaskets = sized.select(col("g")).distinct()
      .agg(count(lit(1)).as("__nb"))
    val gp = sized.as("a")
      .join(sized.as("b"),
        col("a.g") === col("b.g") && col("a.item") < col("b.item"))
      .select(col("a.g").as("g"), col("a.item").as("ia"),
        col("b.item").as("ib"))
    val freqPairs = gp.groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSupport)
      .select(col("ia"), col("ib"))
    // A-priori closure: (a,b,c) is a candidate iff (a,b), (a,c), (b,c)
    // are all frequent
    val cand = freqPairs.select(col("ia").as("a"), col("ib").as("b"))
      .join(freqPairs.select(col("ia").as("a"), col("ib").as("c")),
        Seq("a"))
      .filter(col("b") < col("c"))
      .join(freqPairs.select(col("ia").as("b"), col("ib").as("c")),
        Seq("b", "c"), "left_semi")
    gp.join(freqPairs.select(col("ia"), col("ib")), Seq("ia", "ib"),
        "left_semi")
      .join(sized.select(col("g"), col("item").as("ic")), Seq("g"))
      .filter(col("ib") < col("ic"))
      .select(col("g"), col("ia").as("a"), col("ib").as("b"),
        col("ic").as("c"))
      .join(cand, Seq("a", "b", "c"), "left_semi")
      .groupBy(col("a").as("item_a"), col("b").as("item_b"),
        col("c").as("item_c"))
      .agg(count(lit(1)).as("n_groups"))
      .filter(col("n_groups") >= minSupport)
      .crossJoin(broadcast(nBaskets))
      .withColumn("support",
        col("n_groups").cast("double") / col("__nb").cast("double"))
      .drop("__nb")
  }
}
