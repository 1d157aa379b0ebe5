package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.{Corpus, EventOps, Quality}

/** Round-5 wave 8: cohort LTV, A/B significance, global token-budget
  * selection, OOV-rate vocabulary coverage, bigram cross-entropy.
  */
object R5hQueries {

  /** Cohort LTV triangle over orders: customers cohorted by first
    * purchase month, revenue accumulated by month offset (exact decimal
    * sums, one division per derived double). */
  private val q160 = QueryDef(
    "q160_cohort_ltv",
    (s, d) => EventOps.cohortLtv(Tables.orders(s, d),
      "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("revenue", col("revenue").cast("double"))
      .withColumn("cum_revenue", col("cum_revenue").cast("double")),
    Some("""
      WITH b AS (SELECT o_custkey AS cust,
              CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
              CAST(o_totalprice AS DECIMAL(18,2)) AS v
            FROM orders
            WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
              AND o_totalprice IS NOT NULL),
      coh AS (SELECT cust, min(m) AS cohort_month FROM b GROUP BY 1),
      sz AS (SELECT cohort_month, count(*) AS n_cohort_users
             FROM coh GROUP BY 1),
      o AS (SELECT cohort_month,
              datediff('month', cohort_month, m) AS month_offset,
              count(DISTINCT b.cust) AS n_active_users,
              sum(v) AS revenue
            FROM b JOIN coh ON b.cust = coh.cust
            GROUP BY 1, 2),
      c AS (SELECT *, sum(revenue) OVER (PARTITION BY cohort_month
              ORDER BY month_offset) AS cum_revenue FROM o)
      SELECT cohort_month, CAST(month_offset AS INT) AS month_offset,
             CAST(n_cohort_users AS BIGINT) AS n_cohort_users,
             CAST(n_active_users AS BIGINT) AS n_active_users,
             CAST(revenue AS DOUBLE) AS revenue,
             CAST(cum_revenue AS DOUBLE) AS cum_revenue,
             CAST(cum_revenue AS DOUBLE) / CAST(n_cohort_users AS DOUBLE)
               AS cum_ltv_per_user
      FROM c JOIN sz USING (cohort_month)"""))

  /** χ² significance for the q159 hash-split experiment: exact 2×2
    * counts, DECIMAL(38,0)/HUGEINT products, one double division —
    * the statistic hash-matches across engines. */
  private val q161 = QueryDef(
    "q161_chi2_ab",
    (s, d) => {
      val bucket = conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      val units = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
        .withColumn("variant", when(bucket < 50, "A").otherwise("B"))
      Quality.chi2TwoByTwo(units, "variant", "conv")
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
      WITH u AS (SELECT user_id,
              max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS conv
            FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      v AS (SELECT *, CASE WHEN $bucket < 50 THEN 'A' ELSE 'B' END
              AS variant FROM u),
      g AS (SELECT variant, count(*) AS n, sum(conv) AS s
            FROM v GROUP BY 1),
      ga AS (SELECT * FROM g ORDER BY variant ASC LIMIT 1),
      gb AS (SELECT * FROM g ORDER BY variant DESC LIMIT 1),
      w AS (SELECT ga.variant AS variant_a, gb.variant AS variant_b,
              CAST(ga.n AS HUGEINT) AS na, CAST(ga.s AS HUGEINT) AS a,
              CAST(gb.n AS HUGEINT) AS nb, CAST(gb.s AS HUGEINT) AS c
            FROM ga CROSS JOIN gb
            WHERE (SELECT count(*) FROM g) = 2)
      SELECT variant_a, variant_b,
             CAST(na AS BIGINT) AS n_a, CAST(a AS BIGINT) AS success_a,
             CAST(nb AS BIGINT) AS n_b, CAST(c AS BIGINT) AS success_b,
             CAST(a AS DOUBLE) / CAST(na AS DOUBLE) AS rate_a,
             CAST(c AS DOUBLE) / CAST(nb AS DOUBLE) AS rate_b,
             CAST((na + nb) * (a*(nb-c) - (na-a)*c) * (a*(nb-c) - (na-a)*c)
                 AS DOUBLE) /
               nullif(CAST((a + (na-a)) * (c + (nb-c)) * (a + c) *
                 ((na-a) + (nb-c)) AS DOUBLE), 0.0) AS chi2
      FROM w"""
    })

  private val TokenBudget = 10000L

  /** Best-documents-first token-budget cut: longest documents (by
    * n_chars, doc_id tiebreak) kept while the running token total stays
    * within budget — the telescoped-bucket form of a global ordered
    * cumulative sum (see Corpus.takeGlobalTokenBudget). */
  private val q162 = QueryDef(
    "q162_token_budget",
    (s, d) => Corpus.takeGlobalTokenBudget(Tables.documents(s, d),
      "doc_id", col("n_chars").cast("double"),
      size(TextFunctions.tokens(col("text"))), TokenBudget)
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("cum_tokens")),
    Some(s"""
      WITH t AS (SELECT doc_id, n_chars,
              CAST(len(${ExtQueries.oToks("text")}) AS BIGINT) AS n_tokens
            FROM documents
            WHERE n_chars IS NOT NULL AND text IS NOT NULL),
      c AS (SELECT *, sum(n_tokens) OVER (
              ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id)
              AS cum_tokens FROM t)
      SELECT doc_id, n_chars, n_tokens,
             CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM c WHERE cum_tokens <= $TokenBudget"""))

  private val OovVocabK = 1000

  /** Per-document OOV rate against the corpus's own top-K vocabulary:
    * the "will a fixed vocab shred this document" coverage signal. */
  private val q163 = QueryDef(
    "q163_oov_rate",
    (s, d) => Corpus.oovRate(Tables.documents(s, d), "doc_id", "text",
      OovVocabK),
    Some(s"""
      WITH dt AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")})
              AS token
            FROM documents),
      c AS (SELECT doc_id, token, count(*) AS cnt FROM dt GROUP BY 1, 2),
      v AS (SELECT token, sum(cnt) AS gcnt FROM c GROUP BY 1),
      vocab AS (SELECT token FROM (
                  SELECT token, row_number() OVER (
                    ORDER BY gcnt DESC, token) AS rn FROM v)
                WHERE rn <= $OovVocabK)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN vocab.token IS NULL THEN cnt ELSE 0 END)
               AS BIGINT) AS n_oov,
             CAST(sum(CASE WHEN vocab.token IS NULL THEN cnt ELSE 0 END)
               AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS oov_rate
      FROM c LEFT JOIN vocab ON c.token = vocab.token
      GROUP BY doc_id"""))

  /** Per-document bigram cross-entropy under the corpus's own bigram
    * model — the conditional upgrade of q140's unigram score, same
    * floor(ln·2^30) scaled-integer reproducibility discipline. */
  private val q164 = QueryDef(
    "q164_bigram_ce",
    (s, d) => Corpus.bigramCrossEntropy(Tables.documents(s, d),
      "doc_id", "text"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      bg AS (SELECT doc_id, unnest(${ExtQueries.oShingles("w", 2)}) AS b
             FROM t),
      c AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2),
      m AS (SELECT b, sum(cnt) AS gcnt FROM c GROUP BY 1),
      p AS (SELECT string_split(b, ' ')[1] AS w1, sum(gcnt) AS pcnt
            FROM m GROUP BY 1),
      lp AS (SELECT b,
              CAST(floor(ln(CAST(gcnt AS DOUBLE) / CAST(pcnt AS DOUBLE))
                * 1073741824.0) AS BIGINT) AS lps
             FROM m JOIN p ON string_split(m.b, ' ')[1] = p.w1)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_transitions,
             (-(CAST(sum(cnt * lps) AS DOUBLE) / 1073741824.0))
               / CAST(sum(cnt) AS DOUBLE) AS cross_entropy_nats
      FROM c JOIN lp USING (b)
      GROUP BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q160, q161, q162, q163, q164)
}
