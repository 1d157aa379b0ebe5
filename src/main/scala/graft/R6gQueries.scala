package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.Scale

/** Round-6 wave 9: dataset cards, shard balance planning, RFM
  * segmentation.
  *
  * q205 is the per-source "data card" a corpus release ships (volume,
  * language, duplication, length, quality in one frame); q206 compares
  * hash vs size-striped shard placement before a 1000-executor write
  * (stragglers are made here); q207 is the classic marketing-analytics
  * RFM segmentation — global quintile scores with exact rank math.
  */
object R6gQueries {

  /** Per-source dataset card: volume, top language + share, exact-dup
    * rate, nearest-rank length percentiles, corpus-level stopword
    * density — every figure an exact count or one division. */
  private val q205 = QueryDef(
    "q205_dataset_card",
    (s, d) => {
      val toks = TextFunctions.tokens(col("text"))
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          col("text"), md5(col("text")).as("__h"),
          size(toks).cast("long").as("__nt"),
          size(filter(toks, t =>
            t.isin(TextFunctions.stopwords.map(lit): _*)))
            .cast("long").as("__sw"))
      val base = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("__h")).as("__nh"),
        sum(col("__sw")).as("__swt"))
      val lang = docs.groupBy(col("source"),
        coalesce(col("lang"), lit("??")).as("lang"))
        .agg(count(lit(1)).as("__ln"))
        .withColumn("__lr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("__ln").desc, col("lang"))))
        .filter(col("__lr") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("__ln").as("__lt"))
      val ranked = docs.withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("n_chars"), col("doc_id"))))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      val pct = ranked.groupBy(col("source")).agg(
        max(when(col("__r") === expr("(__n + 1) div 2"), col("n_chars")))
          .as("p50_chars"),
        max(when(col("__r") ===
          least(col("__n"), expr("(95 * __n + 99) div 100")),
          col("n_chars"))).as("p95_chars"))
      base.join(lang, Seq("source")).join(pct, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("top_lang"),
          (col("__lt").cast("double") / col("n_docs").cast("double"))
            .as("top_lang_share"),
          (lit(1.0) - col("__nh").cast("double") /
            col("n_docs").cast("double")).as("exact_dup_rate"),
          col("p50_chars"), col("p95_chars"),
          (col("__swt").cast("double") / col("n_tokens").cast("double"))
            .as("stopword_density"))
    },
    Some(s"""
      WITH docs AS (SELECT doc_id, source, lang, n_chars, md5(text) AS h,
              CAST(len(${ExtQueries.oToks("text")}) AS BIGINT) AS nt,
              CAST(len(list_filter(${ExtQueries.oToks("text")},
                x -> list_contains([${ExtQueries.stopList}], x)))
                AS BIGINT) AS sw
            FROM documents WHERE text IS NOT NULL),
      base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(nt) AS BIGINT) AS n_tokens,
              CAST(SUM(n_chars) AS BIGINT) AS n_chars,
              CAST(COUNT(DISTINCT h) AS BIGINT) AS nh,
              CAST(SUM(sw) AS BIGINT) AS swt
            FROM docs GROUP BY 1),
      lang AS (SELECT source, lang AS top_lang, ln AS lt FROM (
              SELECT source, lang, ln,
                row_number() OVER (PARTITION BY source
                  ORDER BY ln DESC, lang) AS lr
              FROM (SELECT source, coalesce(lang, '??') AS lang,
                      CAST(COUNT(*) AS BIGINT) AS ln
                    FROM docs GROUP BY 1, 2))
            WHERE lr = 1),
      rk AS (SELECT source, n_chars,
              row_number() OVER (PARTITION BY source
                ORDER BY n_chars, doc_id) AS r,
              COUNT(*) OVER (PARTITION BY source) AS n
            FROM docs),
      pct AS (SELECT source,
              MAX(CASE WHEN r = (n + 1) // 2 THEN n_chars END) AS p50_chars,
              MAX(CASE WHEN r = least(n, (95 * n + 99) // 100)
                THEN n_chars END) AS p95_chars
            FROM rk GROUP BY 1)
      SELECT b.source, b.n_docs, b.n_tokens, b.n_chars, l.top_lang,
        CAST(l.lt AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS top_lang_share,
        1.0 - CAST(b.nh AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
          AS exact_dup_rate,
        p.p50_chars, p.p95_chars,
        CAST(b.swt AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
          AS stopword_density
      FROM base b JOIN lang l USING (source) JOIN pct p USING (source)"""))

  private val Shards = 16

  /** Shard-balance planner: hash placement vs size-rank striping of
    * documents into $Shards shards, per-shard bytes and share-of-even —
    * the straggler check before a wide write. */
  private val q206 = QueryDef(
    "q206_shard_skew_planner",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"))
      val hash = docs.withColumn("shard",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("int") % Shards).cast("int"))
        .withColumn("strategy", lit("hash"))
      val striped = Scale.globalRowNumber(
          docs.withColumn("__negsz", -col("n_chars")), "__negsz", "doc_id")
        .withColumn("shard",
          ((col("global_rn") - 1) % Shards).cast("int"))
        .withColumn("strategy", lit("size_striped"))
        .select(col("doc_id"), col("n_chars"), col("shard"),
          col("strategy"))
      val placed = hash.select(col("doc_id"), col("n_chars"), col("shard"),
        col("strategy")).unionByName(striped)
      val tot = placed.groupBy(col("strategy"))
        .agg(sum(col("n_chars")).as("__t"))
      placed.groupBy(col("strategy"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
        .join(tot, Seq("strategy"))
        .select(col("strategy"), col("shard"), col("n_docs"), col("bytes"),
          ((col("bytes") * Shards).cast("double") /
            col("__t").cast("double")).as("share_of_even"))
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS " +
          s"VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} " +
          s"AS INT) % $Shards"
      s"""
      WITH docs AS (SELECT doc_id, n_chars FROM documents
            WHERE text IS NOT NULL),
      hash AS (SELECT 'hash' AS strategy, doc_id, n_chars,
              $bucket AS shard
            FROM docs),
      striped AS (SELECT 'size_striped' AS strategy, doc_id, n_chars,
              CAST((row_number() OVER (ORDER BY -n_chars, doc_id) - 1)
                % $Shards AS INT) AS shard
            FROM docs),
      placed AS (SELECT * FROM hash UNION ALL SELECT * FROM striped),
      tot AS (SELECT strategy, CAST(SUM(n_chars) AS BIGINT) AS t
            FROM placed GROUP BY 1)
      SELECT p.strategy, p.shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(p.n_chars) AS BIGINT) AS bytes,
        CAST(SUM(p.n_chars) * $Shards AS DOUBLE) / CAST(t.t AS DOUBLE)
          AS share_of_even
      FROM placed p JOIN tot t USING (strategy)
      GROUP BY p.strategy, p.shard, t.t"""
    })

  /** RFM segmentation: global recency/frequency/monetary quintile
    * scores (exact rank math over telescoped global numbering) and the
    * standard segment labels. */
  private val q207 = QueryDef(
    "q207_rfm_segments",
    (s, d) => {
      val maxDate = Tables.orders(s, d).agg(max(col("o_orderdate")).as("__mx"))
      val base = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("__last"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("__m"))
        .crossJoin(broadcast(maxDate))
        .select(col("o_custkey"),
          datediff(col("__mx"), col("__last")).cast("long")
            .as("recency_days"),
          col("frequency"), col("__m"))
      val n = base.agg(count(lit(1)).as("__n"))
      val r1 = Scale.globalRowNumber(base, "recency_days", "o_custkey")
        .withColumnRenamed("global_rn", "__rr")
      val r2 = Scale.globalRowNumber(r1, "frequency", "o_custkey")
        .withColumnRenamed("global_rn", "__fr")
      val r3 = Scale.globalRowNumber(r2, "__m", "o_custkey")
        .withColumnRenamed("global_rn", "__mr")
        .crossJoin(broadcast(n))
      val scored = r3.select(col("o_custkey"), col("recency_days"),
        col("frequency"), col("__m").cast("double").as("monetary"),
        expr("5 - (((__rr - 1) * 5) div __n)").cast("int").as("r_score"),
        expr("(((__fr - 1) * 5) div __n) + 1").cast("int").as("f_score"),
        expr("(((__mr - 1) * 5) div __n) + 1").cast("int").as("m_score"))
      scored.withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 &&
          col("m_score") >= 4, "champion")
          .when(col("f_score") >= 4, "loyal")
          .when(col("m_score") === 5, "whale")
          .when(col("r_score") >= 4, "recent")
          .when(col("r_score") <= 2 &&
            (col("f_score") >= 3 || col("m_score") >= 3), "at_risk")
          .when(col("r_score") <= 2, "hibernating")
          .otherwise("regular"))
    },
    Some("""
      WITH mx AS (SELECT MAX(o_orderdate) AS m FROM orders),
      base AS (SELECT o_custkey,
              CAST(date_diff('day', MAX(o_orderdate), mx.m) AS BIGINT)
                AS recency_days,
              CAST(COUNT(*) AS BIGINT) AS frequency,
              SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
            FROM orders CROSS JOIN mx GROUP BY o_custkey, mx.m),
      rk AS (SELECT *,
              row_number() OVER (ORDER BY recency_days, o_custkey) AS rr,
              row_number() OVER (ORDER BY frequency, o_custkey) AS fr,
              row_number() OVER (ORDER BY m, o_custkey) AS mr,
              COUNT(*) OVER () AS n
            FROM base),
      sc AS (SELECT o_custkey, recency_days, frequency,
              CAST(m AS DOUBLE) AS monetary,
              CAST(5 - (((rr - 1) * 5) // n) AS INT) AS r_score,
              CAST((((fr - 1) * 5) // n) + 1 AS INT) AS f_score,
              CAST((((mr - 1) * 5) // n) + 1 AS INT) AS m_score
            FROM rk)
      SELECT *, CASE
          WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
            THEN 'champion'
          WHEN f_score >= 4 THEN 'loyal'
          WHEN m_score = 5 THEN 'whale'
          WHEN r_score >= 4 THEN 'recent'
          WHEN r_score <= 2 AND (f_score >= 3 OR m_score >= 3)
            THEN 'at_risk'
          WHEN r_score <= 2 THEN 'hibernating'
          ELSE 'regular' END AS segment
      FROM sc"""))

  val all: Seq[QueryDef] = Seq(q205, q206, q207)
}
