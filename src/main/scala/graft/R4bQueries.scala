package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Corpus, Scale, Similarity}

/** Round-4 wave 3: corpus-curation quality buckets, web-domain gating,
  * cross-source contamination audit, engine-exact k-means training, and
  * the bloom-pruned join runtime filter. Numeric discipline as repo-wide:
  * integer/decimal-exact aggregates, strict in-order float folds, no ln().
  */
object R4bQueries {

  private val D2 = DecimalType(18, 2)

  /** CCNet-style head/middle/tail quality buckets by relative mean token
    * document frequency (integer-exact; thresholds exercise all three
    * buckets at the correctness SF). */
  private val q101 = QueryDef(
    "q101_commonness_buckets",
    (s, d) => Corpus.commonnessBuckets(Tables.documents(s, d),
      "doc_id", "text", headMinRelDf = 0.78, tailMaxRelDf = 0.774),
    Some(s"""
      WITH t AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
                 FROM documents),
      df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfq
             FROM t GROUP BY token),
      nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM t),
      m AS (SELECT t.doc_id, CAST(count(*) AS INT) AS n_tokens,
              CAST(sum(dfq) AS BIGINT) AS sum_df
            FROM t JOIN df USING (token) GROUP BY t.doc_id),
      sc AS (SELECT doc_id, n_tokens, sum_df,
               CAST(sum_df AS DOUBLE) / n_tokens / (SELECT n_docs FROM nd)
                 AS rel_mean_df
             FROM m)
      SELECT doc_id, n_tokens, sum_df, rel_mean_df,
             CASE WHEN rel_mean_df >= 0.78 THEN 'head'
                  WHEN rel_mean_df < 0.774 THEN 'tail'
                  ELSE 'middle' END AS bucket
      FROM sc"""))

  /** Web-curation domain gate over a synthesized URL column (the corpus
    * fixture carries no URLs, so the query derives one deterministically
    * per doc — mixed case to exercise normalization). */
  private val q102 = QueryDef(
    "q102_domain_gate",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".Example.com/"), col("lang"), lit("/"),
          col("doc_id").cast("string")))
      val block = s.createDataFrame(Seq(
        Tuple1("src0.example.com"), Tuple1("SRC3.example.com")))
        .toDF("blocked_domain")
      Corpus.domainGate(docs, "doc_id", "url", block, "blocked_domain")
        .select(col("doc_id"), col("source"), col("domain"),
          col("n_domain_docs"))
    },
    Some("""
      WITH u AS (SELECT doc_id, source,
              'https://' || source || '.Example.com/' || lang || '/' ||
                CAST(doc_id AS VARCHAR) AS url
            FROM documents),
      w AS (SELECT doc_id, source,
              regexp_extract(lower(url),
                '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS domain
            FROM u),
      k AS (SELECT * FROM w
            WHERE domain NOT IN ('src0.example.com', 'src3.example.com')),
      c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_domain_docs
            FROM k GROUP BY domain)
      SELECT k.doc_id, k.source, k.domain, c.n_domain_docs
      FROM k JOIN c USING (domain)"""))

  /** Cross-source shingle-overlap contamination matrix (integer counts +
    * one exact division for the Jaccard). */
  private val q103 = QueryDef(
    "q103_source_overlap",
    (s, d) => Corpus.crossSourceOverlap(Tables.documents(s, d),
      "doc_id", "text", "source", shingleN = 3),
    Some(s"""
      WITH t AS (SELECT source, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      sh AS (SELECT DISTINCT source, shingle FROM (
               SELECT source, unnest(${ExtQueries.oShingles("w", 3)}) AS shingle
               FROM t WHERE len(w) >= 3)),
      tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n
              FROM sh GROUP BY source),
      p AS (SELECT x.source AS source_a, y.source AS source_b,
              CAST(count(*) AS BIGINT) AS n_shared
            FROM sh x JOIN sh y
              ON x.shingle = y.shingle AND x.source < y.source
            GROUP BY 1, 2)
      SELECT source_a, source_b, n_shared,
             ta.n AS n_shingles_a, tb.n AS n_shingles_b,
             CAST(n_shared AS DOUBLE) / (ta.n + tb.n - n_shared) AS jaccard
      FROM p
      JOIN tot ta ON ta.source = p.source_a
      JOIN tot tb ON tb.source = p.source_b"""))

  private val KmK = 4
  private val KmIters = 2
  private val Dim = ExtQueries.OracleEmbDim

  /** Lloyd k-means over int8-quantized embeddings, replayed iteration by
    * iteration in DuckDB: integer centroid sums are exact, every float op
    * is an in-order fold — the trained-centroid path ivfCentroids'
    * docstring deliberately skipped for raw floats. */
  private val q104 = QueryDef(
    "q104_kmeans_assign",
    (s, d) => Similarity.kmeansAssignQuantized(Tables.embeddings(s, d),
      "vec_id", "embedding", k = KmK, iters = KmIters),
    Some {
      // in-order double dot of an int8 code list against a centroid list
      def dotQC(q: String, c: String) = "0.0 + " + (1 to Dim)
        .map(i => s"CAST($q[$i] AS DOUBLE)*$c[$i]").mkString(" + ")
      // exact integer self-dot of a code list
      def idot(q: String) = (1 to Dim).map(i => s"$q[$i]*$q[$i]")
        .mkString(" + ")
      // in-order double self-dot of a centroid list
      def cdot(c: String) = "0.0 + " + (1 to Dim).map(i => s"$c[$i]*$c[$i]")
        .mkString(" + ")
      val meanList = (1 to Dim)
        .map(i => s"CAST(CAST(SUM(q8[$i]) AS BIGINT) AS DOUBLE)/COUNT(*)")
        .mkString(", ")
      val iterCtes = (0 until KmIters).map { i =>
        s"""cw_$i AS (SELECT cluster_id, cen, sqrt(${cdot("cen")}) AS cn
             FROM cen_$i),
      a_$i AS (SELECT q.vec_id, q.q8, q.qn, c.cluster_id,
                 (${dotQC("q.q8", "c.cen")}) / (q.qn * c.cn) AS ccos
               FROM qn q CROSS JOIN cw_$i c),
      asg_$i AS (SELECT * FROM a_$i
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cluster_id) = 1),
      upd_$i AS (SELECT cluster_id, list_value($meanList) AS newcen
                 FROM asg_$i GROUP BY cluster_id),
      cen_${i + 1} AS (SELECT s.cluster_id,
                 coalesce(u.newcen, s.cen) AS cen
               FROM cen_$i s LEFT JOIN upd_$i u USING (cluster_id))"""
      }.mkString(",\n      ")
      s"""
      WITH base AS (SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) AS mx
             FROM embeddings),
      qt AS (SELECT vec_id,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT)) AS q8
             FROM base WHERE mx > 0),
      qn AS (SELECT vec_id, q8,
             sqrt(CAST(${idot("q8")} AS DOUBLE)) AS qn FROM qt),
      cen_0 AS (SELECT CAST(rn - 1 AS INT) AS cluster_id,
             list_transform(q8, x -> CAST(x AS DOUBLE)) AS cen
             FROM (SELECT q8, row_number() OVER (
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
                   FROM qn)
             WHERE rn <= $KmK),
      $iterCtes,
      cw_F AS (SELECT cluster_id, cen, sqrt(${cdot("cen")}) AS cn
             FROM cen_$KmIters),
      a_F AS (SELECT q.vec_id, c.cluster_id,
             (${dotQC("q.q8", "c.cen")}) / (q.qn * c.cn) AS cluster_cos
             FROM qn q CROSS JOIN cw_F c)
      SELECT vec_id, cluster_id, cluster_cos FROM a_F
      QUALIFY row_number() OVER (PARTITION BY vec_id
        ORDER BY cluster_cos DESC, cluster_id) = 1"""
    })

  /** Bloom-pruned star join: output is exactly the plain join+aggregate
    * (false positives die in the join), so the oracle needs no bloom —
    * what it verifies is that the runtime filter is semantics-free. */
  private val q105 = QueryDef(
    "q105_bloom_pruned_join",
    (s, d) => {
      val small = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_custkey"))
      val big = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_quantity"))
      Scale.bloomPrunedJoin(big, small, "o_orderkey",
          expectedItems = 1000000L, fpp = 0.01)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(col("l_extendedprice").cast(D2)).cast("double").as("revenue"))
    },
    Some("""
      SELECT o.o_custkey,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority = '1-URGENT'
        AND year(o.o_orderdate) = 1995
      GROUP BY o.o_custkey"""))

  val all: Seq[QueryDef] = Seq(q101, q102, q103, q104, q105)
}
