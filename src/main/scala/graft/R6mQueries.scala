package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Retrieval, Similarity, Sketches, Vectorize}

/** Round-6 wave 15: sketch-table frequency serving, vocabulary-free
  * featurization, and hybrid-retrieval rank fusion.
  *
  * q223 is the approximate-counting serving path (a 4x1024 CMS cell
  * table answers "how often does key X occur" without the exact per-key
  * shuffle) audited against exact counts; q224 is the hashing-trick
  * featurizer (fixed-dim signed bag-of-words, no vocabulary build);
  * q225 fuses the q107 lexical ranking with the q37 vector ranking the
  * way a hybrid RAG retriever does (reciprocal-rank fusion).
  */
object R6mQueries {

  private val CmsDepth = 4
  private val CmsWidth = 1024
  private val CmsTopN = 100

  /** DuckDB replay of Sketches.cmsBucket: 16-bit md5 slice of "j:key". */
  private def oCmsBucket(jExpr: String, keyExpr: String): String = {
    val h = s"md5(CAST($jExpr AS VARCHAR) || ':' || $keyExpr)"
    val nib = (p: Int) =>
      s"(strpos('0123456789abcdef', substr($h, $p, 1)) - 1)"
    s"(CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} " +
      s"AS INT) % $CmsWidth)"
  }

  /** Count-min sketch frequency audit over part keys: sketch estimate vs
    * exact count for the 100 hottest parts; overestimate >= 0 always. */
  private val q223 = QueryDef(
    "q223_countmin_freq",
    (s, d) => Sketches.countMinAudit(Tables.lineitem(s, d), "l_partkey",
      CmsDepth, CmsWidth, CmsTopN),
    Some(s"""
      WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem
                 WHERE l_partkey IS NOT NULL),
      js AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j),
      c AS (SELECT j, ${oCmsBucket("j", "key")} AS bucket,
              CAST(count(*) AS BIGINT) AS cell_n
            FROM k CROSS JOIN js GROUP BY 1, 2),
      t AS (SELECT key, CAST(count(*) AS BIGINT) AS exact_n FROM k
            GROUP BY 1 ORDER BY exact_n DESC, key LIMIT $CmsTopN),
      e AS (SELECT t.key, t.exact_n, min(c.cell_n) AS cms_n
            FROM t CROSS JOIN js
            JOIN c ON c.j = js.j
                  AND c.bucket = ${oCmsBucket("js.j", "t.key")}
            GROUP BY 1, 2)
      SELECT key, exact_n, cms_n, cms_n - exact_n AS overestimate
      FROM e"""))

  private val HashDim = 256

  /** Hashing-trick featurization: fixed-dim signed bag-of-words with md5
    * bucket/sign (independent salts), exact integer weights. */
  private val q224 = QueryDef(
    "q224_feature_hashing",
    (s, d) => Vectorize.hashedFeatures(Tables.documents(s, d), "doc_id",
      "text", HashDim),
    Some {
      def nib16(salt: String) = {
        val h = s"md5('$salt' || token)"
        val nib = (p: Int) =>
          s"(strpos('0123456789abcdef', substr($h, $p, 1)) - 1)"
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} " +
          s"AS INT)"
      }
      s"""
      WITH tk AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")})
                    AS token
                  FROM documents),
      f AS (SELECT doc_id,
              (${nib16("b:")} % $HashDim) AS bucket,
              CASE WHEN (${nib16("s:")} % 2) = 0 THEN 1 ELSE -1 END AS sign
            FROM tk)
      SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS weight,
             CAST(count(*) AS BIGINT) AS n_tokens
      FROM f GROUP BY 1, 2"""
    })

  private val FuseK = 50
  private val FuseTerms = Seq("customer", "stream", "merge")
  private val FuseQueryVec = 1 // embeddings row serving as the query

  /** Hybrid retrieval: BM25 lexical top-k + brute-force cosine top-k for
    * one query vector, fused by reciprocal rank (k0 = 60). Both input
    * rankings and the two-term RRF sum are deterministic, so the fused
    * ordering is too. */
  private val q225 = QueryDef(
    "q225_rrf_fusion",
    (s, d) => {
      val lex = Retrieval.bm25TopK(Tables.documents(s, d), "doc_id",
        "text", FuseTerms, topK = FuseK, k1 = 1.5, b = 0.75)
      val vec = Similarity.cosineTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", col("vec_id") === FuseQueryVec, k = FuseK)
      Retrieval.rrfFuse(lex, "doc_id", "rank", vec, "n_id", "rank")
    },
    Some {
      val tfCols = FuseTerms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(w, x -> x = '$t')) AS tf_$i"
      }.mkString(", ")
      val dfCols = FuseTerms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
        .mkString(", ")
      val score = FuseTerms.indices.map { i =>
        s"""(((CAST(n_docs - df_$i AS DOUBLE) + 0.5) /
             (CAST(df_$i AS DOUBLE) + 0.5)) *
            (CAST(tf_$i AS DOUBLE) * CAST(2.5 AS DOUBLE)) /
            (CAST(tf_$i AS DOUBLE) + CAST(1.5 AS DOUBLE) *
              (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)))"""
      }.reduceLeft((a, b) => s"($a + $b)")
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
                 FROM documents),
      base AS (SELECT doc_id, CAST(len(w) AS INT) AS dl, $tfCols
               FROM t WHERE len(w) > 0),
      st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, $dfCols
             FROM base),
      lex AS (SELECT doc_id AS id,
                CAST(row_number() OVER (ORDER BY sc DESC, doc_id) AS INT)
                  AS rank_a
              FROM (SELECT doc_id, $score AS sc
                    FROM base CROSS JOIN st)
              QUALIFY rank_a <= $FuseK),
      q AS (SELECT embedding AS q_emb FROM embeddings
            WHERE vec_id = $FuseQueryVec),
      sc AS (SELECT vec_id AS id,
               (${ExtQueries.oDot("q_emb", "embedding")}) /
               (sqrt(${ExtQueries.oDot("q_emb", "q_emb")}) *
                sqrt(${ExtQueries.oDot("embedding", "embedding")}))
                 AS cosine
             FROM embeddings CROSS JOIN q
             WHERE vec_id <> $FuseQueryVec),
      vec AS (SELECT id,
                CAST(row_number() OVER (ORDER BY cosine DESC, id) AS INT)
                  AS rank_b
              FROM sc QUALIFY rank_b <= $FuseK),
      fused AS (SELECT COALESCE(lex.id, vec.id) AS id, rank_a, rank_b,
                  COALESCE(1.0 / (CAST(60 AS DOUBLE)
                    + CAST(rank_a AS DOUBLE)), CAST(0 AS DOUBLE))
                  + COALESCE(1.0 / (CAST(60 AS DOUBLE)
                    + CAST(rank_b AS DOUBLE)), CAST(0 AS DOUBLE))
                    AS rrf_score
                FROM lex FULL OUTER JOIN vec ON lex.id = vec.id)
      SELECT id, rank_a, rank_b, rrf_score,
             CAST(row_number() OVER (ORDER BY rrf_score DESC, id) AS INT)
               AS fused_rank
      FROM fused"""
    })

  val all: Seq[QueryDef] = Seq(q223, q224, q225)
}
