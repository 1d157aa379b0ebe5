package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus, Eval, Similarity}

/** Round-6 wave 5: embedding covariance, incremental component
  * maintenance, and margin-based uncertainty sampling.
  *
  * q193 is the PCA/whitening/drift foundation (exact integer moment
  * matrix); q194 is the daily-crawl shape — fold today's near-dup edges
  * into yesterday's stored clusters touching only affected components,
  * oracled against a from-scratch recompute; q195 is the
  * active-learning annotation queue over label centroids.
  */
object R6cQueries {

  /** Upper-triangle covariance of quantized embedding components
    * (Similarity.quantizedCovariance): exact BIGINT sums, one final
    * division per cell. */
  private val q193 = QueryDef(
    "q193_embedding_covariance",
    (s, d) => Similarity.quantizedCovariance(Tables.embeddings(s, d),
      "vec_id", "embedding", qScale = 1024),
    Some("""
      WITH x AS (SELECT vec_id, unnest(embedding) AS e,
              unnest(generate_series(0, len(embedding) - 1)) AS pos
            FROM embeddings WHERE embedding IS NOT NULL),
      b AS (SELECT vec_id, pos,
              CAST(floor(CAST(e AS DOUBLE) * 1024) AS BIGINT) AS q FROM x),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
            FROM embeddings WHERE embedding IS NOT NULL),
      s AS (SELECT pos, CAST(SUM(q) AS BIGINT) AS s FROM b GROUP BY 1),
      pr AS (SELECT a.pos AS i, c.pos AS j,
              CAST(SUM(a.q * c.q) AS BIGINT) AS s_ij
            FROM b a JOIN b c ON a.vec_id = c.vec_id AND a.pos <= c.pos
            GROUP BY 1, 2)
      SELECT pr.i, pr.j, nn.n, si.s AS s_i, sj.s AS s_j, pr.s_ij,
        CAST(nn.n * pr.s_ij - si.s * sj.s AS DOUBLE)
          / CAST(nn.n * nn.n AS DOUBLE) AS cov
      FROM pr JOIN s si ON si.pos = pr.i
              JOIN s sj ON sj.pos = pr.j
              CROSS JOIN nn"""))

  /** Incremental component maintenance: the even-parity half of the
    * q72 near-dup edge set plays "yesterday" (batch CC), the odd half
    * arrives as the new batch and is folded in via
    * Clusters.incrementalComponents. The oracle recomputes components
    * over ALL edges from scratch — incremental must equal recompute. */
  private val q194 = QueryDef(
    "q194_incremental_components",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // the edge list feeds three consumers (old-half CC, new-half
      // remap, new-vertex scan) — snapshot it once instead of
      // recomputing the simhash banding per consumer
      val pairs = Corpus.simHashHammingPairs(docs, "doc_id", "text",
        maxHamming = 3).select(col("a_id"), col("b_id")).localCheckpoint()
      val oldE = pairs.filter((col("a_id") + col("b_id")) % 2 === 0)
      val newE = pairs.filter((col("a_id") + col("b_id")) % 2 =!= 0)
      val stored = Clusters.connectedComponents(docs.select("doc_id"),
        "doc_id", oldE, "a_id", "b_id")
      Clusters.incrementalComponents(stored, "doc_id", "cluster_id",
        newE, "a_id", "b_id")
    },
    Some(s"""
      WITH RECURSIVE ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
                UNION
                SELECT e.src AS id, reach.r
                FROM edges e JOIN reach ON e.dst = reach.id)
      SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id"""))

  /** Bottom-50 margin (top1 − top2 label-centroid cosine) vectors —
    * the annotation-priority queue (Eval.uncertaintySample). */
  private val q195 = QueryDef(
    "q195_uncertainty_sample",
    (s, d) => Eval.uncertaintySample(Tables.embeddings(s, d),
        "vec_id", "embedding", "label", k = 50)
      .withColumnRenamed("id", "vec_id"),
    Some("""
      WITH x AS (SELECT vec_id, label, unnest(embedding) AS e,
              unnest(generate_series(0, len(embedding) - 1)) AS pos
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL),
      b AS (SELECT vec_id, label, pos,
              CAST(floor(CAST(e AS DOUBLE) * 1024) AS BIGINT) AS q FROM x),
      comp AS (SELECT label AS cand, pos, CAST(SUM(q) AS BIGINT) AS c
            FROM b GROUP BY 1, 2),
      cn AS (SELECT cand, CAST(SUM(c * c) AS BIGINT) AS cnn
            FROM comp GROUP BY 1),
      vn AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS vnn
            FROM b GROUP BY 1),
      dots AS (SELECT b.vec_id, MIN(b.label) AS truth, comp.cand,
              CAST(SUM(b.q * comp.c) AS BIGINT) AS dot
            FROM b JOIN comp ON comp.pos = b.pos
            GROUP BY b.vec_id, comp.cand),
      scored AS (SELECT d.vec_id, d.truth, d.cand,
              CAST(d.dot AS DOUBLE) / (sqrt(CAST(vn.vnn AS DOUBLE))
                * sqrt(CAST(cn.cnn AS DOUBLE))) AS cos
            FROM dots d JOIN vn USING (vec_id) JOIN cn USING (cand)
            WHERE vn.vnn > 0 AND cn.cnn > 0),
      rk AS (SELECT *, row_number() OVER
              (PARTITION BY vec_id ORDER BY cos DESC, cand) AS r
            FROM scored),
      top AS (SELECT vec_id, MIN(truth) AS label,
              MAX(CASE WHEN r = 1 THEN cand END) AS pred1,
              MAX(CASE WHEN r = 1 THEN cos END) AS cos1,
              MAX(CASE WHEN r = 2 THEN cand END) AS pred2,
              MAX(CASE WHEN r = 2 THEN cos END) AS cos2
            FROM rk WHERE r <= 2 GROUP BY 1)
      SELECT vec_id, label, pred1, cos1, pred2, cos2,
        cos1 - cos2 AS margin
      FROM top WHERE pred2 IS NOT NULL
      ORDER BY margin, vec_id LIMIT 50"""))

  val all: Seq[QueryDef] = Seq(q193, q194, q195)
}
