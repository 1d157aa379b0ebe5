package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus, Multimodal, Stats}

/** Round-7 wave 11: multimodal dedup composition + vocabulary growth.
  *
  * q263 closes the media-dedup loop: perceptual hashes (q182) → banded
  * Hamming pairs (q183) → connected components — media-level duplicate
  * GROUPS, the output a curation pipeline actually consumes; the oracle
  * recomputes components by recursive closure over the full O(n²) pair
  * set. q264 fits Heaps' law to the vocabulary growth curve — the
  * companion to q236's Zipf head fit that tells a crawl planner whether
  * more data still buys new vocabulary.
  */
object R7kQueries {

  private val q263 = QueryDef(
    "q263_media_dedup_clusters",
    (s, d) => {
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(
        Tables.documents(s, d)
          .withColumn("text", substring(col("text"), 1, 128)))
        .map(r => r.copy(meta = r.meta.copy(width = 16, height = 16)))
      val hashed = Multimodal.perceptualHash(
        Multimodal.spreadForDecode(media))
      val edges = Corpus.bandedHammingPairs(hashed, "media_id", "phash",
        maxHamming = 3, bits = 64, numBands = 4)
      Clusters.connectedComponents(hashed.select(col("media_id")),
        "media_id", edges, "a_id", "b_id")
    },
    Some(s"""
      WITH RECURSIVE ${R6Queries.oPhashCtes("encode(substr(text, 1, 128))", "768")},
      prs AS (SELECT a.media_id AS a_id, b.media_id AS b_id
              FROM ph a JOIN ph b ON a.media_id < b.media_id
              WHERE bit_count(xor(a.phash, b.phash)) <= 3),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT media_id AS id, media_id AS r FROM ph
                UNION
                SELECT e.src AS id, reach.r
                FROM edges e JOIN reach ON e.dst = reach.id)
      SELECT id AS media_id, MIN(r) AS cluster_id FROM reach GROUP BY id"""))

  private val q264 = QueryDef(
    "q264_heaps_fit",
    (s, d) => Stats.heapsFit(Tables.documents(s, d), "doc_id", "text"),
    Some(s"""
      WITH tk AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS t
             FROM documents),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok
             FROM tk GROUP BY 1),
      fv AS (SELECT min(doc_id) AS doc_id FROM tk GROUP BY t),
      nv AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS newv
             FROM fv GROUP BY 1),
      pts AS (SELECT pd.doc_id, pd.ntok, COALESCE(nv.newv, 0) AS newv,
                sum(pd.ntok) OVER (ORDER BY pd.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cumn,
                sum(COALESCE(nv.newv, 0)) OVER (ORDER BY pd.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cumv
              FROM pd LEFT JOIN nv USING (doc_id)),
      g AS (SELECT
              CAST(floor(ln(CAST(cumn AS DOUBLE)) * 1048576.0) AS BIGINT)
                AS lx,
              CAST(floor(ln(CAST(cumv AS DOUBLE)) * 1048576.0) AS BIGINT)
                AS ly
            FROM pts WHERE cumv > 0 AND cumn > 0),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(lx) AS HUGEINT) AS sx,
              CAST(sum(ly) AS HUGEINT) AS sy,
              CAST(sum(lx * ly) AS HUGEINT) AS sxy,
              CAST(sum(lx * lx) AS HUGEINT) AS sxx
            FROM g),
      s AS (SELECT n, sx, sy,
              ((n * sxy - sx * sy) * 1073741824)
                // (n * sxx - sx * sx) AS slope_scaled
            FROM a)
      SELECT n AS n_points,
        CAST(slope_scaled AS DOUBLE) / 1073741824.0 AS beta,
        (CAST(sy AS DOUBLE) / 1048576.0
          - (CAST(slope_scaled AS DOUBLE) / 1073741824.0)
            * (CAST(sx AS DOUBLE) / 1048576.0)) / CAST(n AS DOUBLE)
          AS ln_k
      FROM s"""))

  val all: Seq[QueryDef] = Seq(q263, q264)
}
