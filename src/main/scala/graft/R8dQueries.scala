package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus}

/** Round-8 wave 4: field-level survivorship.
  *
  * q295 builds one golden record per near-dup cluster with per-field
  * rules (longest-text representative, majority language, exact member
  * and source counts) — the MDM merge step beyond q82's keep-one-row
  * resolution, where the merged record mixes fields from different
  * members.
  */
object R8dQueries {

  private val q295 = QueryDef(
    "q295_golden_record",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val labels = Clusters.connectedComponents(docs, "doc_id",
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id")
      Corpus.goldenRecords(docs, "doc_id", "text", "lang", "source",
        "n_chars", labels)
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
                FROM edges e JOIN reach ON e.dst = reach.id),
      lbl AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach
              GROUP BY id),
      j AS (SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
                   l.cluster_id
            FROM documents d JOIN lbl l USING (doc_id)),
      rep AS (SELECT cluster_id, doc_id, length(text) AS tl,
                row_number() OVER (PARTITION BY cluster_id
                  ORDER BY length(text) DESC, doc_id) AS rk
              FROM j),
      lm AS (SELECT cluster_id, lang AS golden_lang FROM (
               SELECT cluster_id, lang,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY count(*) DESC, lang) AS lrk
               FROM j GROUP BY cluster_id, lang) WHERE lrk = 1),
      agg AS (SELECT cluster_id,
                CAST(count(*) AS BIGINT) AS n_members,
                CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
              FROM j GROUP BY 1)
      SELECT a.cluster_id, a.n_members, a.n_sources, a.total_chars,
             r.doc_id AS representative_id,
             CAST(r.tl AS INT) AS representative_len,
             lm.golden_lang
      FROM agg a
      JOIN (SELECT * FROM rep WHERE rk = 1) r USING (cluster_id)
      JOIN lm USING (cluster_id)"""))

  val all: Seq[QueryDef] = Seq(q295)
}
