package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Corpus

/** Round-9 wave 2: fixed-model cross-entropy scoring.
  *
  * q302 scores the odd-id documents against a unigram model induced from
  * the even-id half — the reference-model formulation a streaming intake
  * gate needs (self-relative CE would make a doc's score depend on its
  * batch). OOV tokens carry a flat 20-nat penalty; the whole pipeline is
  * on the q140 exact-integer 2^-30 log grid, replayed in DuckDB.
  */
object R8iQueries {

  private val q302 = QueryDef(
    "q302_ce_against_model",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = Corpus.unigramLogProbs(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      Corpus.unigramCrossEntropyAgainst(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model)
    },
    Some(s"""
      WITH rt AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
            FROM documents WHERE doc_id % 2 = 0),
      v AS (SELECT token, CAST(count(*) AS BIGINT) AS gcnt
            FROM rt GROUP BY token),
      tot AS (SELECT sum(gcnt) AS total FROM v),
      lp AS (SELECT token,
              CAST(floor(ln(CAST(gcnt AS DOUBLE) / CAST(total AS DOUBLE))
                * 1073741824.0) AS BIGINT) AS lps
             FROM v CROSS JOIN tot),
      dt AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
            FROM documents WHERE doc_id % 2 = 1),
      c AS (SELECT doc_id, token, count(*) AS cnt FROM dt GROUP BY 1, 2),
      sc AS (SELECT c.doc_id, c.cnt,
               COALESCE(lp.lps,
                 CAST(-floor(20.0 * 1073741824.0) AS BIGINT)) AS lps
             FROM c LEFT JOIN lp USING (token))
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             (-(CAST(sum(cnt * lps) AS DOUBLE) / 1073741824.0))
               / CAST(sum(cnt) AS DOUBLE) AS cross_entropy_nats
      FROM sc GROUP BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q302)
}
