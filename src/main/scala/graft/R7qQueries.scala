package graft

import graft.Queries.QueryDef
import graft.operators.{Corpus, NearDup}

/** Round-7 wave 17: dedup explanation.
  *
  * q274 computes the longest contiguous common shingle run for every
  * simhash-banded candidate pair — longest-common-substring at shingle
  * granularity via the diagonal + gaps-and-islands trick (no dynamic
  * programming, no per-pair state). It answers the question overlap
  * scores cannot: is the shared material one lifted passage or
  * scattered phrases?
  */
object R7qQueries {

  /** EXACT form — verification twin by contract (`_exact` suffix): the
    * candidate generator runs with no bucket cap, so replica cliques
    * cost their full pair count. The bucket-capped production form is
    * q299. */
  private val q274 = QueryDef(
    "q274_common_runs_exact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      NearDup.commonRunLengths(docs, "doc_id", "text",
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        shingleN = 3)
    },
    Some(s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ps AS (SELECT doc_id,
               unnest(${ExtQueries.oShingles("w", 3)}) AS sh,
               unnest(generate_series(1, len(w) - 2)) AS pos
             FROM t WHERE len(w) >= 3),
      m AS (SELECT p.a_id, p.b_id, a.pos AS i, b.pos AS j
            FROM prs p
            JOIN ps a ON a.doc_id = p.a_id
            JOIN ps b ON b.doc_id = p.b_id AND b.sh = a.sh),
      isl AS (SELECT a_id, b_id, i - j AS diag, i,
              i - row_number() OVER (PARTITION BY a_id, b_id, i - j
                ORDER BY i) AS grp
              FROM m),
      runs AS (SELECT a_id, b_id, CAST(count(*) AS BIGINT) AS run
               FROM isl GROUP BY a_id, b_id, diag, grp)
      SELECT a_id, b_id, CAST(sum(run) AS BIGINT) AS n_matches,
             CAST(max(run) AS BIGINT) AS max_run
      FROM runs GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q274)
}
