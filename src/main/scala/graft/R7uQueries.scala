package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus, NearDup}

/** Round-7 wave 21: split hygiene and internal repetition.
  *
  * q280 measures each document's longest INTERNAL repeated passage
  * (template stuffing — q63 only measures how much repeats, not
  * whether it is one block); q281 assigns stratified k-folds balanced
  * ±1 per language by construction; q282 splits train/val/test by
  * near-dup CLUSTER so duplicates never straddle a boundary — the
  * constructive fix for the leakage q151 audits.
  */
object R7uQueries {

  private val q280 = QueryDef(
    "q280_self_repeat_runs",
    (s, d) => NearDup.selfRepeatRuns(Tables.documents(s, d), "doc_id",
      "text", shingleN = 3, maxTokens = 2048),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ps AS (SELECT doc_id,
               unnest(${ExtQueries.oShingles("w", 3)}[1:2048]) AS sh,
               unnest(generate_series(1,
                 LEAST(len(w) - 2, 2048))) AS pos
             FROM t WHERE len(w) >= 3),
      m AS (SELECT a.doc_id, a.pos AS i, b.pos AS j
            FROM ps a JOIN ps b
              ON a.doc_id = b.doc_id AND a.sh = b.sh AND a.pos < b.pos),
      isl AS (SELECT doc_id, j - i AS diag, i,
              i - row_number() OVER (PARTITION BY doc_id, j - i
                ORDER BY i) AS grp
              FROM m),
      runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS run
               FROM isl GROUP BY doc_id, diag, grp)
      SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_self_matches,
             CAST(max(run) AS BIGINT) AS max_run
      FROM runs GROUP BY 1"""))

  private val Folds = 5

  private val q281 = QueryDef(
    "q281_stratified_folds",
    (s, d) => Corpus.stratifiedFolds(Tables.documents(s, d), "doc_id",
      "lang", Folds),
    Some(s"""
      SELECT doc_id, lang AS stratum,
             CAST((row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
               % $Folds AS INT) AS fold
      FROM documents"""))

  private val q282 = QueryDef(
    "q282_cluster_split",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val labels = Clusters.connectedComponents(docs, "doc_id",
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id")
      Corpus.clusterSplit(labels, "doc_id", trainPct = 80, valPct = 10)
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
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
              GROUP BY id)
      SELECT doc_id, cluster_id,
             CASE WHEN $bucket < 80 THEN 'train'
                  WHEN $bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM lbl"""
    })

  val all: Seq[QueryDef] = Seq(q280, q281, q282)
}
