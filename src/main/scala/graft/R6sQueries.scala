package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus, Retrieval, Stats}

/** Round-6 wave 21: rank correlation, positional phrase search, and
  * community detection.
  *
  * q241 measures monotone association between order quantity and
  * revenue without distribution assumptions (Spearman); q242 finds
  * exact consecutive-token phrases that bag-of-words retrieval cannot
  * express; q243 runs label propagation over the near-dup graph —
  * the densely-connected-community granularity between q73's
  * components and q215's fixed source partition.
  */
object R6sQueries {

  /** Spearman rank correlation of lineitem quantity vs extended price
    * (exact centered-rank sums; rho quantized at 2^−20). */
  private val q241 = QueryDef(
    "q241_spearman",
    (s, d) => Stats.spearman(Tables.lineitem(s, d),
      col("l_quantity"), col("l_extendedprice")),
    Some("""
      WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
              CAST(l_extendedprice AS DOUBLE) AS y
            FROM lineitem
            WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      rx AS (SELECT v AS x, 2 * (cum - t) + t + 1 AS ax FROM (
            SELECT v, t, CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN
              UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM (SELECT x AS v, CAST(count(*) AS BIGINT) AS t
                  FROM b GROUP BY 1))),
      ry AS (SELECT v AS y, 2 * (cum - t) + t + 1 AS ay FROM (
            SELECT v, t, CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN
              UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM (SELECT y AS v, CAST(count(*) AS BIGINT) AS t
                  FROM b GROUP BY 1))),
      jt AS (SELECT CAST(ax - (n + 1) AS HUGEINT) AS xc,
              CAST(ay - (n + 1) AS HUGEINT) AS yc, n
            FROM b JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN nn),
      ag AS (SELECT max(n) AS n,
              CAST(sum(xc * yc) AS HUGEINT) AS num,
              CAST(sum(xc * xc) AS HUGEINT) AS dx,
              CAST(sum(yc * yc) AS HUGEINT) AS dy
            FROM jt),
      f AS (SELECT n, num, dx, dy,
              CASE WHEN dx > 0
                THEN CAST((abs(num) * 1048576) // dx AS BIGINT) END AS a20,
              CASE WHEN dy > 0
                THEN CAST((abs(num) * 1048576) // dy AS BIGINT) END AS b20
            FROM ag)
      SELECT n,
        CASE WHEN dx > 0 AND dy > 0
          THEN (CASE WHEN num < 0 THEN -1.0 ELSE 1.0 END)
            * sqrt((CAST(a20 AS DOUBLE) / 1048576.0)
              * (CAST(b20 AS DOUBLE) / 1048576.0)) END AS rho
      FROM f"""))

  private val Phrase = Seq("table", "scan")

  /** Exact consecutive-token phrase search over documents. */
  private val q242 = QueryDef(
    "q242_phrase_search",
    (s, d) => Retrieval.phraseSearch(Tables.documents(s, d),
      "doc_id", "text", Phrase),
    Some {
      val joins = Phrase.zipWithIndex.tail.map { case (_, i) =>
        s"JOIN pos p$i ON p$i.doc_id = p0.doc_id " +
          s"AND p$i.pos = p0.pos + $i"
      }.mkString("\n            ")
      val terms = Phrase.zipWithIndex.map { case (t, i) =>
        s"p$i.term = '$t'"
      }.mkString(" AND ")
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
             FROM documents),
      pos AS (SELECT doc_id, CAST(p - 1 AS INT) AS pos, w[p] AS term
              FROM (SELECT doc_id, w,
                      unnest(generate_series(1, len(w))) AS p
                    FROM t)),
      m AS (SELECT p0.doc_id, p0.pos AS pos0
            FROM pos p0
            $joins
            WHERE $terms)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
        CAST(min(pos0) AS INT) AS first_pos
      FROM m GROUP BY 1"""
    })

  private val LpaRounds = 5

  /** Label-propagation communities over the q72 SimHash near-dup
    * graph (5 synchronous rounds, min-label tiebreak). */
  private val q243 = QueryDef(
    "q243_label_propagation",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Corpus.simHashHammingPairs(docs, "doc_id", "text",
        maxHamming = 3).select(col("a_id"), col("b_id"))
      Clusters.labelPropagation(docs.select(col("doc_id")), "doc_id",
        pairs, "a_id", "b_id", LpaRounds)
    },
    Some {
      val roundCtes = (1 to LpaRounds).map { k =>
        s"""l$k AS MATERIALIZED (
          SELECT l.id, COALESCE(b.new_label, l.label) AS label
          FROM l${k - 1} l LEFT JOIN (
            SELECT id, label AS new_label FROM (
              SELECT id, label, row_number() OVER (PARTITION BY id
                ORDER BY nn DESC, label) AS rn
              FROM (SELECT id, label, CAST(count(*) AS BIGINT) AS nn
                    FROM (SELECT m.dst AS id, l2.label
                          FROM sym m JOIN l${k - 1} l2 ON l2.id = m.src
                          UNION ALL
                          SELECT id, label FROM l${k - 1})
                    GROUP BY 1, 2))
            WHERE rn = 1) b ON b.id = l.id)"""
      }.mkString(",\n      ")
      s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      sym AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM prs
             UNION SELECT b_id AS src, a_id AS dst FROM prs),
      l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS label
             FROM documents),
      $roundCtes
      SELECT l.id AS doc_id, l.label, s.community_size
      FROM l$LpaRounds l JOIN (SELECT label,
          CAST(count(*) AS BIGINT) AS community_size
        FROM l$LpaRounds GROUP BY 1) s USING (label)"""
    })

  val all: Seq[QueryDef] = Seq(q241, q242, q243)
}
