package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus}

/** Round-8 wave 1: graph ownership and mixing structure.
  *
  * q291 partitions the near-dup graph into landmark Voronoi regions —
  * which seed OWNS each node, the sharding/takedown refinement of
  * q252's distance-only BFS; q292 reports degree assortativity — do
  * heavily-duplicated docs link to other heavy duplicators (mirror
  * farms, positive) or to singletons (hub-and-spoke, negative)?
  */
object R8Queries {

  private val q291 = QueryDef(
    "q291_graph_voronoi",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.graphVoronoi(docs, "doc_id", col("doc_id") % 97 === 0,
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id", maxHops = 4)
    },
    Some {
      val steps = (1 to 4).map { t =>
        s"""
      d$t AS MATERIALIZED (
        SELECT id, hops, seed FROM (
          SELECT id, hops, seed,
                 row_number() OVER (PARTITION BY id
                   ORDER BY hops, seed) AS rn
          FROM (
            SELECT id, hops, seed FROM d${t - 1}
            UNION ALL
            SELECT e.dst AS id, d.hops + 1 AS hops, d.seed
            FROM d${t - 1} d JOIN edges e ON e.src = d.id))
        WHERE rn = 1)"""
      }.mkString(",")
      s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      edges AS MATERIALIZED (
        SELECT a_id AS src, b_id AS dst FROM prs
        UNION SELECT b_id, a_id FROM prs),
      d0 AS (SELECT doc_id AS id, 0 AS hops, doc_id AS seed
             FROM documents WHERE doc_id % 97 = 0),$steps
      SELECT id AS doc_id, CAST(hops AS INT) AS hops, seed FROM d4"""
    })

  private val q292 = QueryDef(
    "q292_assortativity",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.degreeAssortativity(
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id")
    },
    Some(s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      e AS (SELECT DISTINCT a_id AS a, b_id AS b FROM prs),
      sym AS (SELECT a AS u, b AS v FROM e
              UNION ALL SELECT b, a FROM e),
      deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym
              GROUP BY 1),
      j AS (SELECT CAST(da.d AS HUGEINT) AS da, CAST(db.d AS HUGEINT)
                AS db
            FROM sym
            JOIN deg da ON da.u = sym.u
            JOIN deg db ON db.u = sym.v),
      a AS (SELECT CAST(count(*) AS BIGINT) AS m2,
              sum(da) AS sa, sum(db) AS sb, sum(da * db) AS sab,
              sum(da * da) AS saa, sum(db * db) AS sbb
            FROM j)
      SELECT m2,
             CAST(m2 * sab - sa * sb AS DOUBLE)
               / sqrt(CAST(m2 * saa - sa * sa AS DOUBLE)
                 * CAST(m2 * sbb - sb * sb AS DOUBLE)) AS assortativity
      FROM a"""))

  val all: Seq[QueryDef] = Seq(q291, q292)
}
