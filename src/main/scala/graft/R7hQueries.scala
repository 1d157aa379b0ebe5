package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus, Stats}

/** Round-7 wave 8: aggregation-bias and edge-cohesion screens.
  *
  * q257 asks whether the discount→revenue association inside each
  * return-flag stratum agrees with the pooled association — the
  * Simpson's-paradox audit that decides whether a dashboard's pooled
  * trend can be trusted; q258 filters the near-dup graph to its
  * (bounded-round) 4-truss — edges corroborated by ≥ 2 common
  * neighbors — the edge-level counterpart to q187's vertex k-core.
  */
object R7hQueries {

  private val q257 = QueryDef(
    "q257_simpson_screen",
    (s, d) => Stats.simpsonScreen(
      Tables.lineitem(s, d),
      Seq("l_returnflag"),
      (col("l_discount").cast(DecimalType(4, 2)) * 100).cast("long"),
      (col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast("long")),
    Some("""
      WITH b AS (
        SELECT l_returnflag,
               CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS HUGEINT) AS x,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                 AS HUGEINT) AS y
        FROM lineitem
        WHERE l_discount IS NOT NULL AND l_extendedprice IS NOT NULL),
      g AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy
            FROM b GROUP BY 1),
      gn AS (SELECT l_returnflag, n,
                    CAST(n AS HUGEINT) * sxy - sx * sy AS num
             FROM g),
      p AS (SELECT CAST(count(*) AS HUGEINT) * sum(x * y)
                     - sum(x) * sum(y) AS pnum
            FROM b),
      ps AS (SELECT CASE WHEN pnum > 0 THEN 1 WHEN pnum < 0 THEN -1
                         ELSE 0 END AS pooled_sign FROM p)
      SELECT l_returnflag, n,
             CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
               AS group_sign,
             ps.pooled_sign,
             (CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END)
               * ps.pooled_sign = -1 AS is_reversed,
             CAST(num AS DOUBLE) / CAST(n * n AS DOUBLE) AS cov_scale
      FROM gn CROSS JOIN ps"""))

  private val TrussK = 4
  private val TrussRounds = 3

  /** EXACT (uncapped) truss — verification twin by contract (`_exact`
    * suffix + `uncapped = true` opt-in); the degree-capped production
    * form is q260. */
  private val q258 = QueryDef(
    "q258_ktruss_exact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.kTruss(
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id", k = TrussK, rounds = TrussRounds,
        maxDegree = None, uncapped = true)
    },
    Some {
      def round(t: Int): String = s"""
      tr$t AS (SELECT w.a, w.b, w.c
             FROM (SELECT e1.a, e1.b, e2.b AS c
                   FROM e${t - 1} e1 JOIN e${t - 1} e2
                     ON e1.a = e2.a AND e1.b < e2.b) w
             JOIN e${t - 1} e3 ON e3.a = w.b AND e3.b = w.c),
      cnt$t AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM (
               SELECT a, b FROM tr$t
               UNION ALL SELECT a, c FROM tr$t
               UNION ALL SELECT b, c FROM tr$t) GROUP BY 1, 2)"""
      val peels = (1 to TrussRounds).map { t =>
        round(t) + s""",
      e$t AS MATERIALIZED (SELECT e.a, e.b FROM e${t - 1} e
             JOIN cnt$t c USING (a, b) WHERE c.cnt >= ${TrussK - 2})"""
      }.mkString(",")
      val fin = TrussRounds + 1
      s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      e0 AS MATERIALIZED (SELECT DISTINCT a_id AS a, b_id AS b FROM prs),
      $peels,
      ${round(fin)}
      SELECT e.a AS a_id, e.b AS b_id, COALESCE(c.cnt, 0) AS support
      FROM e$TrussRounds e LEFT JOIN cnt$fin c USING (a, b)"""
    })

  private val TrussDegCap = 30

  /** The SCALE twin of q258 (the q34/q68 pattern): identical truss
    * peeling after dropping vertices with more than `TrussDegCap`
    * near-dup neighbors. On a raw graph with replica cliques (the
    * pathology exact-dedup normally removes upstream), triangle
    * enumeration is output-bound at Θ(clique³); the cap bounds wedge
    * work at |V|·cap² regardless of clique structure. */
  private val q260 = QueryDef(
    "q260_ktruss_capped",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.kTruss(
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id", k = TrussK, rounds = TrussRounds,
        maxDegree = Some(TrussDegCap))
    },
    Some {
      def round(t: Int): String = s"""
      tr$t AS (SELECT w.a, w.b, w.c
             FROM (SELECT e1.a, e1.b, e2.b AS c
                   FROM e${t - 1} e1 JOIN e${t - 1} e2
                     ON e1.a = e2.a AND e1.b < e2.b) w
             JOIN e${t - 1} e3 ON e3.a = w.b AND e3.b = w.c),
      cnt$t AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM (
               SELECT a, b FROM tr$t
               UNION ALL SELECT a, c FROM tr$t
               UNION ALL SELECT b, c FROM tr$t) GROUP BY 1, 2)"""
      val peels = (1 to TrussRounds).map { t =>
        round(t) + s""",
      e$t AS MATERIALIZED (SELECT e.a, e.b FROM e${t - 1} e
             JOIN cnt$t c USING (a, b) WHERE c.cnt >= ${TrussK - 2})"""
      }.mkString(",")
      val fin = TrussRounds + 1
      s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      raw AS (SELECT DISTINCT a_id AS a, b_id AS b FROM prs),
      deg AS (SELECT v, count(*) AS d FROM (
                SELECT a AS v FROM raw UNION ALL SELECT b FROM raw)
              GROUP BY 1),
      hot AS (SELECT v FROM deg WHERE d > $TrussDegCap),
      e0 AS MATERIALIZED (
        SELECT a, b FROM raw
        WHERE a NOT IN (SELECT v FROM hot)
          AND b NOT IN (SELECT v FROM hot)),
      $peels,
      ${round(fin)}
      SELECT e.a AS a_id, e.b AS b_id, COALESCE(c.cnt, 0) AS support
      FROM e$TrussRounds e LEFT JOIN cnt$fin c USING (a, b)"""
    })

  val all: Seq[QueryDef] = Seq(q257, q258, q260)
}
