package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Clusters, Corpus, Stats}

/** Round-7 wave 4: structural detection — where did a series break, and
  * how close is a document to a seed set.
  *
  * q251 finds the single best changepoint per revenue series (binary
  * segmentation's first split — q165's CUSUM says "drift is happening",
  * this says WHERE it happened); q252 computes bounded multi-source BFS
  * hop distances from landmark documents over the near-dup graph — the
  * contamination-blast-radius / seed-proximity feature the flat q73
  * components can't express (membership yes, distance no).
  */
object R7dQueries {

  private val q251 = QueryDef(
    "q251_changepoint",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("day"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
      Stats.changepoint(daily, Seq("prio"), "day", "cents")
        .withColumn("split_at", col("split_at").cast("string"))
    },
    Some("""
      WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) * 100
                    AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY 1, 2),
      seq AS (
        SELECT prio, day, cents,
               row_number() OVER (PARTITION BY prio ORDER BY day) AS c,
               CAST(sum(cents) OVER (PARTITION BY prio ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS HUGEINT) AS sl,
               CAST(count(*) OVER (PARTITION BY prio) AS BIGINT) AS n,
               CAST(sum(cents) OVER (PARTITION BY prio) AS HUGEINT) AS s
        FROM daily),
      cand AS (
        SELECT prio, day, c, n, sl, s - sl AS sr,
               CAST(sl * sl * (n - c) + (s - sl) * (s - sl) * c AS DOUBLE)
                 / CAST(c * (n - c) AS DOUBLE)
                 - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE) AS gain
        FROM seq WHERE c < n),
      best AS (
        SELECT prio, day, c, n, sl, sr, gain,
               row_number() OVER (PARTITION BY prio
                 ORDER BY gain DESC, c) AS rn
        FROM cand)
      SELECT prio, n AS n_points, CAST(c AS BIGINT) AS split_pos,
             strftime(day, '%Y-%m-%d') AS split_at,
             CAST(sl AS DOUBLE) / CAST(c AS DOUBLE) AS left_mean,
             CAST(sr AS DOUBLE) / CAST(n - c AS DOUBLE) AS right_mean,
             gain
      FROM best WHERE rn = 1"""))

  private val q252 = QueryDef(
    "q252_bfs_hops",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Clusters.bfsHops(docs, "doc_id", col("doc_id") % 97 === 0,
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id", maxHops = 4)
    },
    Some {
      val steps = (1 to 4).map { t =>
        s"""
      d$t AS MATERIALIZED (
        SELECT id, MIN(hops) AS hops FROM (
          SELECT id, hops FROM d${t - 1}
          UNION ALL
          SELECT e.dst AS id, d.hops + 1 AS hops
          FROM d${t - 1} d JOIN edges e ON e.src = d.id)
        GROUP BY id)"""
      }.mkString(",")
      s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      edges AS MATERIALIZED (
        SELECT a_id AS src, b_id AS dst FROM prs
        UNION SELECT b_id, a_id FROM prs),
      d0 AS (SELECT doc_id AS id, 0 AS hops FROM documents
             WHERE doc_id % 97 = 0),$steps
      SELECT id AS doc_id, CAST(hops AS INT) AS hops FROM d4"""
    })

  val all: Seq[QueryDef] = Seq(q251, q252)
}
