package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Clusters, Scale, Similarity}

/** Round-5 wave 11: integer-exact PageRank over the trade graph, a
  * zone-map data-skipping audit of natural vs date-clustered layout,
  * and per-label embedding-centroid cosine in exact integer math.
  */
object R5kQueries {

  private val PrScale = 1000000000000L
  private val PrIters = 3

  /** One unrolled PageRank round in DuckDB SQL (mirrors
    * Clusters.pageRankInt's integer recurrence). SUM over BIGINT widens
    * to HUGEINT in DuckDB; values stay ≤ ~scale so the math is identical
    * and the final SELECT casts back to BIGINT. */
  private def prRound(k: Int): String = {
    val prev = if (k == 1) "r0" else s"r${k - 1}"
    s"""r$k AS (SELECT e.dst AS src, d.deg,
         (SELECT base FROM c0) + SUM((85 * r.rank) // (100 * r.deg)) AS rank
       FROM e JOIN $prev r ON r.src = e.src JOIN deg d ON d.src = e.dst
       GROUP BY e.dst, d.deg)"""
  }

  /** Entity importance on the undirected customer↔supplier graph
    * (edge = at least one lineitem shipped by the supplier inside one of
    * the customer's orders), ranks bit-exact in scaled-integer math.
    * Vertices are parity-encoded longs (customer 2k, supplier 2k+1):
    * integer keys shuffle several times faster than 'C'/'S'-prefixed
    * strings, and the dedup runs on the compact pair before any
    * symmetrization. */
  private val q171 = QueryDef(
    "q171_pagerank",
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("cust"),
          (col("l_suppkey") * 2 + 1).as("supp"))
      Clusters.pageRankInt(edges, "cust", "supp", iters = PrIters,
        scale = PrScale)
    },
    Some(s"""
      WITH ce AS (SELECT DISTINCT
              o_custkey * 2 AS c,
              l_suppkey * 2 + 1 AS sv
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      e AS (SELECT c AS src, sv AS dst FROM ce
            UNION ALL SELECT sv, c FROM ce),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      n AS (SELECT count(*) AS N FROM deg),
      c0 AS (SELECT $PrScale // N AS rinit,
               (15 * ($PrScale // N)) // 100 AS base FROM n),
      r0 AS (SELECT src, deg, (SELECT rinit FROM c0) AS rank FROM deg),
      ${(1 to PrIters).map(prRound).mkString(",\n      ")}
      SELECT src AS vertex, deg, CAST(rank AS BIGINT) AS rank
      FROM r$PrIters"""))

  private val ZFiles = 16

  /** Zone-map data-skipping audit: the same lineitem rows laid out in
    * insertion order vs clustered by ship date, split into $ZFiles
    * equal-row files by exact integer rank math; per yearly predicate,
    * how many files a min/max-footer reader must open. The clustered
    * layout's files_skipped ≈ (1 - 1/years)·files is the quantitative
    * case for sort-on-write at 100 TB. Ranks come from
    * Scale.globalRowNumber (telescoped, no single-task global sort). */
  private val q172 = QueryDef(
    "q172_zonemap_audit",
    (s, d) => {
      import s.implicits._
      // materialize the projected fact ONCE: both layout passes rank the
      // same frame, and the row count is layout-invariant — computing it
      // from li (not from each ranked output) avoids re-running the whole
      // global-numbering DAG per layout just to count its rows
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("sd"))
        .filter(col("sd").isNotNull)
        .withColumn("tb", col("l_orderkey") * 8 + col("l_linenumber"))
        .withColumn("day_v",
          datediff(col("sd"), lit("1992-01-01").cast("date")))
        .localCheckpoint()
      val n = li.agg(count(lit(1)).as("__N")).localCheckpoint()
      def fileStats(valueCol: String, layout: String) = {
        val ranked = Scale.globalRowNumber(li, valueCol, "tb")
        ranked.crossJoin(broadcast(n))
          .withColumn("file_id",
            expr(s"cast(((global_rn - 1) * $ZFiles) div __N as int)"))
          .groupBy(col("file_id"))
          .agg(min(col("sd")).as("f_lo"), max(col("sd")).as("f_hi"),
            count(lit(1)).as("n_rows"))
          .withColumn("layout", lit(layout))
      }
      val files = fileStats("tb", "natural")
        .union(fileStats("day_v", "clustered"))
      val preds = (1992 to 1998).map(y => (s"y$y",
          java.sql.Date.valueOf(s"$y-01-01"),
          java.sql.Date.valueOf(s"$y-12-31")))
        .toDF("pred_id", "p_lo", "p_hi")
      val hit = col("f_hi") >= col("p_lo") && col("f_lo") <= col("p_hi")
      files.crossJoin(broadcast(preds))
        .groupBy(col("layout"), col("pred_id"))
        .agg(sum(when(hit, 1L).otherwise(0L)).as("files_read"),
          sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_read"))
        .withColumn("files_skipped",
          lit(ZFiles.toLong) - col("files_read"))
    },
    Some {
      val preds = (1992 to 1998).map(y =>
        s"('y$y', DATE '$y-01-01', DATE '$y-12-31')").mkString(",\n        ")
      s"""
      WITH li AS (SELECT l_orderkey * 8 + l_linenumber AS tb,
              CAST(l_shipdate AS DATE) AS sd
            FROM lineitem WHERE l_shipdate IS NOT NULL),
      n AS (SELECT count(*) AS N FROM li),
      nat AS (SELECT sd,
              CAST(((row_number() OVER (ORDER BY tb) - 1) * $ZFiles)
                // (SELECT N FROM n) AS INT) AS file_id FROM li),
      clu AS (SELECT sd,
              CAST(((row_number() OVER (ORDER BY sd, tb) - 1) * $ZFiles)
                // (SELECT N FROM n) AS INT) AS file_id FROM li),
      f AS (SELECT 'natural' AS layout, file_id, min(sd) AS f_lo,
              max(sd) AS f_hi, count(*) AS n_rows FROM nat GROUP BY 2
            UNION ALL
            SELECT 'clustered', file_id, min(sd), max(sd), count(*)
            FROM clu GROUP BY 2),
      p AS (SELECT * FROM (VALUES
        $preds) AS t(pred_id, p_lo, p_hi))
      SELECT layout, pred_id,
        CAST(SUM(CASE WHEN f_hi >= p_lo AND f_lo <= p_hi
          THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
        CAST(SUM(CASE WHEN f_hi >= p_lo AND f_lo <= p_hi
          THEN n_rows ELSE 0 END) AS BIGINT) AS rows_read,
        CAST($ZFiles - SUM(CASE WHEN f_hi >= p_lo AND f_lo <= p_hi
          THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped
      FROM f CROSS JOIN p GROUP BY 1, 2"""
    })

  /** Class-prototype proximity: cosine between per-label embedding
    * centroids, exact to the bit via scaled-integer sums (see
    * Similarity.labelCentroidCosine). */
  private val q173 = QueryDef(
    "q173_label_centroid_cos",
    (s, d) => Similarity.labelCentroidCosine(Tables.embeddings(s, d),
      "vec_id", "embedding", "label"),
    Some("""
      WITH x AS (SELECT label,
              unnest(embedding) AS x,
              unnest(generate_series(0, len(embedding) - 1)) AS pos
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL),
      comp AS (SELECT label, pos,
              CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))
                AS BIGINT) AS c
            FROM x GROUP BY 1, 2),
      norms AS (SELECT label, CAST(SUM(c * c) AS BIGINT) AS nn
            FROM comp GROUP BY 1),
      dots AS (SELECT a.label AS label_a, b.label AS label_b,
              CAST(SUM(a.c * b.c) AS BIGINT) AS dot
            FROM comp a JOIN comp b
              ON a.pos = b.pos AND a.label < b.label
            GROUP BY 1, 2)
      SELECT d.label_a, d.label_b, d.dot,
        CASE WHEN na.nn = 0 OR nb.nn = 0 THEN NULL
          ELSE CAST(d.dot AS DOUBLE)
            / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
          END AS cos
      FROM dots d
      JOIN norms na ON na.label = d.label_a
      JOIN norms nb ON nb.label = d.label_b"""))

  val all: Seq[QueryDef] = Seq(q171, q172, q173)
}
