package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{DateSpine, NearDup}

/** Round-2 additions: edge semantics of the reference surfaced by the
  * round-1 review (VERDICT.md) — the date-spine NULL-bounds fallback and
  * the df-capped n-gram Jaccard — each with a DuckDB oracle that mirrors
  * the exact semantics.
  */
object R2Queries {

  /** X1 edge: the reference's ISNULL bounds fallback (SQLproject1.sql:262-
    * 263) — an all-NULL date column still yields the full 2010-01-01..
    * 2025-12-31 spine (5,844 days), not an empty date dim. */
  private val q67 = QueryDef(
    "q67_date_spine_fallback",
    (s, d) => {
      // a "bad file drop": every date failed to parse
      val allNull = Tables.orders(s, d).select(
        lit(null).cast("date").as("bad_lo"), lit(null).cast("date").as("bad_hi"))
      DateSpine.fromBounds(allNull, col("bad_lo"), col("bad_hi"))
        .select(col("date_key"),
          date_format(col("date"), "yyyy-MM-dd").as("date_str"),
          col("year"), col("quarter"), col("month"), col("day"),
          col("week_of_year"), col("month_name"), col("quarter_name"),
          col("is_weekend"))
    },
    Some("""
      WITH days AS (SELECT unnest(generate_series(
             DATE '2010-01-01', DATE '2025-12-31', INTERVAL 1 DAY))::DATE AS d)
      SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
             strftime(d, '%Y-%m-%d') AS date_str,
             CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
             CAST(month(d) AS INT) AS month, CAST(day(d) AS INT) AS day,
             CAST(weekofyear(d) AS INT) AS week_of_year,
             monthname(d) AS month_name,
             'Q' || CAST(quarter(d) AS VARCHAR) AS quarter_name,
             dayname(d) IN ('Saturday', 'Sunday') AS is_weekend
      FROM days"""))

  private val CapDf = 25

  /** The hot-shingle df cap actually EXERCISED (maxDf low enough to drop
    * shingles on this corpus), with the oracle mirroring the capped
    * semantics: df over distinct postings, postings with df > cap removed
    * from both intersections and set sizes, then exact Jaccard. */
  private val q68 = QueryDef(
    "q68_ngram_jaccard_capped",
    (s, d) => NearDup.ngramJaccardPairs(Tables.documents(s, d), "doc_id",
      "text", n = 3, threshold = 0.1, maxDf = CapDf),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w FROM documents),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      posting AS (SELECT doc_id, unnest(sh) AS s FROM ws),
      df AS (SELECT s, COUNT(*) AS c FROM posting GROUP BY s),
      capped AS (SELECT p.doc_id, p.s FROM posting p JOIN df USING (s)
                 WHERE c <= $CapDf),
      sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       COUNT(*) AS intersection
                FROM capped a JOIN capped b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, intersection,
             CAST(intersection AS DOUBLE) /
               CAST(sa.n_sh + sb.n_sh - intersection AS DOUBLE) AS jaccard
      FROM pairs
      JOIN sz sa ON a_id = sa.doc_id
      JOIN sz sb ON b_id = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) /
              CAST(sa.n_sh + sb.n_sh - intersection AS DOUBLE) >= 0.1"""))

  val all: Seq[QueryDef] = Seq(q67, q68)
}
