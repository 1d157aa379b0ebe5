package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Retrieval, Windows}

/** Round-6 wave 10: robust trends, seasonality, and the inverted-index
  * build.
  *
  * q208 adds the outlier-immune Theil–Sen trend the OLS slope (q146)
  * is not; q209 produces the day-of-week seasonal profile that
  * deseasonalizes daily series before anomaly scoring (q120); q210
  * materializes the serving-side inverted index behind BM25 (q107).
  */
object R6hQueries {

  private def money(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  /** Theil–Sen slope of monthly revenue per order priority
    * (Windows.theilSenSlope; x = months since year 0). */
  private val q208 = QueryDef(
    "q208_theilsen_trend",
    (s, d) => {
      val monthly = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull)
        .groupBy(col("o_orderpriority").as("priority"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg(sum(money(col("o_totalprice"))).as("rev"))
      Windows.theilSenSlope(monthly, Seq("priority"), "x", "rev")
    },
    Some("""
      WITH m AS (SELECT o_orderpriority AS priority,
              CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                AS x,
              SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
      p AS (SELECT a.priority,
              CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
                AS slope,
              a.x AS xi, b.x AS xj
            FROM m a JOIN m b ON a.priority = b.priority AND a.x < b.x),
      r AS (SELECT *, row_number() OVER (PARTITION BY priority
              ORDER BY slope, xi, xj) AS r,
              CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS mm
            FROM p),
      n AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_points
            FROM m GROUP BY 1)
      SELECT r.priority, r.mm AS n_pairs, r.slope AS theil_sen_slope,
        n.n_points
      FROM r JOIN n USING (priority) WHERE r.r = (r.mm + 1) // 2"""))

  /** Day-of-week seasonal index of daily revenue per priority
    * (Windows.seasonalIndex). */
  private val q209 = QueryDef(
    "q209_seasonal_index",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull)
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).as("rev"))
      Windows.seasonalIndex(daily, Seq("priority"), "day", "rev")
    },
    Some("""
      WITH d AS (SELECT o_orderpriority AS priority,
              CAST(o_orderdate AS DATE) AS day,
              SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
            FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
      b AS (SELECT priority, CAST(date_part('dow', day) AS INT) AS dow, y
            FROM d),
      g AS (SELECT priority, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
              SUM(y) AS sd
            FROM b GROUP BY 1, 2),
      t AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS s
            FROM b GROUP BY 1)
      SELECT g.priority, g.dow, g.n_days,
        CAST(g.sd * t.n AS DOUBLE) / CAST(g.n_days * t.s AS DOUBLE)
          AS seasonal_index
      FROM g JOIN t USING (priority)"""))

  /** Inverted-index build over documents (Retrieval.invertedIndex):
    * df / total_tf / order-pinned postings fingerprint per term. */
  private val q210 = QueryDef(
    "q210_inverted_index",
    (s, d) => Retrieval.invertedIndex(Tables.documents(s, d),
      "doc_id", "text", minTermLen = 4),
    Some(s"""
      WITH x AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS term,
              unnest(generate_series(0,
                len(${ExtQueries.oToks("text")}) - 1)) AS pos
            FROM documents),
      f AS (SELECT * FROM x WHERE length(term) >= 4),
      pd AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
              CAST(MIN(pos) AS INT) AS first_pos
            FROM f GROUP BY 1, 2)
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        CAST(SUM(tf) AS BIGINT) AS total_tf,
        md5(string_agg(CAST(doc_id AS VARCHAR) || ':'
          || CAST(tf AS VARCHAR) || ':' || CAST(first_pos AS VARCHAR),
          '|' ORDER BY doc_id)) AS postings_fp
      FROM pd GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q208, q209, q210)
}
