package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Corpus, Quality}

/** Round-4 wave 5: robust (winsorized/trimmed) aggregates, crawl-URL
  * canonical dedup, temperature-scaled source mixing with exact integer
  * apportionment, and fixed-range histograms. */
object R4dQueries {

  private val PLow = 0.05
  private val PHigh = 0.95

  /** Winsorized + trimmed means per return flag (rank-quantile cutoffs;
    * tie-invariant sums — see Quality.winsorizedStats scaladoc). */
  private val q113 = QueryDef(
    "q113_winsorized",
    (s, d) => Quality.winsorizedStats(Tables.lineitem(s, d),
      Seq("l_returnflag"), "l_extendedprice", PLow, PHigh),
    Some(s"""
      WITH r AS (SELECT l_returnflag, l_extendedprice AS v,
              row_number() OVER (PARTITION BY l_returnflag
                ORDER BY l_extendedprice) AS rn,
              count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem),
      -- CAST the p literals to DOUBLE: a decimal 0.05*n rounds ceil()
      -- differently from the engine's double multiply at exact boundaries
      k AS (SELECT *,
              CAST(ceil(CAST($PLow AS DOUBLE) * n
                - CAST(1e-9 AS DOUBLE)) AS BIGINT) AS klo,
              CAST(ceil(CAST($PHigh AS DOUBLE) * n
                - CAST(1e-9 AS DOUBLE)) AS BIGINT) AS khi
            FROM r),
      c AS (SELECT *,
              max(CASE WHEN rn <= klo THEN v END)
                OVER (PARTITION BY l_returnflag) AS lo,
              max(CASE WHEN rn <= khi THEN v END)
                OVER (PARTITION BY l_returnflag) AS hi
            FROM k)
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             min(lo) AS low_cut, min(hi) AS high_cut,
             CAST(SUM(CAST(least(greatest(v, coalesce(lo, v)), hi)
                 AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS winsorized_mean,
             CAST(SUM(CASE WHEN rn > klo AND rn <= khi
                 THEN CAST(v AS DECIMAL(18,2)) END) AS DOUBLE) /
               nullif(SUM(CASE WHEN rn > klo AND rn <= khi
                 THEN 1 ELSE 0 END), 0)
               AS trimmed_mean
      FROM c GROUP BY l_returnflag"""))

  /** Deterministic messy-URL synthesis shared by the Spark query and the
    * oracle: scheme case, www, default port, trailing slash, query
    * string, fragment all vary by doc_id residues; ~20 docs share each
    * canonical page. */
  private val q114 = QueryDef(
    "q114_url_resolve",
    (s, d) => {
      val docs = Tables.documents(s, d).withColumn("url",
        concat(
          when(pmod(col("doc_id"), lit(3)) === 0, "HTTP://WWW.")
            .when(pmod(col("doc_id"), lit(3)) === 1, "http://")
            .otherwise("https://"),
          col("source"), lit(".Example.com"),
          when(pmod(col("doc_id"), lit(5)) === 0, ":80").otherwise(""),
          lit("/docs/"), col("lang"), lit("/p"),
          pmod(col("doc_id"), lit(25)).cast("string"),
          when(pmod(col("doc_id"), lit(11)) === 0, "/").otherwise(""),
          when(pmod(col("doc_id"), lit(7)) === 0, "?utm_source=feed").otherwise(""),
          when(pmod(col("doc_id"), lit(2)) === 0, "#sec1").otherwise("")))
      Corpus.urlResolve(docs, "doc_id", "url")
    },
    Some("""
      WITH u AS (SELECT doc_id,
              (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.'
                    WHEN doc_id % 3 = 1 THEN 'http://'
                    ELSE 'https://' END) ||
              source || '.Example.com' ||
              (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
              '/docs/' || lang || '/p' || CAST(doc_id % 25 AS VARCHAR) ||
              (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END) ||
              (CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed' ELSE '' END) ||
              (CASE WHEN doc_id % 2 = 0 THEN '#sec1' ELSE '' END) AS url
            FROM documents),
      parts AS (SELECT doc_id,
              lower(regexp_extract(url,
                '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
              lower(regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS hst,
              regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1) AS prt,
              regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rst
            FROM u),
      canon AS (SELECT doc_id,
              sch || '://' || regexp_replace(hst, '^www\.', '') ||
              (CASE WHEN prt <> '' AND NOT (sch = 'http' AND prt = '80')
                     AND NOT (sch = 'https' AND prt = '443')
                    THEN ':' || prt ELSE '' END) ||
              (CASE WHEN rst = '' OR rst = '/' THEN ''
                    ELSE regexp_replace(rst, '/$', '') END) AS canonical_url
            FROM parts)
      SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_variants,
             min(doc_id) AS keeper_id
      FROM canon
      WHERE canonical_url IS NOT NULL AND canonical_url <> ''
      GROUP BY canonical_url"""))

  private val MixBudget = 1000L

  /** Temperature-scaled (alpha = 2) source quotas, exact largest-remainder
    * apportionment: quotas sum to the budget by construction. */
  private val q115 = QueryDef(
    "q115_temperature_mix",
    (s, d) => Corpus.temperatureMix(Tables.documents(s, d), "source",
      alpha = 2, budget = MixBudget),
    Some(s"""
      WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY source),
      w AS (SELECT source, n_docs, n_docs * n_docs AS weight FROM c),
      t AS (SELECT *, sum(weight) OVER () AS ws,
              $MixBudget * weight AS num FROM w),
      f AS (SELECT *, num // ws AS fl, num % ws AS rem FROM t),
      g AS (SELECT *, $MixBudget - sum(fl) OVER () AS leftover,
              row_number() OVER (ORDER BY rem DESC, source) AS rk
            FROM f)
      SELECT source, n_docs, weight,
             CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS quota
      FROM g"""))

  private val HistBuckets = 20
  private val HistLo = 0.0
  private val HistHi = 110000.0 // > max l_extendedprice; width 5500 exact

  /** Fixed-range price histogram per return flag. */
  private val q116 = QueryDef(
    "q116_histogram",
    (s, d) => Quality.histogram(Tables.lineitem(s, d),
      Seq("l_returnflag"), "l_extendedprice",
      nBuckets = HistBuckets, lo = HistLo, hi = HistHi),
    Some(s"""
      WITH b AS (SELECT l_returnflag,
              CAST(least(greatest(floor((l_extendedprice -
                  CAST($HistLo AS DOUBLE)) / CAST(5500.0 AS DOUBLE)),
                0), ${HistBuckets - 1}) AS INT) AS bucket
            FROM lineitem WHERE l_extendedprice IS NOT NULL)
      SELECT l_returnflag, bucket, CAST(count(*) AS BIGINT) AS n_rows,
             CAST($HistLo AS DOUBLE) + bucket * CAST(5500.0 AS DOUBLE)
               AS bucket_lo
      FROM b GROUP BY l_returnflag, bucket"""))

  val all: Seq[QueryDef] = Seq(q113, q114, q115, q116)
}
