package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Quality, Similarity}

/** Round-5 wave 12: CUPED variance-reduced A/B readout, PSI
  * distribution-drift monitoring, per-vector mislabel outlier flags.
  */
object R5lQueries {

  private val D2 = DecimalType(18, 2)

  private def oBucket(key: String): String = {
    val nib = (j: Int) =>
      s"(strpos('0123456789abcdef', substr(md5(CAST($key AS VARCHAR)), $j, 1)) - 1)"
    s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
  }

  /** CUPED readout of the hash-split revenue experiment: 1997 revenue
    * adjusted by the 1996 pre-period covariate (see
    * Quality.cupedAdjust) — the variant means AND the variance-reduced
    * means, one aggregation pass, engine-exact sums. */
  private val q174 = QueryDef(
    "q174_cuped",
    (s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("yr", year(to_date(col("o_orderdate"))))
        .filter(col("yr").isin(1996, 1997))
      val bucket = conv(substring(md5(col("o_custkey").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      val units = o.groupBy(col("o_custkey"))
        .agg(
          sum(when(col("yr") === 1997, col("o_totalprice").cast(D2))
            .otherwise(lit(0).cast(D2))).as("y"),
          sum(when(col("yr") === 1996, col("o_totalprice").cast(D2))
            .otherwise(lit(0).cast(D2))).as("x"))
        .withColumn("variant", when(bucket < 50, "A").otherwise("B"))
      Quality.cupedAdjust(units, "variant", col("y"), col("x"))
    },
    Some(s"""
      WITH o AS (SELECT o_custkey,
              year(CAST(o_orderdate AS DATE)) AS yr,
              CAST(o_totalprice AS DECIMAL(18,2)) AS tp
            FROM orders
            WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)),
      u AS (SELECT o_custkey,
              SUM(CASE WHEN yr = 1997 THEN tp
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS y,
              SUM(CASE WHEN yr = 1996 THEN tp
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS x
            FROM o GROUP BY 1),
      v AS (SELECT *, CASE WHEN ${oBucket("o_custkey")} < 50
              THEN 'A' ELSE 'B' END AS variant FROM u),
      g AS (SELECT variant, count(*) AS n, SUM(y) AS sy, SUM(x) AS sx,
              SUM(x * y) AS sxy, SUM(x * x) AS sxx
            FROM v GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tnd,
              CAST(SUM(sy) AS DOUBLE) AS tsy,
              CAST(SUM(sx) AS DOUBLE) AS tsx,
              CAST(SUM(sxy) AS DOUBLE) AS tsxy,
              CAST(SUM(sxx) AS DOUBLE) AS tsxx FROM g)
      SELECT variant, n,
        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
        (tsxy - tsx * tsy / tnd)
          / nullif(tsxx - tsx * tsx / tnd, 0.0) AS theta,
        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
          - COALESCE((tsxy - tsx * tsy / tnd)
              / nullif(tsxx - tsx * tsx / tnd, 0.0), 0.0)
            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - tsx / tnd)
          AS mean_adj
      FROM g CROSS JOIN t"""))

  /** Per-source drift of the n_chars distribution against the pooled
    * corpus (see Quality.psiDrift): the ongoing-ingest monitoring
    * metric — PSI > 0.2 is the conventional "distribution shifted"
    * alert. */
  private val q175 = QueryDef(
    "q175_psi_drift",
    (s, d) => Quality.psiDrift(Tables.documents(s, d), "source",
      col("n_chars")),
    Some("""
      WITH b0 AS (SELECT source, CAST(n_chars AS BIGINT) AS v
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      bounds AS (SELECT min(v) AS mn, max(v) AS mx FROM b0),
      cnt AS (SELECT source,
              CASE WHEN mx = mn THEN 0
                ELSE CAST(((v - mn) * 10) // (mx - mn + 1) AS INT)
                END AS b,
              count(*) AS c
            FROM b0 CROSS JOIN bounds GROUP BY 1, 2),
      spine AS (SELECT source, b
            FROM (SELECT DISTINCT source FROM cnt),
                 (SELECT unnest(generate_series(0, 9)) AS b)),
      dense AS (SELECT s.source, s.b, COALESCE(c.c, 0) AS c
            FROM spine s
            LEFT JOIN cnt c ON s.source = c.source AND s.b = c.b),
      pooled AS (SELECT b, SUM(c) AS cr FROM dense GROUP BY 1),
      nsrc AS (SELECT source, SUM(c) AS ns FROM dense GROUP BY 1),
      ntot AS (SELECT SUM(cr) AS nr FROM pooled),
      terms AS (SELECT d.source, n.ns,
              CAST(floor(
                ((CAST(p.cr + 1 AS DOUBLE) / CAST(t.nr + 10 AS DOUBLE))
                 - (CAST(d.c + 1 AS DOUBLE) / CAST(n.ns + 10 AS DOUBLE)))
                * floor(ln(
                    (CAST(p.cr + 1 AS DOUBLE) / CAST(t.nr + 10 AS DOUBLE))
                    / (CAST(d.c + 1 AS DOUBLE) / CAST(n.ns + 10 AS DOUBLE)))
                  * 1073741824.0)) AS BIGINT) AS term
            FROM dense d
            JOIN pooled p ON p.b = d.b
            JOIN nsrc n ON n.source = d.source
            CROSS JOIN ntot t)
      SELECT source, CAST(max(ns) AS BIGINT) AS n_rows,
             CAST(SUM(term) AS DOUBLE) / 1073741824.0 AS psi
      FROM terms GROUP BY 1"""))

  /** Mislabel candidates: every vector's cosine to its own label
    * centroid plus the low-similarity flag (see
    * Similarity.embeddingOutliers). */
  private val q176 = QueryDef(
    "q176_embedding_outliers",
    (s, d) => Similarity.embeddingOutliers(Tables.embeddings(s, d),
      "vec_id", "embedding", "label"),
    Some("""
      WITH x AS (SELECT vec_id, label,
              unnest(embedding) AS x,
              unnest(generate_series(0, len(embedding) - 1)) AS pos
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL),
      q AS (SELECT vec_id, label, pos,
              CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT) AS qv
            FROM x),
      comp AS (SELECT label, pos, CAST(SUM(qv) AS BIGINT) AS c
            FROM q GROUP BY 1, 2),
      cn AS (SELECT label, CAST(SUM(c * c) AS BIGINT) AS cn
            FROM comp GROUP BY 1),
      per AS (SELECT q.vec_id, q.label,
              CAST(SUM(q.qv * c.c) AS BIGINT) AS dot,
              CAST(SUM(q.qv * q.qv) AS BIGINT) AS vn
            FROM q JOIN comp c ON c.label = q.label AND c.pos = q.pos
            GROUP BY 1, 2)
      SELECT p.vec_id, p.label, p.dot,
        CASE WHEN p.vn = 0 OR n.cn = 0 THEN NULL
          ELSE CAST(p.dot AS DOUBLE)
            / (sqrt(CAST(p.vn AS DOUBLE)) * sqrt(CAST(n.cn AS DOUBLE)))
          END AS cos,
        COALESCE(CASE WHEN p.vn = 0 OR n.cn = 0 THEN NULL
          ELSE CAST(p.dot AS DOUBLE)
            / (sqrt(CAST(p.vn AS DOUBLE)) * sqrt(CAST(n.cn AS DOUBLE)))
          END < 0.5, TRUE) AS is_outlier
      FROM per p JOIN cn n ON n.label = p.label"""))

  val all: Seq[QueryDef] = Seq(q174, q175, q176)
}
