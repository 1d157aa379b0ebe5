package graft

import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Corpus, Windows}

/** Round-5 wave 4: split-leakage auditing (the eval-hygiene check every
  * LLM data pipeline needs) and daily-series gap interpolation.
  */
object R5dQueries {

  private def dstr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")
  private def money(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  private val LeakTau = 0.5

  private val LeakCapDf = 25

  /** Near-dup pairs straddling the q58 hash-split boundaries, counted
    * per split pair — nonzero rows mean the held-out sets leak. The
    * hot-shingle cap (df ≤ 25, ACTUALLY exercised on this corpus) is
    * mirrored in the oracle — the q68 posture; the uncapped exact form
    * is the q322 verification twin. */
  private val q151 = QueryDef(
    "q151_split_leakage",
    (s, d) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      val docs = Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test"))
      Corpus.splitLeakageAudit(docs, "doc_id", "text", "split",
        n = 3, threshold = LeakTau, maxDf = LeakCapDf)
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS MATERIALIZED (SELECT doc_id,
               list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      posting AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM ws),
      df AS (SELECT s, COUNT(*) AS c FROM posting GROUP BY s),
      capped AS MATERIALIZED (SELECT p.doc_id, p.s FROM posting p
                 JOIN df USING (s) WHERE c <= $LeakCapDf),
      sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM capped
             GROUP BY doc_id),
      ip AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
             FROM capped a JOIN capped b
               ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      pairs AS (SELECT a_id, b_id FROM ip
                JOIN sz sa ON a_id = sa.doc_id
                JOIN sz sb ON b_id = sb.doc_id
                WHERE CAST(i AS DOUBLE) /
                  CAST(sa.n_sh + sb.n_sh - i AS DOUBLE) >= $LeakTau),
      sp AS (SELECT doc_id,
               CASE WHEN $bucket < 80 THEN 'train'
                    WHEN $bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM documents),
      leak AS (SELECT least(sa.split, sb.split) AS split_a,
                 greatest(sa.split, sb.split) AS split_b
               FROM pairs
               JOIN sp sa ON a_id = sa.doc_id
               JOIN sp sb ON b_id = sb.doc_id
               WHERE sa.split <> sb.split)
      SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_leaky_pairs
      FROM leak GROUP BY 1, 2"""
    })

  /** Per-user daily spend with calendar gaps linearly interpolated —
    * the fixed-expression-tree float discipline makes even the
    * interpolated doubles hash-comparable across engines. */
  private val q152 = QueryDef(
    "q152_interpolate_daily",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(money(col("value"))).cast("double").as("v"))
      Windows.interpolateDaily(daily, Seq("user_id"), "day", "v")
        .select(col("user_id"), dstr(col("day")).as("day"), col("value"),
          col("is_interpolated"))
    },
    Some("""
      WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY 1, 2),
      n AS (SELECT *,
              lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nd,
              lead(v) OVER (PARTITION BY user_id ORDER BY day) AS nv
            FROM d),
      e AS (SELECT user_id, day AS obs_day, nd, v, nv,
              unnest(generate_series(day, COALESCE(nd - 1, day),
                INTERVAL 1 DAY)) AS g
            FROM n)
      SELECT user_id, strftime(CAST(g AS DATE), '%Y-%m-%d') AS day,
             CASE WHEN CAST(g AS DATE) = obs_day THEN v
                  ELSE v + (nv - v) *
                    (CAST(datediff('day', obs_day, CAST(g AS DATE))
                       AS DOUBLE) /
                     CAST(datediff('day', obs_day, nd) AS DOUBLE)) END
               AS value,
             CAST(g AS DATE) <> obs_day AS is_interpolated
      FROM e"""))

  val all: Seq[QueryDef] = Seq(q151, q152)
}
