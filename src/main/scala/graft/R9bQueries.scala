package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Corpus, NearDup}

/** Round-9 wave 2: safe-by-default closure for the last two uncapped
  * pair paths. Every shingle-pair operator now ships BOTH forms with
  * its own oracle:
  *
  *   - q321 is the hot-shingle-capped production twin of the
  *     containment near-dup (q136 stays as the `_exact` verification
  *     form) — the q34/q68 pattern, cap mirrored in the oracle and low
  *     enough to actually bite on this corpus.
  *   - q322 is the uncapped `_exact` verification twin of the split
  *     leakage audit (q151 now runs capped by default) — it states the
  *     ground-truth leak counts the capped audit approximates from
  *     below on corpora with hot shingles.
  */
object R9bQueries {

  private val CapDf = 25
  private val ContainTau = 0.4
  private val LeakTau = 0.5

  /** Capped containment near-dup: df over distinct postings, postings
    * with df > cap removed from both intersections and set sizes, then
    * exact containment |A∩B| / min(|A|,|B|) over the survivors. */
  private val q321 = QueryDef(
    "q321_containment_capped",
    (s, d) => NearDup.ngramContainmentPairs(Tables.documents(s, d),
      "doc_id", "text", n = 3, threshold = ContainTau, maxDf = CapDf),
    Some(s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS MATERIALIZED (SELECT doc_id,
               list_distinct(${ExtQueries.oShingles("w", 3)}) AS sh
             FROM t WHERE len(w) >= 3),
      posting AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM ws),
      df AS (SELECT s, COUNT(*) AS c FROM posting GROUP BY s),
      capped AS MATERIALIZED (SELECT p.doc_id, p.s FROM posting p
                 JOIN df USING (s) WHERE c <= $CapDf),
      sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_sh FROM capped
             GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  COUNT(*) AS intersection
                FROM capped a JOIN capped b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, intersection,
             CAST(intersection AS DOUBLE) /
               CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
      FROM pairs
      JOIN sz sa ON a_id = sa.doc_id
      JOIN sz sb ON b_id = sb.doc_id
      WHERE CAST(intersection AS DOUBLE) /
              CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= $ContainTau"""))

  /** EXACT split-leakage audit — uncapped all-pairs ground truth
    * (verification twin by contract: `_exact` suffix + `uncapped = true`
    * opt-in). Same hash split as q151. */
  private val q322 = QueryDef(
    "q322_split_leakage_exact",
    (s, d) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      val docs = Tables.documents(s, d)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test"))
      Corpus.splitLeakageAudit(docs, "doc_id", "text", "split",
        n = 3, threshold = LeakTau, maxDf = 0, uncapped = true)
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
      sh AS MATERIALIZED (SELECT doc_id, unnest(sh) AS s FROM ws),
      sz AS MATERIALIZED (SELECT doc_id, len(sh) AS n_sh FROM ws),
      ip AS MATERIALIZED (
             SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
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

  /** The WINDOW-SHAPED top-k run through [[graft.plans.WindowTopKRewrite]]
    * (opt-in conf set around an eager materialization, so the rewritten
    * plan — GroupedTopKPartial/Final, no Window — is what executes):
    * shortest 2 docs per source under a total order. The oracle states
    * row_number semantics; hash parity IS the rewrite's correctness
    * proof on real data, complementing GroupedTopKSpec's plan asserts. */
  private val q323 = QueryDef(
    "q323_window_rewrite_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.operators.TopK.ensureRegistered(s)
      // save/restore, not unset: unset restores the DEFAULT, silently
      // turning the rewrite off for a session that had it enabled
      val prior = s.conf.getOption(graft.plans.WindowTopKRewrite.RewriteConf)
      s.conf.set(graft.plans.WindowTopKRewrite.RewriteConf, "true")
      try {
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("source")
              .orderBy(col("n_chars"), col("doc_id"))))
          .filter(col("rn") <= 2).drop("rn")
          .localCheckpoint() // materialize while the rewrite conf is on
      } finally prior match {
        case Some(v) => s.conf.set(graft.plans.WindowTopKRewrite.RewriteConf, v)
        case None => s.conf.unset(graft.plans.WindowTopKRewrite.RewriteConf)
      }
    },
    Some("""
      WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars, doc_id) AS rn
        FROM documents)
      SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 2"""))

  val all: Seq[QueryDef] = Seq(q321, q322, q323)
}
