package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Corpus, Quality, Scale, Similarity, Stats}

/** Round-9 wave 2: fixed-model cross-entropy scoring.
  *
  * q302 scores the odd-id documents against a unigram model induced from
  * the even-id half — the reference-model formulation a streaming intake
  * gate needs (self-relative CE would make a doc's score depend on its
  * batch). OOV tokens carry a flat 20-nat penalty; the whole pipeline is
  * on the q140 exact-integer 2^-30 log grid, replayed in DuckDB.
  */
object R8iQueries {

  private val q302 = QueryDef(
    "q302_ce_against_model",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = Corpus.unigramLogProbs(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      Corpus.unigramCrossEntropyAgainst(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model)
    },
    Some(s"""
      WITH rt AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
            FROM documents WHERE doc_id % 2 = 0),
      v AS (SELECT token, CAST(count(*) AS BIGINT) AS gcnt
            FROM rt GROUP BY token),
      tot AS (SELECT sum(gcnt) AS total FROM v),
      lp AS (SELECT token,
              CAST(floor(ln(CAST(gcnt AS DOUBLE) / CAST(total AS DOUBLE))
                * 1073741824.0) AS BIGINT) AS lps
             FROM v CROSS JOIN tot),
      dt AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS token
            FROM documents WHERE doc_id % 2 = 1),
      c AS (SELECT doc_id, token, count(*) AS cnt FROM dt GROUP BY 1, 2),
      sc AS (SELECT c.doc_id, c.cnt,
               COALESCE(lp.lps,
                 CAST(-floor(20.0 * 1073741824.0) AS BIGINT)) AS lps
             FROM c LEFT JOIN lp USING (token))
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             (-(CAST(sum(cnt * lps) AS DOUBLE) / 1073741824.0))
               / CAST(sum(cnt) AS DOUBLE) AS cross_entropy_nats
      FROM sc GROUP BY doc_id"""))

  private val MinMargin = 1.0

  /** Margin-based bitext mining between the even- and odd-id embedding
    * halves: mutual-best pairs whose cosine beats the average of the two
    * sides' runner-up cosines (the parallel-corpus mining margin). The
    * oracle replays the exact ranking and the one fixed two-term margin
    * denominator, so doubles match bitwise. */
  private val q303 = QueryDef(
    "q303_bitext_margin",
    (s, d) => Similarity.marginBitextMine(Tables.embeddings(s, d),
      "vec_id", "embedding",
      col("vec_id") % 2 === 0 && col("vec_id") < 100,
      col("vec_id") % 2 === 1 && col("vec_id") < 100, MinMargin),
    Some(s"""
      WITH a AS (SELECT vec_id AS a_id, embedding AS a_emb
                 FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 100),
      b AS (SELECT vec_id AS b_id, embedding AS b_emb
            FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 100),
      sc AS (SELECT a_id, b_id,
               ${ExtQueries.oCos("a_emb", "b_emb")} AS cosine
             FROM a CROSS JOIN b),
      r AS MATERIALIZED (SELECT a_id, b_id, cosine,
              row_number() OVER (PARTITION BY a_id
                ORDER BY cosine DESC, b_id) AS ra,
              row_number() OVER (PARTITION BY b_id
                ORDER BY cosine DESC, a_id) AS rb
            FROM sc),
      r2a AS (SELECT a_id, cosine AS s2a FROM r WHERE ra = 2),
      r2b AS (SELECT b_id, cosine AS s2b FROM r WHERE rb = 2)
      SELECT m.a_id, m.b_id, m.cosine,
             m.cosine / ((COALESCE(s2a, s2b) + COALESCE(s2b, s2a)) / 2.0)
               AS margin
      FROM r m LEFT JOIN r2a USING (a_id) LEFT JOIN r2b USING (b_id)
      WHERE m.ra = 1 AND m.rb = 1
        AND (COALESCE(s2a, s2b) + COALESCE(s2b, s2a)) / 2.0 > 0
        AND m.cosine / ((COALESCE(s2a, s2b) + COALESCE(s2b, s2a)) / 2.0)
          >= $MinMargin"""))

  private val GoodChars = 300
  private val PriorStrength = 50.0

  /** Per-source quality rates shrunk toward the pooled rate with
    * pseudo-counts — the crawl-prioritization ranking where raw rates
    * would let a 3-for-3 micro-source outrank a large workhorse. */
  private val q304 = QueryDef(
    "q304_source_shrinkage",
    (s, d) => Quality.sourceQualityShrinkage(Tables.documents(s, d),
      "source", col("n_chars") >= GoodChars, PriorStrength),
    Some(s"""
      WITH per AS MATERIALIZED (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_chars >= $GoodChars THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_good
             FROM documents GROUP BY source),
      tot AS MATERIALIZED (SELECT sum(n_docs) AS tn, sum(n_good) AS tk FROM per)
      SELECT source, n_docs, n_good,
             CAST(n_good AS DOUBLE) / CAST(n_docs AS DOUBLE) AS raw_rate,
             (CAST(n_good AS DOUBLE)
                + $PriorStrength * (CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE)))
               / (CAST(n_docs AS DOUBLE) + $PriorStrength) AS shrunk_rate,
             CAST(row_number() OVER (ORDER BY
               (CAST(n_good AS DOUBLE)
                  + $PriorStrength * (CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE)))
                 / (CAST(n_docs AS DOUBLE) + $PriorStrength) DESC,
               source ASC) AS INT) AS rank
      FROM per CROSS JOIN tot"""))

  private val SubBuckets = 16

  /** Per-source p50/p90/p99 document length from the mergeable
    * log-bucket sketch — quantiles without a per-group sort, the 100 TB
    * shape; the oracle replays the exact integer bucketing and pick. */
  private val q306 = QueryDef(
    "q306_logbucket_quantiles",
    (s, d) => Stats.logBucketQuantiles(Tables.documents(s, d),
      Seq("source"), "n_chars", SubBuckets, Seq(0.5, 0.9, 0.99)),
    Some(s"""
      WITH v AS (SELECT source, n_chars AS x FROM documents
                 WHERE n_chars IS NOT NULL),
      b AS (SELECT source,
              CASE WHEN x <= 0 THEN -1
                   ELSE length(bin(x)) - 1 END AS e,
              CASE WHEN x <= 0 THEN CAST(0 AS BIGINT)
                   ELSE ((x - (CAST(1 AS BIGINT) << (length(bin(x)) - 1)))
                          * $SubBuckets)
                        // (CAST(1 AS BIGINT) << (length(bin(x)) - 1))
                   END AS sub
            FROM v),
      sk AS (SELECT source, e, sub, CAST(count(*) AS BIGINT) AS cnt
             FROM b GROUP BY 1, 2, 3),
      c AS (SELECT source, e, sub, cnt,
              sum(cnt) OVER (PARTITION BY source ORDER BY e, sub) AS cum,
              sum(cnt) OVER (PARTITION BY source) AS tot
            FROM sk),
      qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
               CAST(0.99 AS DOUBLE)]) AS q),
      pick AS (SELECT source, q, tot, e, sub,
                 row_number() OVER (PARTITION BY source, q
                   ORDER BY e, sub) AS rn
               FROM c CROSS JOIN qs
               WHERE cum >= ceil(q * tot))
      SELECT source, q, CAST(tot AS BIGINT) AS n,
             CAST(CASE WHEN e < 0 THEN 0
                  ELSE (CAST(1 AS BIGINT) << e)
                    + (sub * (CAST(1 AS BIGINT) << e) + $SubBuckets - 1)
                      // $SubBuckets
                  END AS BIGINT) AS est_lo,
             CAST(CASE WHEN e < 0 THEN 1
                  ELSE (CAST(1 AS BIGINT) << e)
                    + ((sub + 1) * (CAST(1 AS BIGINT) << e) + $SubBuckets - 1)
                      // $SubBuckets
                  END AS BIGINT) AS est_hi
      FROM pick WHERE rn = 1"""))

  private val TargetRows = 256L

  /** Hot supplier keys with the salt factor that splits each back under
    * the per-task row target — q137's skew diagnosis turned into the
    * concrete saltedSum/saltedJoin remediation. */
  private val q308 = QueryDef(
    "q308_salt_planner",
    (s, d) => Scale.saltPlanner(Tables.lineitem(s, d), Seq("l_suppkey"),
      TargetRows),
    Some(s"""
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows,
             CAST((count(*) + ${TargetRows - 1}) // $TargetRows AS INT)
               AS salt_buckets
      FROM lineitem WHERE l_suppkey IS NOT NULL
      GROUP BY 1 HAVING count(*) > $TargetRows"""))

  // four sources carry an explicit target; a phantom source ("src_new")
  // exercises the planned-but-absent row, and the other 16 observed
  // sources exercise unplanned mass (NULL target)
  private val Targets = Seq("src0" -> 0.3, "src1" -> 0.3, "src2" -> 0.2,
    "src_new" -> 0.2)

  /** Achieved-vs-target token mixture per source — the post-sampling
    * audit: did the quota/sampling stages actually hit the designed mix? */
  private val q309 = QueryDef(
    "q309_mixture_report",
    (s, d) => Corpus.mixtureReport(Tables.documents(s, d), "source",
      "text", Targets.toMap),
    Some {
      val tgt = Targets.map { case (src, w) => s"('$src', $w)" }
        .mkString(", ")
      s"""
      WITH per AS (SELECT source,
               CAST(sum(len(${ExtQueries.oToks("text")})) AS BIGINT)
                 AS n_tokens
             FROM documents GROUP BY source),
      tgt(source, target_share) AS (VALUES $tgt),
      tot AS (SELECT sum(n_tokens) AS total FROM per)
      SELECT COALESCE(per.source, tgt.source) AS source,
             COALESCE(per.n_tokens, 0) AS n_tokens,
             CAST(COALESCE(per.n_tokens, 0) AS DOUBLE)
               / CAST(tot.total AS DOUBLE) AS achieved_share,
             CAST(tgt.target_share AS DOUBLE) AS target_share,
             CAST(COALESCE(per.n_tokens, 0) AS DOUBLE)
               / CAST(tot.total AS DOUBLE)
               - COALESCE(CAST(tgt.target_share AS DOUBLE), 0.0) AS delta,
             (CAST(COALESCE(per.n_tokens, 0) AS DOUBLE)
               / CAST(tot.total AS DOUBLE))
               / CAST(tgt.target_share AS DOUBLE) AS excess_ratio
      FROM per FULL OUTER JOIN tgt ON per.source = tgt.source
      CROSS JOIN tot"""
    })

  private val QlTerms = Seq("data", "pipeline", "spark")
  private val QlTopK = 15
  private val QlMu = 500.0

  /** Dirichlet query-likelihood top-k — the LM ranker beside q107's
    * BM25, on the exact 2^-30 log grid so both engines rank and score
    * identically. */
  private val q310 = QueryDef(
    "q310_query_likelihood",
    (s, d) => graft.operators.Retrieval.queryLikelihoodTopK(
      Tables.documents(s, d), "doc_id", "text", QlTerms, QlTopK, QlMu),
    Some {
      val tf = (t: String) =>
        s"len(list_filter(w, x -> x = '$t'))"
      val termSql = QlTerms.map { t =>
        s"""CASE WHEN (SELECT sum(${tf(t)}) FROM tok) = 0 THEN 0
            ELSE CAST(floor(ln((CAST(${tf(t)} AS DOUBLE)
              + $QlMu * (CAST((SELECT sum(${tf(t)}) FROM tok) AS DOUBLE)
                / CAST((SELECT sum(len(w)) FROM tok) AS DOUBLE)))
              / (CAST(len(w) AS DOUBLE) + $QlMu)) * 1073741824.0)
              AS BIGINT) END"""
      }.mkString(" + ")
      s"""
      WITH tok AS MATERIALIZED (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      base AS (SELECT doc_id, CAST(len(w) AS INT) AS dl,
                 $termSql AS score_scaled
               FROM tok WHERE len(w) > 0),
      top AS (SELECT doc_id, dl, score_scaled,
                CAST(row_number() OVER (ORDER BY score_scaled DESC,
                  doc_id) AS INT) AS rank
              FROM base)
      SELECT doc_id, dl, score_scaled,
             CAST(score_scaled AS DOUBLE) / 1073741824.0 AS score, rank
      FROM top WHERE rank <= $QlTopK"""
    })

  private val BurstGapSec = 600L

  /** Keep the first event of every per-(user, type) burst — retry
    * storms, double-clicks and crawler re-fires collapse to one event
    * with the suppressed count attached. */
  private val q311 = QueryDef(
    "q311_burst_dedup",
    (s, d) => graft.operators.EventOps.burstDedup(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id", BurstGapSec)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"),
        col("n_suppressed")),
    Some(s"""
      WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
      m AS (SELECT *,
              CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > ${BurstGapSec * 1000000L}
                   THEN 1 ELSE 0 END AS nb
            FROM e
            WINDOW w AS (PARTITION BY user_id, event_type
              ORDER BY ts, event_id)),
      b AS (SELECT *, sum(nb) OVER (PARTITION BY user_id, event_type
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS burst
            FROM m),
      g AS (SELECT *,
              count(*) OVER (PARTITION BY user_id, event_type, burst) AS n,
              row_number() OVER (PARTITION BY user_id, event_type, burst
                ORDER BY ts, event_id) AS rn
            FROM b)
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
             CAST(n - 1 AS BIGINT) AS n_suppressed
      FROM g WHERE rn = 1"""))

  /** Leave-one-out source influence on eval cross-entropy (every 20th
    * doc plays the eval set): which sources actually make eval-like
    * text more predictable — the data-valuation number behind mixture
    * reweighting, closed-form from one counting pass. */
  private val q312 = QueryDef(
    "q312_source_influence",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.sourceInfluenceOnEval(
        docs.filter(col("doc_id") % 20 =!= 0), "source", "text",
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text")
    },
    Some {
      val oov = "CAST(-floor(20.0 * 1073741824.0) AS BIGINT)"
      s"""
      WITH ct AS MATERIALIZED (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT source, unnest(${ExtQueries.oToks("text")}) AS tok
                  FROM documents WHERE doc_id % 20 <> 0)
            GROUP BY 1, 2),
      g AS MATERIALIZED (SELECT tok, sum(cnt) AS gc FROM ct GROUP BY tok),
      ps AS (SELECT source, sum(cnt) AS tot_s FROM ct GROUP BY source),
      tot AS (SELECT sum(gc) AS total FROM g),
      ev AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS ecnt
             FROM (SELECT unnest(${ExtQueries.oToks("text")}) AS tok
                   FROM documents WHERE doc_id % 20 = 0)
             GROUP BY tok),
      ne AS (SELECT sum(ecnt) AS n_eval FROM ev),
      lpf AS MATERIALIZED (SELECT ev.tok, ev.ecnt, g.gc,
                CASE WHEN g.gc IS NULL THEN $oov
                     ELSE CAST(floor(ln(CAST(g.gc AS DOUBLE)
                       / CAST(tot.total AS DOUBLE)) * 1073741824.0)
                       AS BIGINT) END AS lp_full
              FROM ev LEFT JOIN g USING (tok) CROSS JOIN tot),
      x AS (SELECT ps.source, ps.tot_s, l.ecnt, l.lp_full,
              COALESCE(l.gc, 0) - COALESCE(ct.cnt, 0) AS rem_g,
              tot.total
            FROM ps CROSS JOIN lpf l
            LEFT JOIN ct ON ct.source = ps.source AND ct.tok = l.tok
            CROSS JOIN tot),
      x2 AS (SELECT source, tot_s, ecnt, lp_full,
               CASE WHEN rem_g <= 0 THEN $oov
                    ELSE CAST(floor(ln(CAST(rem_g AS DOUBLE)
                      / CAST(total - tot_s AS DOUBLE)) * 1073741824.0)
                      AS BIGINT) END AS lp_wo
             FROM x),
      agg AS (SELECT source, CAST(max(tot_s) AS BIGINT)
                AS n_source_tokens,
                sum(ecnt * lp_full) AS sf, sum(ecnt * lp_wo) AS sw
              FROM x2 GROUP BY source)
      SELECT source, n_source_tokens,
             (-(CAST(sf AS DOUBLE) / 1073741824.0))
               / CAST(ne.n_eval AS DOUBLE) AS ce_full,
             (-(CAST(sw AS DOUBLE) / 1073741824.0))
               / CAST(ne.n_eval AS DOUBLE) AS ce_without,
             (-(CAST(sw AS DOUBLE) / 1073741824.0))
               / CAST(ne.n_eval AS DOUBLE)
               - (-(CAST(sf AS DOUBLE) / 1073741824.0))
                 / CAST(ne.n_eval AS DOUBLE) AS influence_nats
      FROM agg CROSS JOIN ne"""
    })

  /** Cohesion audit of the q73 dedup clusters: cliques are true
    * duplicate groups, chains (completeness < 1) were glued by
    * transitive closure through banding collisions — the over-merge
    * review run before trusting keep-one-per-cluster. */
  private val q313 = QueryDef(
    "q313_cluster_cohesion",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Clusters.clusterCohesionAudit(docs, "doc_id",
        Corpus.simHashHammingPairs(docs, "doc_id", "text", maxHamming = 3),
        "a_id", "b_id", "hamming")
    },
    Some(s"""
      WITH RECURSIVE ${ExtQueries.oSimHashCtes},
      prs AS MATERIALIZED (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS INT)
                  AS hamming
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      edges AS (SELECT a_id AS src, b_id AS dst FROM prs
                UNION SELECT b_id, a_id FROM prs),
      reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
                UNION
                SELECT e.src AS id, reach.r
                FROM edges e JOIN reach ON e.dst = reach.id),
      comp AS MATERIALIZED (SELECT id AS doc_id, MIN(r) AS cluster_id
               FROM reach GROUP BY id),
      sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
             FROM comp GROUP BY 1 HAVING count(*) >= 2),
      pa AS (SELECT c.cluster_id, CAST(count(*) AS BIGINT) AS n_pairs,
               min(p.hamming) AS min_dist, max(p.hamming) AS max_dist
             FROM prs p JOIN comp c ON c.doc_id = p.a_id
             GROUP BY 1)
      SELECT sz.cluster_id, sz.n_members, pa.n_pairs, pa.min_dist,
             pa.max_dist,
             CAST(pa.n_pairs * 2 AS DOUBLE)
               / CAST(sz.n_members * (sz.n_members - 1) AS DOUBLE)
               AS completeness,
             (CAST(pa.n_pairs * 2 AS DOUBLE)
               / CAST(sz.n_members * (sz.n_members - 1) AS DOUBLE)) < 1.0
               AS is_chain
      FROM sz JOIN pa USING (cluster_id)"""))

  /** Per-document character entropy — the compression-ratio proxy
    * catching repeated-char junk (low tail) and base64/hex blobs (high
    * tail) that token-level gates miss. */
  private val q314 = QueryDef(
    "q314_char_entropy",
    (s, d) => Corpus.charEntropy(Tables.documents(s, d), "doc_id", "text"),
    Some(s"""
      WITH ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
            FROM documents, unnest(generate_series(1, length(text)))
              AS t(i)
            WHERE text IS NOT NULL AND length(text) > 0),
      cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
             FROM ch GROUP BY 1, 2),
      pd AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
               CAST(count(*) AS BIGINT) AS n_distinct_chars
             FROM cc GROUP BY 1)
      SELECT cc.doc_id, pd.n_chars, pd.n_distinct_chars,
             -(CAST(sum(cnt * CAST(floor(ln(CAST(cnt AS DOUBLE)
                 / CAST(pd.n_chars AS DOUBLE)) * 1073741824.0) AS BIGINT))
               AS DOUBLE) / 1073741824.0) / CAST(pd.n_chars AS DOUBLE)
               AS char_entropy_nats
      FROM cc JOIN pd USING (doc_id)
      GROUP BY cc.doc_id, pd.n_chars, pd.n_distinct_chars"""))

  private val DropPermille = 150
  private val AugSalt = "aug0"

  /** Deterministic word-dropout augmentation: md5-coin token dropping,
    * reproducible across engines and partitionings. */
  private val q315 = QueryDef(
    "q315_word_dropout",
    (s, d) => Corpus.wordDropout(Tables.documents(s, d), "doc_id", "text",
      DropPermille, AugSalt),
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(h, $j, 1)) - 1)"
      val threshold = (DropPermille * 65536) / 1000
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS tok,
                unnest(generate_series(0, len(w) - 1)) AS pos
              FROM t WHERE len(w) > 0),
      coin AS (SELECT doc_id, tok, pos,
                 md5('$AugSalt:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(pos AS VARCHAR)) AS h
               FROM tok),
      marked AS (SELECT doc_id, tok, pos,
                   (4096 * ${nib(1)} + 256 * ${nib(2)} + 16 * ${nib(3)}
                     + ${nib(4)}) < $threshold AS dropped
                 FROM coin)
      SELECT doc_id,
             COALESCE(string_agg(tok, ' ' ORDER BY pos)
               FILTER (WHERE NOT dropped), '') AS text_aug,
             CAST(count(*) FILTER (WHERE NOT dropped) AS BIGINT) AS n_kept,
             CAST(count(*) FILTER (WHERE dropped) AS BIGINT) AS n_dropped
      FROM marked GROUP BY doc_id"""
    })

  /** l-diversity over the q199 quasi-identifier groups: large (k-safe)
    * groups whose sensitive balance band is near-constant still leak —
    * the second privacy audit a release needs. */
  private val q316 = QueryDef(
    "q316_ldiversity_audit",
    (s, d) => Quality.lDiversityAudit(Tables.customer(s, d), Seq(
      ("nation_key", col("c_nationkey")),
      ("segment", col("c_mktsegment"))),
      org.apache.spark.sql.functions.floor(col("c_acctbal") / 1000)
        .cast("long"),
      l = 3),
    Some("""
      WITH cell AS (
        SELECT c_nationkey AS nation_key, c_mktsegment AS segment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS cn
        FROM customer GROUP BY 1, 2, 3)
      SELECT nation_key, segment,
             CAST(sum(cn) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_sensitive_values,
             CAST(max(cn) AS DOUBLE) / CAST(sum(cn) AS DOUBLE)
               AS majority_share,
             count(*) < 3 AS at_risk
      FROM cell GROUP BY 1, 2"""))

  /** Dedup-radius survival sweep: cumulative candidate pairs and
    * touched docs per Hamming radius — the aggressiveness calibration
    * read before a corpus-wide near-dup run. */
  private val q317 = QueryDef(
    "q317_dedup_radius_sweep",
    (s, d) => Corpus.dedupRadiusSweep(Tables.documents(s, d), "doc_id",
      "text", maxHamming = 3),
    Some(s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS MATERIALIZED (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS h
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      ph AS (SELECT h, CAST(count(*) AS BIGINT) AS np FROM prs GROUP BY 1),
      dm AS (SELECT id, min(h) AS h FROM (
               SELECT a_id AS id, h FROM prs
               UNION ALL SELECT b_id, h FROM prs) GROUP BY id),
      dh AS (SELECT h, CAST(count(*) AS BIGINT) AS nd FROM dm GROUP BY 1),
      spine AS (SELECT unnest(generate_series(0, 3)) AS radius)
      SELECT CAST(s.radius AS INT) AS radius,
             CAST(sum(COALESCE(ph.np, 0)) OVER (ORDER BY s.radius
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_pairs,
             CAST(sum(COALESCE(dh.nd, 0)) OVER (ORDER BY s.radius
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_docs_touched
      FROM spine s
      LEFT JOIN ph ON ph.h = s.radius
      LEFT JOIN dh ON dh.h = s.radius"""))

  /** Auto length gate from the corpus's own p1/p99 token-count sketch
    * buckets — measured bounds instead of hand-picked constants, with
    * the would-be drop counts. */
  private val q318 = QueryDef(
    "q318_auto_length_gate",
    (s, d) => Corpus.autoLengthGate(Tables.documents(s, d), "doc_id",
      "text", pLo = 0.01, pHi = 0.99, subBuckets = 16),
    Some(s"""
      WITH v AS (SELECT doc_id,
               CAST(len(${ExtQueries.oToks("text")}) AS BIGINT) AS x
             FROM documents),
      b AS (SELECT doc_id, x,
              CASE WHEN x <= 0 THEN -1
                   ELSE length(bin(x)) - 1 END AS e,
              CASE WHEN x <= 0 THEN CAST(0 AS BIGINT)
                   ELSE ((x - (CAST(1 AS BIGINT) << (length(bin(x)) - 1)))
                          * 16)
                        // (CAST(1 AS BIGINT) << (length(bin(x)) - 1))
                   END AS sub
            FROM v),
      sk AS (SELECT e, sub, CAST(count(*) AS BIGINT) AS cnt
             FROM b GROUP BY 1, 2),
      c AS (SELECT e, sub, cnt,
              sum(cnt) OVER (ORDER BY e, sub) AS cum,
              sum(cnt) OVER () AS tot
            FROM sk),
      qs AS (SELECT unnest([CAST(0.01 AS DOUBLE), CAST(0.99 AS DOUBLE)])
               AS q),
      pick AS (SELECT q, e, sub,
                 row_number() OVER (PARTITION BY q ORDER BY e, sub) AS rn
               FROM c CROSS JOIN qs
               WHERE cum >= ceil(q * tot)),
      bounds AS (SELECT
          max(CASE WHEN q = 0.01 THEN
            CASE WHEN e < 0 THEN CAST(0 AS BIGINT)
                 ELSE (CAST(1 AS BIGINT) << e)
                   + (sub * (CAST(1 AS BIGINT) << e) + 15) // 16 END
            END) AS lo_tokens,
          max(CASE WHEN q = 0.99 THEN
            CASE WHEN e < 0 THEN CAST(1 AS BIGINT)
                 ELSE (CAST(1 AS BIGINT) << e)
                   + ((sub + 1) * (CAST(1 AS BIGINT) << e) + 15) // 16 END
            END) AS hi_tokens
        FROM pick WHERE rn = 1)
      SELECT bounds.lo_tokens, bounds.hi_tokens,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN x < lo_tokens THEN 1 ELSE 0 END)
               AS BIGINT) AS n_below,
             CAST(sum(CASE WHEN x >= hi_tokens THEN 1 ELSE 0 END)
               AS BIGINT) AS n_above,
             CAST(count(*)
               - sum(CASE WHEN x < lo_tokens THEN 1 ELSE 0 END)
               - sum(CASE WHEN x >= hi_tokens THEN 1 ELSE 0 END)
               AS BIGINT) AS n_kept,
             CAST(count(*)
               - sum(CASE WHEN x < lo_tokens THEN 1 ELSE 0 END)
               - sum(CASE WHEN x >= hi_tokens THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_ratio
      FROM v CROSS JOIN bounds
      GROUP BY bounds.lo_tokens, bounds.hi_tokens"""))

  val all: Seq[QueryDef] = Seq(q302, q303, q304, q306, q308, q309, q310,
    q311, q312, q313, q314, q315, q316, q317, q318)
}
