package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.Eval

/** Round-6 wave 1: evaluation & label QA — retrieval ranking metrics,
  * inter-annotator agreement, nearest-centroid classifier eval.
  *
  * The reference closes its loop with dashboard KPIs over the curated
  * data (SQLproject1.sql:680-736); the LLM-pipeline analog is scoring
  * the corpus's labels, embeddings, and retrieval quality. All three
  * queries follow the exact-integer discipline: quantized dots,
  * confusion counts, and literal discount tables accumulate as
  * BIGINT; doubles appear only in final single divisions.
  */
object R6Queries {

  /** MRR / hit@k / NDCG@10 for same-label retrieval over the embeddings
    * table, query set = every 25th vector (see Eval.rankingMetrics). */
  private val q177 = QueryDef(
    "q177_ranking_metrics",
    (s, d) => Eval.rankingMetrics(Tables.embeddings(s, d),
      "vec_id", "embedding", "label", col("id") % 25 === 0, k = 10),
    Some {
      val dlits = Eval.discountTable(10).mkString(", ")
      s"""
      WITH x AS (SELECT vec_id, label,
              unnest(embedding) AS e,
              unnest(generate_series(0, len(embedding) - 1)) AS pos
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL),
      b AS (SELECT vec_id, label, pos,
              CAST(floor(CAST(e AS DOUBLE) * 1024) AS BIGINT) AS q FROM x),
      nrm AS (SELECT vec_id, MIN(label) AS label,
              CAST(SUM(q * q) AS BIGINT) AS nn
            FROM b GROUP BY 1 HAVING SUM(q * q) > 0),
      lc AS (SELECT label, COUNT(*) AS cnt FROM nrm GROUP BY 1),
      qs AS (SELECT n.vec_id AS q_id, n.label AS q_lbl, n.nn AS na,
              CAST(lc.cnt - 1 AS BIGINT) AS n_rel
            FROM nrm n JOIN lc ON lc.label = n.label
            WHERE n.vec_id % 25 = 0),
      dots AS (SELECT qs.q_id, cc.vec_id AS id,
              CAST(SUM(qc.q * cc.q) AS BIGINT) AS dot
            FROM qs
            JOIN b qc ON qc.vec_id = qs.q_id
            JOIN b cc ON cc.pos = qc.pos AND cc.vec_id <> qs.q_id
            GROUP BY 1, 2),
      scored AS (SELECT d.q_id, qs.q_lbl, qs.n_rel, d.id, n2.label AS lbl,
              CAST(d.dot AS DOUBLE)
                / (sqrt(CAST(n2.nn AS DOUBLE)) * sqrt(CAST(qs.na AS DOUBLE)))
                AS cos
            FROM dots d
            JOIN nrm n2 ON n2.vec_id = d.id
            JOIN qs ON qs.q_id = d.q_id),
      topk AS (SELECT *, CASE WHEN lbl = q_lbl THEN 1 ELSE 0 END AS rel
            FROM (SELECT *, CAST(row_number() OVER
                    (PARTITION BY q_id ORDER BY cos DESC, id) AS INT) AS rank
                  FROM scored)
            WHERE rank <= 10),
      pq AS (SELECT q_id, MIN(q_lbl) AS label, MIN(n_rel) AS n_rel,
              MAX(CASE WHEN rank = 1 THEN rel ELSE 0 END) AS hit1,
              CAST(SUM(rel) AS BIGINT) AS hits_k,
              MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank,
              CAST(SUM(CASE WHEN rel = 1
                THEN [$dlits][rank] ELSE 0 END) AS BIGINT) AS dcg
            FROM topk GROUP BY 1),
      idcg AS (SELECT q_id,
              CAST(SUM([$dlits][i]) AS BIGINT) AS idcg
            FROM pq, LATERAL (SELECT unnest(generate_series(
                1, CAST(least(pq.n_rel, 10) AS INT))) AS i) s
            GROUP BY 1)
      SELECT pq.q_id, pq.label, pq.n_rel, pq.hit1, pq.hits_k,
        pq.first_rel_rank,
        coalesce(CAST(1 AS DOUBLE) / pq.first_rel_rank, CAST(0 AS DOUBLE))
          AS rr,
        pq.dcg,
        CASE WHEN idcg.idcg IS NULL THEN NULL
          ELSE CAST(pq.dcg AS DOUBLE) / CAST(idcg.idcg AS DOUBLE) END AS ndcg
      FROM pq LEFT JOIN idcg ON idcg.q_id = pq.q_id"""
    })

  /** Cohen's kappa between two length-tier "annotators" over documents:
    * rater A buckets by characters, rater B by whitespace tokens — the
    * agreement audit a labeling pipeline runs on redundant annotations
    * (see Eval.cohenKappa). */
  private val q178 = QueryDef(
    "q178_annotator_kappa",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val nc = length(col("text"))
      val nt = size(TextFunctions.tokens(col("text")))
      Eval.cohenKappa(docs,
        when(nc < 150, "short").when(nc < 400, "medium").otherwise("long"),
        when(nt < 28, "short").when(nt < 73, "medium").otherwise("long"))
    },
    Some("""
      WITH r AS (SELECT
              CASE WHEN length(text) < 150 THEN 'short'
                WHEN length(text) < 400 THEN 'medium'
                ELSE 'long' END AS rating_a,
              CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) < 28 THEN 'short'
                WHEN len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) < 73 THEN 'medium'
                ELSE 'long' END AS rating_b
            FROM documents WHERE text IS NOT NULL),
      cells AS (SELECT rating_a, rating_b, COUNT(*) AS n FROM r GROUP BY 1, 2),
      ma AS (SELECT rating_a, CAST(SUM(n) AS BIGINT) AS n_a
            FROM cells GROUP BY 1),
      mb AS (SELECT rating_b, CAST(SUM(n) AS BIGINT) AS n_b
            FROM cells GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
              CAST(SUM(CASE WHEN rating_a = rating_b THEN n ELSE 0 END)
                AS BIGINT) AS diag
            FROM cells),
      pe AS (SELECT CAST(SUM(ma.n_a * mb.n_b) AS BIGINT) AS pe_num
            FROM ma JOIN mb ON ma.rating_a = mb.rating_b)
      SELECT c.rating_a, c.rating_b, c.n, ma.n_a, mb.n_b,
        CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE) AS observed_agreement,
        CAST(pe_num AS DOUBLE) / CAST(nn * nn AS DOUBLE)
          AS expected_agreement,
        CASE WHEN CAST(pe_num AS DOUBLE) / CAST(nn * nn AS DOUBLE)
              = CAST(1 AS DOUBLE) THEN NULL
          ELSE (CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE)
                 - CAST(pe_num AS DOUBLE) / CAST(nn * nn AS DOUBLE))
            / (CAST(1 AS DOUBLE)
                 - CAST(pe_num AS DOUBLE) / CAST(nn * nn AS DOUBLE)) END
          AS kappa
      FROM cells c
      JOIN ma USING (rating_a)
      JOIN mb USING (rating_b)
      CROSS JOIN tot CROSS JOIN pe"""))

  /** Nearest-centroid classification of every embedding against its own
    * label space, scored as per-class precision / recall / F1 (see
    * Eval.nearestCentroidEval) — the embedding-quality report card. */
  private val q179 = QueryDef(
    "q179_classifier_eval",
    (s, d) => Eval.nearestCentroidEval(Tables.embeddings(s, d),
      "vec_id", "embedding", "label"),
    Some("""
      WITH x AS (SELECT vec_id, label,
              unnest(embedding) AS e,
              unnest(generate_series(0, len(embedding) - 1)) AS pos
            FROM embeddings
            WHERE label IS NOT NULL AND embedding IS NOT NULL),
      b AS (SELECT vec_id, label, pos,
              CAST(floor(CAST(e AS DOUBLE) * 1024) AS BIGINT) AS q FROM x),
      comp AS (SELECT label AS cand, pos, CAST(SUM(q) AS BIGINT) AS c
            FROM b GROUP BY 1, 2),
      cn AS (SELECT cand, CAST(SUM(c * c) AS BIGINT) AS cnn
            FROM comp GROUP BY 1),
      vn AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS vnn
            FROM b GROUP BY 1),
      dots AS (SELECT b.vec_id, MIN(b.label) AS truth, comp.cand,
              CAST(SUM(b.q * comp.c) AS BIGINT) AS dot
            FROM b JOIN comp ON comp.pos = b.pos
            GROUP BY b.vec_id, comp.cand),
      scored AS (SELECT d.vec_id, d.truth, d.cand,
              CAST(d.dot AS DOUBLE)
                / (sqrt(CAST(vn.vnn AS DOUBLE)) * sqrt(CAST(cn.cnn AS DOUBLE)))
                AS cos
            FROM dots d
            JOIN vn ON vn.vec_id = d.vec_id
            JOIN cn ON cn.cand = d.cand
            WHERE vn.vnn > 0 AND cn.cnn > 0),
      pred AS (SELECT vec_id, truth, cand AS pred FROM (
              SELECT *, row_number() OVER
                (PARTITION BY vec_id ORDER BY cos DESC, cand) AS rk
              FROM scored) WHERE rk = 1),
      cls AS (SELECT DISTINCT truth AS label FROM pred
            UNION SELECT DISTINCT pred FROM pred),
      t AS (SELECT truth AS label, COUNT(*) AS support,
              CAST(SUM(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS BIGINT)
                AS tp,
              CAST(SUM(CASE WHEN pred <> truth THEN 1 ELSE 0 END) AS BIGINT)
                AS fn
            FROM pred GROUP BY 1),
      p AS (SELECT pred AS label,
              CAST(SUM(CASE WHEN pred <> truth THEN 1 ELSE 0 END) AS BIGINT)
                AS fp
            FROM pred GROUP BY 1)
      SELECT cls.label,
        COALESCE(t.support, 0) AS support,
        COALESCE(t.tp, 0) AS tp,
        COALESCE(p.fp, 0) AS fp,
        COALESCE(t.fn, 0) AS fn,
        CASE WHEN COALESCE(t.tp, 0) + COALESCE(p.fp, 0) = 0 THEN NULL
          ELSE CAST(COALESCE(t.tp, 0) AS DOUBLE)
            / CAST(COALESCE(t.tp, 0) + COALESCE(p.fp, 0) AS DOUBLE) END
          AS "precision",
        CASE WHEN COALESCE(t.tp, 0) + COALESCE(t.fn, 0) = 0 THEN NULL
          ELSE CAST(COALESCE(t.tp, 0) AS DOUBLE)
            / CAST(COALESCE(t.tp, 0) + COALESCE(t.fn, 0) AS DOUBLE) END
          AS recall,
        CASE WHEN 2 * COALESCE(t.tp, 0) + COALESCE(p.fp, 0)
              + COALESCE(t.fn, 0) = 0 THEN NULL
          ELSE CAST(2 * COALESCE(t.tp, 0) AS DOUBLE)
            / CAST(2 * COALESCE(t.tp, 0) + COALESCE(p.fp, 0)
                + COALESCE(t.fn, 0) AS DOUBLE) END AS f1
      FROM cls
      LEFT JOIN t USING (label)
      LEFT JOIN p USING (label)"""))

  /** DuckDB CTEs producing the q72 near-dup edge list `prs(a_id, b_id)`
    * from the shared SimHash fingerprints. */
  private def oDupEdgeCtes: String =
    s"""${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM sims a JOIN sims b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)"""

  /** Triangle / clustering-coefficient cohesion audit of the q72
    * near-dup graph (see Clusters.triangleStats): cliquish components
    * are true duplicate groups; chain-shaped ones are banding artifacts
    * that transitive closure would over-merge. */
  private val q180 = QueryDef(
    "q180_dupgraph_triangles",
    (s, d) => {
      val docs = Tables.documents(s, d)
      operators.Clusters.triangleStats(docs, "doc_id",
        operators.Corpus.simHashHammingPairs(docs, "doc_id", "text",
          maxHamming = 3),
        "a_id", "b_id")
    },
    Some(s"""
      WITH $oDupEdgeCtes,
      sym AS (SELECT a_id AS u, b_id AS v FROM prs
            UNION ALL SELECT b_id, a_id FROM prs),
      deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
      tri AS (SELECT e1.a_id AS x, e1.b_id AS y, e2.b_id AS z
            FROM prs e1
            JOIN prs e2 ON e2.a_id = e1.b_id
            JOIN prs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
      tc AS (SELECT vtx, COUNT(*) AS triangles FROM (
              SELECT x AS vtx FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri) GROUP BY 1)
      SELECT d.doc_id,
        COALESCE(deg.deg, 0) AS deg,
        COALESCE(tc.triangles, 0) AS triangles,
        CASE WHEN COALESCE(deg.deg, 0) < 2 THEN NULL
          ELSE CAST(2 * COALESCE(tc.triangles, 0) AS DOUBLE)
            / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) END AS lcc
      FROM documents d
      LEFT JOIN deg ON deg.u = d.doc_id
      LEFT JOIN tc ON tc.vtx = d.doc_id"""))

  /** Common-neighbor link prediction on the q72 near-dup graph (see
    * Clusters.commonNeighborCandidates): non-adjacent pairs with >= 2
    * shared neighbors — duplicate pairs the banding never compared but
    * the graph says it should have. Hub vertices above the default
    * center-degree cap contribute no wedges (mirrored in the oracle). */
  private val q181 = QueryDef(
    "q181_dupgraph_link_pred",
    (s, d) => operators.Clusters.commonNeighborCandidates(
      operators.Corpus.simHashHammingPairs(Tables.documents(s, d),
        "doc_id", "text", maxHamming = 3),
      "a_id", "b_id", minCommon = 2),
    Some(s"""
      WITH $oDupEdgeCtes,
      sym AS (SELECT a_id AS u, b_id AS v FROM prs
            UNION ALL SELECT b_id, a_id FROM prs),
      deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY 1),
      ctr AS (SELECT sym.u, sym.v FROM sym
            JOIN deg ON deg.u = sym.u AND deg.deg <= 256),
      cn AS (SELECT s1.v AS a, s2.v AS b, COUNT(*) AS common
            FROM ctr s1 JOIN ctr s2 ON s1.u = s2.u AND s1.v < s2.v
            GROUP BY 1, 2)
      SELECT cn.a AS a_id, cn.b AS b_id, cn.common,
        CAST(cn.common AS DOUBLE)
          / CAST(da.deg + db.deg - cn.common AS DOUBLE) AS jaccard
      FROM cn
      JOIN deg da ON da.u = cn.a
      JOIN deg db ON db.u = cn.b
      WHERE cn.common >= 2
        AND NOT EXISTS (SELECT 1 FROM prs
              WHERE prs.a_id = cn.a AND prs.b_id = cn.b)"""))

  /** Oracle CTE computing the 64-block average-hash from the shared
    * decoded-byte CTE chain (MoreQueries.oMediaBytesCtes): bit b set iff
    * blockSum * n > totalSum * blockLen, accumulated in HUGEINT with the
    * sign bit as the explicit min-long term. */
  private[graft] def oPhashCtes(
      payload: String = "encode(text)",
      nExpr: String =
        "GREATEST(1, (doc_id % 16 + 8) * (doc_id % 12 + 8) * 3)"): String = {
    val weights = (0 until 64).map(b =>
      s"WHEN $b THEN ${if (b == 63) "(-9223372036854775807::HUGEINT - 1)"
        else s"${1L << b}::HUGEINT"}").mkString("\n              ")
    s"""${MoreQueries.oMediaBytesCtes(payload, nExpr)},
      blk AS (SELECT media_id, kind, n, ((j - 1) * 64) // n AS b, v
            FROM bytes),
      bs AS (SELECT media_id, ANY_VALUE(kind) AS kind, ANY_VALUE(n) AS n,
              b, CAST(SUM(v) AS BIGINT) AS bsum, COUNT(*) AS blen
            FROM blk GROUP BY media_id, b),
      tot AS (SELECT media_id, CAST(SUM(v) AS BIGINT) AS tv
            FROM blk GROUP BY 1),
      ph AS (SELECT bs.media_id, ANY_VALUE(bs.kind) AS kind,
              CAST(ANY_VALUE(bs.n) AS INT) AS n_bytes,
              CAST(SUM(CASE WHEN bs.bsum * bs.n > t.tv * bs.blen THEN
                  CASE bs.b $weights ELSE 0::HUGEINT END
                ELSE 0::HUGEINT END) AS BIGINT) AS phash
            FROM bs JOIN tot t USING (media_id)
            GROUP BY bs.media_id)"""
  }

  /** Perceptual average-hash fingerprints over the decoded media byte
    * streams (see Multimodal.perceptualHash) — the multimodal analogue
    * of q36's text SimHash, exact against the stub-codec LCG replay. */
  private val q182 = QueryDef(
    "q182_media_phash",
    (s, d) => operators.Multimodal.perceptualHash(
      operators.Multimodal.spreadForDecode(
        operators.Multimodal.mediaFromDocuments(Tables.documents(s, d)))),
    Some(s"""
      WITH RECURSIVE ${oPhashCtes()}
      SELECT media_id, kind, n_bytes, phash FROM ph"""))

  /** Banded Hamming pairs over perceptual hashes of the media STREAM
    * HEADERS (payload = first 128 chars — thumbnail/header-bytes dedup,
    * the form perceptual media dedup usually takes). The oracle is the
    * full O(n^2) comparison, so equality proves the banding loses no
    * pairs. With the stub codec only identical headers collide (LCG
    * avalanche); a real codec makes the same plumbing visual near-dup. */
  private val q183 = QueryDef(
    "q183_media_phash_pairs",
    (s, d) => {
      import s.implicits._
      val media = operators.Multimodal.mediaFromDocuments(
        Tables.documents(s, d)
          .withColumn("text", substring(col("text"), 1, 128)))
        .map(r => r.copy(meta = r.meta.copy(width = 16, height = 16)))
      operators.Corpus.bandedHammingPairs(
        operators.Multimodal.perceptualHash(
          operators.Multimodal.spreadForDecode(media)),
        "media_id", "phash", maxHamming = 3, bits = 64, numBands = 4)
    },
    Some(s"""
      WITH RECURSIVE ${oPhashCtes("encode(substr(text, 1, 128))", "768")}
      SELECT a.media_id AS a_id, b.media_id AS b_id,
        CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
      FROM ph a JOIN ph b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3"""))

  /** The SNM sort key: normalized alphanumeric prefix. */
  private def snmKey = substring(
    regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 24)
  private val oSnmKey =
    "substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)"

  /** Sorted-neighborhood blocking candidates over the normalized text
    * prefix (see NearDup.sortedNeighborhoodPairs): the record-linkage
    * blocking pass whose blind spot is complementary to banding's. */
  private val q184 = QueryDef(
    "q184_sorted_neighborhood",
    (s, d) => operators.NearDup.sortedNeighborhoodPairs(
      Tables.documents(s, d).filter(col("text").isNotNull),
      "doc_id", snmKey, window = 5),
    Some(s"""
      WITH k AS (SELECT doc_id AS id, $oSnmKey AS k
            FROM documents WHERE text IS NOT NULL),
      r AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rn FROM k)
      SELECT a.id AS a_id, b.id AS b_id,
        CAST(b.rn - a.rn AS INT) AS rank_gap
      FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4"""))

  /** Blocking-quality report: candidates, truth coverage
    * (pairs-completeness), and reduction ratio for the two blocking
    * strategies — SimHash banding vs sorted-neighborhood — against the
    * exact Hamming<=3 ground truth. The eval a linkage pipeline runs
    * before committing to a blocking scheme. */
  private val q185 = QueryDef(
    "q185_blocking_quality",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      // fingerprint ONCE (tokenize + per-token md5 + 32 bit-sums is the
      // dominant cost here) and share the materialized signatures between
      // the ground-truth pass and the banding pass — this query used to
      // compute simHash twice, once inside simHashHammingPairs and once
      // for the band candidates
      val sig = operators.NearDup.simHash(docs, "doc_id", "text", 32)
        .localCheckpoint()
      val truth = operators.Corpus.bandedHammingPairs(sig, "doc_id",
        "simhash", maxHamming = 3, bits = 32, numBands = 4)
        .select(col("a_id"), col("b_id"))
      // band candidates BEFORE the Hamming filter (the blocking output)
      val banded = sig.select(col("doc_id"),
        explode(array((0 until 4).map(b => struct(lit(b).as("band_id"),
          shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L))
            .as("band_val"))): _*)).as("b"))
        .select(col("doc_id"), col("b.band_id"), col("b.band_val"))
      val bandCands = banded.as("x").join(banded.as("y"),
          col("x.band_id") === col("y.band_id") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct()
      val snm = operators.NearDup.sortedNeighborhoodPairs(docs, "doc_id",
          snmKey, window = 5)
        .select(least(col("a_id"), col("b_id")).as("a_id"),
          greatest(col("a_id"), col("b_id")).as("b_id"))
        .distinct()
      val methods = bandCands.withColumn("method", lit("simhash_bands"))
        .union(snm.withColumn("method", lit("snm")))
      val stats = methods
        .join(truth.withColumn("__t", lit(1)), Seq("a_id", "b_id"), "left")
        .groupBy(col("method"))
        .agg(count(lit(1)).as("n_candidates"),
          sum(coalesce(col("__t"), lit(0))).cast("long").as("covered"))
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      val total = docs.agg(count(lit(1)).as("__nd"))
        .select(expr("__nd * (__nd - 1) div 2").as("__total"))
      stats.crossJoin(broadcast(nTruth)).crossJoin(broadcast(total))
        .select(col("method"), col("n_candidates"), col("n_truth"),
          col("covered"),
          (col("covered").cast("double") / col("n_truth").cast("double"))
            .as("pairs_completeness"),
          (lit(1.0) - col("n_candidates").cast("double") /
            col("__total").cast("double")).as("reduction_ratio"))
    },
    Some(s"""
      WITH $oDupEdgeCtes,
      banded AS (SELECT doc_id, b AS band_id,
              (simhash >> (b * 8)) & 255 AS band_val
            FROM sims, LATERAL (SELECT unnest(generate_series(0, 3)) AS b)),
      cand_b AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
            FROM banded x JOIN banded y
              ON x.band_id = y.band_id AND x.band_val = y.band_val
                AND x.doc_id < y.doc_id),
      k AS (SELECT doc_id AS id, $oSnmKey AS k
            FROM documents WHERE text IS NOT NULL),
      r AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rn FROM k),
      cand_s AS (SELECT DISTINCT least(a.id, b.id) AS a_id,
              greatest(a.id, b.id) AS b_id
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4),
      m AS (SELECT 'simhash_bands' AS method, a_id, b_id FROM cand_b
            UNION ALL SELECT 'snm', a_id, b_id FROM cand_s),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM prs),
      nd AS (SELECT COUNT(*) AS c FROM documents WHERE text IS NOT NULL),
      total AS (SELECT CAST(c * (c - 1) // 2 AS BIGINT) AS t FROM nd),
      st AS (SELECT method, CAST(COUNT(*) AS BIGINT) AS n_candidates,
              CAST(SUM(CASE WHEN p.a_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS covered
            FROM m LEFT JOIN prs p USING (a_id, b_id)
            GROUP BY method)
      SELECT method, n_candidates, n_truth, covered,
        CAST(covered AS DOUBLE) / CAST(n_truth AS DOUBLE)
          AS pairs_completeness,
        CAST(1 AS DOUBLE) - CAST(n_candidates AS DOUBLE) / CAST(t AS DOUBLE)
          AS reduction_ratio
      FROM st CROSS JOIN tot CROSS JOIN total"""))

  /** Cross-source duplication matrix: the q72 near-dup pairs rolled up
    * by (source_a, source_b) — which sources copy which (mirrors,
    * scraped re-posts, within-source templates). The provenance signal
    * a corpus owner reads before deciding survivor-preference order in
    * dedup resolution. */
  private val q186 = QueryDef(
    "q186_cross_source_dups",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = operators.Corpus.simHashHammingPairs(docs, "doc_id",
        "text", maxHamming = 3)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("a_id"), col("source").as("__sa")),
          Seq("a_id"))
        .join(src.select(col("doc_id").as("b_id"), col("source").as("__sb")),
          Seq("b_id"))
        .select(least(col("__sa"), col("__sb")).as("source_a"),
          greatest(col("__sa"), col("__sb")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("within_source", col("source_a") === col("source_b"))
    },
    Some(s"""
      WITH $oDupEdgeCtes,
      j AS (SELECT least(sa.source, sb.source) AS source_a,
              greatest(sa.source, sb.source) AS source_b
            FROM prs
            JOIN documents sa ON sa.doc_id = prs.a_id
            JOIN documents sb ON sb.doc_id = prs.b_id)
      SELECT source_a, source_b, COUNT(*) AS n_pairs,
        source_a = source_b AS within_source
      FROM j GROUP BY 1, 2"""))

  private val CoreK = 3
  private val CoreRounds = 10 // fixpoint measured at 5 rounds; 2x margin

  // each round MATERIALIZED: un-materialized CTEs inline per reference,
  // and a 10-round chain referencing its predecessor 3x would expand
  // 3^10 scans of the base table
  private def oPeelRound(i: Int): String = s"""
      k$i AS MATERIALIZED (SELECT u FROM (
              SELECT u, COUNT(*) AS dg FROM (
                SELECT a_id AS u FROM e${i - 1}
                UNION ALL SELECT b_id FROM e${i - 1}) GROUP BY 1)
            WHERE dg >= $CoreK),
      e$i AS MATERIALIZED (SELECT e.a_id, e.b_id FROM e${i - 1} e
            JOIN k$i ka ON ka.u = e.a_id
            JOIN k$i kb ON kb.u = e.b_id)"""

  /** 3-core of the near-dup graph (see Clusters.kCore): the saturated
    * duplicate neighborhoods — template farms and boilerplate clusters —
    * that plain degree or triangle counts under-select. The oracle
    * unrolls the peel to a fixed round count past the measured
    * fixpoint (peeling is monotone, so extra rounds are no-ops). */
  private val q187 = QueryDef(
    "q187_dupgraph_kcore",
    (s, d) => operators.Clusters.kCore(
      operators.Corpus.simHashHammingPairs(Tables.documents(s, d),
        "doc_id", "text", maxHamming = 3),
      "a_id", "b_id", k = CoreK),
    Some(s"""
      WITH $oDupEdgeCtes,
      e0 AS MATERIALIZED (SELECT a_id, b_id FROM prs),
      ${(1 to CoreRounds).map(oPeelRound).mkString(",\n      ")}
      SELECT u AS vertex, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
        SELECT a_id AS u FROM e$CoreRounds
        UNION ALL SELECT b_id FROM e$CoreRounds)
      GROUP BY 1"""))

  /** Shard-rebalance cost of growing a corpus layout from 8 to 10
    * shards, mod-hashing vs rendezvous (highest-random-weight) hashing:
    * mod reshuffles ~everything, rendezvous moves ~2/10 of rows — the
    * quantitative case for consistent placement before a 100 TB
    * re-layout. Both schemes are pure per-row md5 expressions (no
    * shuffle at all until the 2-row rollup). */
  private val q188 = QueryDef(
    "q188_shard_rebalance",
    (s, d) => {
      def modShard(n: Int) = conv(substring(
        md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("int") % n
      def rdvShard(n: Int) =
        operators.Scale.rendezvousShard(col("doc_id"), n)
      val moves = Tables.documents(s, d).select(
        (modShard(8) =!= modShard(10)).cast("int").as("mod_moved"),
        (rdvShard(8) =!= rdvShard(10)).cast("int").as("rdv_moved"))
      val agg = moves.agg(count(lit(1)).as("n_docs"),
        sum(col("mod_moved")).cast("long").as("__mm"),
        sum(col("rdv_moved")).cast("long").as("__rm"))
      agg.select(lit("mod").as("method"), col("n_docs"),
          col("__mm").as("moved"),
          (col("__mm").cast("double") / col("n_docs").cast("double"))
            .as("moved_fraction"))
        .union(agg.select(lit("rendezvous"), col("n_docs"), col("__rm"),
          col("__rm").cast("double") / col("n_docs").cast("double")))
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $j, 1)) - 1)"
      val mod = s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT)"
      s"""
      WITH rdv AS (SELECT doc_id, s,
              md5(CAST(doc_id AS VARCHAR) || '#' || s) AS h
            FROM documents,
            LATERAL (SELECT unnest(generate_series(0, 9)) AS s)),
      r8 AS (SELECT doc_id, arg_max(s, h) AS sh FROM rdv WHERE s < 8
            GROUP BY 1),
      r10 AS (SELECT doc_id, arg_max(s, h) AS sh FROM rdv GROUP BY 1),
      m AS (SELECT doc_id,
              CASE WHEN $mod % 8 <> $mod % 10 THEN 1 ELSE 0 END AS mod_moved,
              CASE WHEN r8.sh <> r10.sh THEN 1 ELSE 0 END AS rdv_moved
            FROM documents JOIN r8 USING (doc_id) JOIN r10 USING (doc_id)),
      a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(mod_moved) AS BIGINT) AS mm,
              CAST(SUM(rdv_moved) AS BIGINT) AS rm FROM m)
      SELECT 'mod' AS method, n_docs, mm AS moved,
        CAST(mm AS DOUBLE) / CAST(n_docs AS DOUBLE) AS moved_fraction
      FROM a
      UNION ALL
      SELECT 'rendezvous', n_docs, rm,
        CAST(rm AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM a"""
    })

  /** IVF index maintenance: vectors assigned to centroids seeded from
    * the EXISTING corpus (vec_id % 10 < 8), with per-centroid old/new
    * occupancy and a drift alert when a bucket's share of new vectors
    * strays > 0.15 from the global share — the report that tells an
    * ANN-index owner when to re-train centroids instead of appending. */
  private val q189 = QueryDef(
    "q189_ivf_maintenance",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      val isNew = (col("vec_id") % 10) >= 8
      val cents = operators.Similarity.ivfCentroids(
        e.filter(!isNew), "vec_id", "embedding", 8)
      val asg = operators.Similarity.ivfAssign(e, "vec_id", "embedding",
        cents)
      val flagged = asg.join(
        e.select(col("vec_id"), isNew.cast("int").as("__new")), Seq("vec_id"))
      val per = flagged.groupBy(col("centroid_id"))
        .agg(sum(lit(1) - col("__new")).cast("long").as("n_old"),
          sum(col("__new")).cast("long").as("n_new"))
      val tot = per.agg(sum(col("n_old")).as("__to"),
        sum(col("n_new")).as("__tn"))
      per.crossJoin(broadcast(tot))
        .select(col("centroid_id"), col("n_old"), col("n_new"),
          (col("n_new").cast("double") /
            (col("n_old") + col("n_new")).cast("double")).as("new_share"),
          (col("__tn").cast("double") /
            (col("__to") + col("__tn")).cast("double")).as("global_share"))
        .withColumn("drift_alert",
          abs(col("new_share") - col("global_share")) > 0.15)
    },
    Some(s"""
      WITH cent AS MATERIALIZED (SELECT vec_id AS centroid_id, embedding AS cemb
            FROM embeddings WHERE vec_id % 10 < 8
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      asg AS MATERIALIZED (SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
              ROW_NUMBER() OVER (PARTITION BY e.vec_id
                ORDER BY ${ExtQueries.oCos("e.embedding", "c.cemb")} DESC,
                  c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
      f AS (SELECT centroid_id,
              CASE WHEN vec_id % 10 >= 8 THEN 1 ELSE 0 END AS nw
            FROM asg),
      per AS (SELECT centroid_id,
              CAST(SUM(1 - nw) AS BIGINT) AS n_old,
              CAST(SUM(nw) AS BIGINT) AS n_new
            FROM f GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_old) AS BIGINT) AS torig,
              CAST(SUM(n_new) AS BIGINT) AS tnew FROM per)
      SELECT centroid_id, n_old, n_new,
        CAST(n_new AS DOUBLE) / CAST(n_old + n_new AS DOUBLE) AS new_share,
        CAST(tnew AS DOUBLE) / CAST(torig + tnew AS DOUBLE) AS global_share,
        abs(CAST(n_new AS DOUBLE) / CAST(n_old + n_new AS DOUBLE)
          - CAST(tnew AS DOUBLE) / CAST(torig + tnew AS DOUBLE)) > 0.15
          AS drift_alert
      FROM per CROSS JOIN tot"""))

  val all: Seq[QueryDef] = Seq(q177, q178, q179, q180, q181, q182, q183,
    q184, q185, q186, q187, q188, q189)
}
