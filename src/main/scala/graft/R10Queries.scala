package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Dsir

/** Round-10 wave: DSIR importance resampling (Xie et al. 2023,
  * arXiv:2302.03169) over the documents corpus.
  *
  * q324 fits hashed unigram+bigram models on the `lang = 'en'` half
  * (the "target" a curator wants more of) and on the rest of the corpus
  * (the raw crawl pool), then Gumbel-top-k samples the pool docs whose
  * feature profile is most en-target-like. The oracle replays the md5
  * bucket hash, the add-one-smoothed 2^-30-grid log models, and the
  * quantized Gumbel draw, so the selected set and both score columns
  * hash-match bit-for-bit.
  */
object R10Queries {

  private val B = 512      // hashed feature buckets
  private val K = 60       // selected docs
  private val Seed = "r10"

  private val q324 = QueryDef(
    "q324_dsir_select",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dsir.dsirSelect(
        raw = docs.filter(col("lang") =!= "en"),
        target = docs.filter(col("lang") === "en"),
        idCol = "doc_id", textCol = "text", k = K, buckets = B,
        seed = Seed, carryCols = Seq("lang", "source"))
    },
    Some {
      val nib = (h: String, j: Int) =>
        s"(strpos('0123456789abcdef', substr($h, $j, 1)) - 1)"
      val hash24 = (0 until 6)
        .map(j => s"${BigInt(16).pow(5 - j)}*${nib("h", j + 1)}")
        .mkString(" + ")
      val hash48 = (0 until 12)
        .map(j => s"${BigInt(16).pow(11 - j)}*${nib("h", j + 1)}")
        .mkString(" + ")
      s"""
      WITH tw AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      gr AS (SELECT doc_id,
               unnest(list_concat(w, ${ExtQueries.oShingles("w", 2)}))
                 AS gram
             FROM tw),
      bh AS (SELECT doc_id, md5(gram) AS h FROM gr),
      feat AS MATERIALIZED (SELECT doc_id,
               CAST($hash24 AS BIGINT) % $B AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
             FROM bh GROUP BY 1, 2),
      tgt AS (SELECT bucket, sum(cnt) AS tc
              FROM feat JOIN documents USING (doc_id)
              WHERE lang = 'en' GROUP BY 1),
      rawf AS MATERIALIZED (SELECT feat.*
              FROM feat JOIN documents USING (doc_id)
              WHERE lang <> 'en'),
      rawc AS (SELECT bucket, sum(cnt) AS qc FROM rawf GROUP BY 1),
      tot AS (SELECT (SELECT sum(tc) FROM tgt) AS tt,
                     (SELECT sum(qc) FROM rawc) AS tq),
      lw AS (SELECT doc_id,
               CAST(sum(cnt * (
                 CAST(floor(ln((COALESCE(tc, 0) + 1.0)
                   / (tt + $B.0)) * 1073741824.0) AS BIGINT)
               - CAST(floor(ln((COALESCE(qc, 0) + 1.0)
                   / (tq + $B.0)) * 1073741824.0) AS BIGINT)))
                 AS BIGINT) AS lw_scaled
             FROM rawf LEFT JOIN tgt USING (bucket)
             LEFT JOIN rawc USING (bucket) CROSS JOIN tot
             GROUP BY doc_id),
      gm AS (SELECT doc_id,
               md5('$Seed:' || CAST(doc_id AS VARCHAR)) AS h
             FROM lw),
      u AS (SELECT doc_id,
              (CAST($hash48 AS BIGINT) + 1.0) / 281474976710656.0 AS uu
            FROM gm),
      e AS (SELECT doc_id,
              GREATEST(CAST(-floor(ln(uu) * 1073741824.0) AS BIGINT),
                       1) AS es
            FROM u),
      g AS (SELECT doc_id,
              CAST(-floor(ln(CAST(es AS DOUBLE) / 1073741824.0)
                * 1073741824.0) AS BIGINT) AS gs
            FROM e),
      keyed AS (SELECT lw.doc_id, lw_scaled, lw_scaled + gs AS ks
                FROM lw JOIN g USING (doc_id))
      SELECT d.doc_id, d.lang, d.source,
             CAST(lw_scaled AS DOUBLE) / 1073741824.0 AS log_weight_nats,
             CAST(ks AS DOUBLE) / 1073741824.0 AS sample_key_nats
      FROM keyed JOIN documents d USING (doc_id)
      ORDER BY ks DESC, doc_id LIMIT $K"""
    })

  private val SpanLen = 8

  /** Exact-substring dedup with removal (Lee et al. 2022): every
    * non-canonical occurrence of an 8-token span is deleted; one copy of
    * every repeated span survives corpus-wide. The oracle replays the
    * canonical pick (first by doc_id, then span position) and the
    * position-level deletion exactly. */
  private val q325 = QueryDef(
    "q325_span_removal",
    (s, d) => graft.operators.Corpus.removeDuplicatedSpans(
      Tables.documents(s, d), "doc_id", "text", SpanLen),
    Some(s"""
      WITH t AS MATERIALIZED (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      sp AS MATERIALIZED (
        SELECT doc_id, generate_subscripts(sh, 1) - 1 AS spos,
               unnest(sh) AS s
        FROM (SELECT doc_id, ${ExtQueries.oShingles("w", SpanLen)} AS sh
              FROM t WHERE len(w) >= $SpanLen)),
      dups AS (SELECT doc_id, spos FROM (
          SELECT doc_id, spos,
                 row_number() OVER (PARTITION BY s
                   ORDER BY doc_id, spos) AS rn
          FROM sp) WHERE rn > 1),
      offs AS (SELECT doc_id, spos, unnest(range(0, $SpanLen)) AS off
               FROM dups),
      rem AS (SELECT DISTINCT doc_id, spos + off AS pos FROM offs),
      toks AS MATERIALIZED (
        SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
               unnest(w) AS tok
        FROM t),
      kept AS (SELECT k.doc_id, k.pos, k.tok FROM toks k
               WHERE NOT EXISTS (SELECT 1 FROM rem r
                 WHERE r.doc_id = k.doc_id AND r.pos = k.pos)),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nk,
               string_agg(tok, ' ' ORDER BY pos) AS cleaned
              FROM kept GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(w) AS INT) AS n_tokens,
             CAST(len(w) - COALESCE(nk, 0) AS BIGINT) AS n_removed,
             COALESCE(cleaned, '') AS cleaned_text
      FROM t LEFT JOIN agg USING (doc_id)"""))

  private val Blocklist =
    Seq("hash value", "value table", "row scan", "scan slow", "a row")

  /** Aho-Corasick blocklist gate: one automaton pass per document counts
    * every occurrence of every phrase (overlapping included). The oracle
    * replays each phrase as an all-start-positions substring scan —
    * exactly the overlapping-count semantics the automaton produces. */
  private val q326 = QueryDef(
    "q326_blocklist_gate",
    (s, d) => graft.operators.Corpus.blocklistHits(
      Tables.documents(s, d), "doc_id", "text", Blocklist),
    Some {
      val terms = Blocklist.map { p =>
        val k = p.length
        s"len(list_filter(range(1, len(text) - $k + 2), i -> substr(text, i, $k) = '$p'))"
      }.mkString("(", " + ", ")")
      s"""
      SELECT doc_id, CAST($terms AS BIGINT) AS n_hits,
             CAST($terms AS BIGINT) > 0 AS blocked
      FROM documents"""
    })

  private val NovN = 5

  /** Snapshot novelty curve: treating each source as a crawl dump (in
    * source-name order), the fraction of its distinct 5-gram shingles
    * first seen there — the ingest-the-next-dump decision metric. */
  private val q327 = QueryDef(
    "q327_snapshot_novelty",
    (s, d) => graft.operators.Corpus.snapshotNovelty(
      Tables.documents(s, d), "source", "text", NovN),
    Some(s"""
      WITH t AS (SELECT source, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      sp AS MATERIALIZED (
        SELECT DISTINCT source,
               unnest(list_distinct(${ExtQueries.oShingles("w", NovN)}))
                 AS s
        FROM t WHERE len(w) >= $NovN),
      f AS (SELECT s, min(source) AS fs FROM sp GROUP BY s)
      SELECT source AS snapshot,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN source = fs THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
             CAST(sum(CASE WHEN source = fs THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS novelty
      FROM sp JOIN f USING (s) GROUP BY source"""))

  private val ZBits = 8
  private val ZFiles = 16

  /** Z-order (Morton) layout audit: the same lineitem rows clustered by
    * the bit-interleaved (orderkey, partkey) key vs by orderkey alone,
    * split into 16 equal-row files; per bucket-space quartile predicate
    * on EACH dimension, how many files a min/max zone-map reader opens.
    * Single-column sort prunes one dimension and reads ~all files for
    * the other; z-order prunes both — the multi-dimensional
    * sort-on-write case (Delta/Iceberg OPTIMIZE ZORDER). All bucket and
    * interleave math is shift-exact (Scale.powerOfTwoBucket /
    * zorderValue), so the oracle replays it with `>>`/`&`/`|`. */
  private val q328 = QueryDef(
    "q328_zorder_layout",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("ok"),
        col("l_partkey").cast("long").as("pk"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("tb"))
      val mm = li.agg(min(col("ok")).as("olo"), max(col("ok")).as("ohi"),
        min(col("pk")).as("plo"), max(col("pk")).as("phi"))
      val scaled = li.crossJoin(broadcast(mm))
        .withColumn("oa", graft.operators.Scale.powerOfTwoBucket(
          col("ok"), col("olo"), col("ohi"), ZBits))
        .withColumn("pb", graft.operators.Scale.powerOfTwoBucket(
          col("pk"), col("plo"), col("phi"), ZBits))
        .withColumn("zv", graft.operators.Scale.zorderValue(
          col("oa"), col("pb"), ZBits))
        .select(col("oa"), col("pb"), col("zv"), col("tb"))
      def fileStats(valueCol: String, layout: String) = {
        val ranked = graft.operators.Scale.globalRowNumber(
          scaled, valueCol, "tb")
        val n = ranked.agg(count(lit(1)).as("__N"))
        ranked.crossJoin(broadcast(n))
          .withColumn("file_id",
            expr(s"cast(((global_rn - 1) * $ZFiles) div __N as int)"))
          .groupBy(col("file_id"))
          .agg(min(col("oa")).as("a_lo"), max(col("oa")).as("a_hi"),
            min(col("pb")).as("b_lo"), max(col("pb")).as("b_hi"),
            count(lit(1)).as("n_rows"))
          .withColumn("layout", lit(layout))
      }
      val files = fileStats("zv", "zorder").union(fileStats("oa", "sort_a"))
      val quarter = 1L << (ZBits - 2)
      val preds = (0 until 4).flatMap(k => Seq(
          (s"a_q$k", "a", k * quarter, (k + 1) * quarter - 1),
          (s"b_q$k", "b", k * quarter, (k + 1) * quarter - 1)))
        .toDF("pred_id", "dim", "q_lo", "q_hi")
      val hit = when(col("dim") === "a",
        col("a_hi") >= col("q_lo") && col("a_lo") <= col("q_hi"))
        .otherwise(col("b_hi") >= col("q_lo") && col("b_lo") <= col("q_hi"))
      files.crossJoin(broadcast(preds))
        .groupBy(col("layout"), col("pred_id"))
        .agg(sum(when(hit, 1L).otherwise(0L)).as("files_read"),
          sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_read"))
        .withColumn("files_skipped", lit(ZFiles.toLong) - col("files_read"))
    },
    Some {
      val z = (0 until ZBits).map(i =>
        s"(((oa >> $i) & 1) << ${2 * i}) | (((pb >> $i) & 1) << ${2 * i + 1})")
        .mkString("(", " | ", ")")
      val quarter = 1L << (ZBits - 2)
      val predRows = (0 until 4).flatMap(k => Seq(
          s"('a_q$k', 'a', ${k * quarter}, ${(k + 1) * quarter - 1})",
          s"('b_q$k', 'b', ${k * quarter}, ${(k + 1) * quarter - 1})"))
        .mkString(", ")
      def fileCte(src: String, layout: String) =
        s"""SELECT '$layout' AS layout,
              CAST(((rn - 1) * $ZFiles) // N AS INT) AS file_id,
              min(oa) AS a_lo, max(oa) AS a_hi,
              min(pb) AS b_lo, max(pb) AS b_hi,
              CAST(count(*) AS BIGINT) AS n_rows
            FROM $src CROSS JOIN n GROUP BY 1, 2"""
      s"""
      WITH li AS (SELECT CAST(l_orderkey AS BIGINT) AS ok,
              CAST(l_partkey AS BIGINT) AS pk,
              CAST(l_orderkey * 8 + l_linenumber AS BIGINT) AS tb
            FROM lineitem),
      mm AS (SELECT min(ok) AS olo, max(ok) AS ohi,
                    min(pk) AS plo, max(pk) AS phi FROM li),
      z AS MATERIALIZED (SELECT oa, pb, $z AS zv, tb FROM (
        SELECT (ok - olo) >> GREATEST(length(bin(ohi - olo)) - $ZBits, 0)
                 AS oa,
               (pk - plo) >> GREATEST(length(bin(phi - plo)) - $ZBits, 0)
                 AS pb,
               tb
        FROM li CROSS JOIN mm)),
      n AS (SELECT count(*) AS N FROM z),
      rz AS (SELECT oa, pb,
               row_number() OVER (ORDER BY zv, tb) AS rn FROM z),
      ra AS (SELECT oa, pb,
               row_number() OVER (ORDER BY oa, tb) AS rn FROM z),
      files AS (${fileCte("rz", "zorder")} UNION ALL
                ${fileCte("ra", "sort_a")}),
      preds(pred_id, dim, q_lo, q_hi) AS (VALUES $predRows),
      h AS (SELECT layout, pred_id, n_rows,
              CASE WHEN dim = 'a'
                   THEN a_hi >= q_lo AND a_lo <= q_hi
                   ELSE b_hi >= q_lo AND b_lo <= q_hi END AS hit
            FROM files CROSS JOIN preds)
      SELECT layout, pred_id,
             CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS files_read,
             CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_read,
             CAST($ZFiles - sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS files_skipped
      FROM h GROUP BY layout, pred_id"""
    })

  val all: Seq[QueryDef] = Seq(q324, q325, q326, q327, q328)
}
