package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.{Clusters, Corpus, Linkage, Multimodal, NearDup}

/** Round-6 wave 12: end-to-end entity resolution, partition
  * modularity, multimodal pair manifests.
  *
  * q214 closes the linkage arc (block → score → threshold → cluster →
  * survivorship as one call); q215 turns the q186 provenance matrix
  * into one exact score ("do duplicates concentrate within
  * sources?"); q216 builds the (image, caption) training-pair
  * manifest with quality gates — the multimodal counterpart of the
  * corpus gates.
  */
object R6jQueries {

  private val ErWeights = Seq("source_eq" -> 2.0, "lang_eq" -> 1.5,
    "len_close" -> 4.0, "prefix_eq" -> 40.0)
  private val ErThreshold = 100.0

  private def snmKey = substring(
    regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 24)
  private val oSnmKey =
    "substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24)"

  /** Entity resolution end-to-end over documents: SNM blocking →
    * multiplicative FS scoring (domain-prior weights; learned twins in
    * q191) → threshold → transitive clusters → canonical records
    * (Linkage.scorePairs + resolveEntities). */
  private val q214 = QueryDef(
    "q214_entity_resolution",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val attrs = docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), substring(col("text"), 1, 20).as("pfx"))
      val cands = NearDup.sortedNeighborhoodPairs(docs, "doc_id",
          snmKey, window = 5)
        .select(least(col("a_id"), col("b_id")).as("a_id"),
          greatest(col("a_id"), col("b_id")).as("b_id"))
        .distinct()
      def eq2(c: String): org.apache.spark.sql.Column =
        col(s"da.$c").isNotNull && col(s"db.$c").isNotNull &&
          col(s"da.$c") === col(s"db.$c")
      val pairs = cands
        .join(attrs.as("da"), col("da.doc_id") === col("a_id"))
        .join(attrs.as("db"), col("db.doc_id") === col("b_id"))
        .select(col("a_id"), col("b_id"),
          eq2("source").as("source_eq"), eq2("lang").as("lang_eq"),
          (col("da.n_chars").isNotNull && col("db.n_chars").isNotNull &&
            abs(col("da.n_chars") - col("db.n_chars")) <= 50)
            .as("len_close"),
          eq2("pfx").as("prefix_eq"))
      Linkage.resolveEntities(docs, "doc_id",
        Linkage.scorePairs(pairs, ErWeights), ErThreshold)
    },
    Some(s"""
      WITH RECURSIVE d AS (SELECT doc_id, source, lang, n_chars,
              substr(text, 1, 20) AS pfx, $oSnmKey AS k
            FROM documents WHERE text IS NOT NULL),
      r AS (SELECT doc_id, k, row_number() OVER (ORDER BY k, doc_id) AS rn
            FROM d),
      cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS a_id,
              greatest(a.doc_id, b.doc_id) AS b_id
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 4),
      j AS (SELECT c.a_id, c.b_id,
              (da.source IS NOT NULL AND db.source IS NOT NULL
                AND da.source = db.source) AS source_eq,
              (da.lang IS NOT NULL AND db.lang IS NOT NULL
                AND da.lang = db.lang) AS lang_eq,
              (da.n_chars IS NOT NULL AND db.n_chars IS NOT NULL
                AND abs(da.n_chars - db.n_chars) <= 50) AS len_close,
              (da.pfx IS NOT NULL AND db.pfx IS NOT NULL
                AND da.pfx = db.pfx) AS prefix_eq
            FROM cand c JOIN d da ON da.doc_id = c.a_id
                        JOIN d db ON db.doc_id = c.b_id),
      sc AS (SELECT a_id, b_id,
              ((((1.0 * CASE WHEN source_eq THEN 2.0 ELSE 1.0 END)
                * CASE WHEN lang_eq THEN 1.5 ELSE 1.0 END)
                * CASE WHEN len_close THEN 4.0 ELSE 1.0 END)
                * CASE WHEN prefix_eq THEN 40.0 ELSE 1.0 END) AS score
            FROM j),
      e AS (SELECT a_id, b_id FROM sc WHERE score >= $ErThreshold),
      edges AS (SELECT a_id AS src, b_id AS dst FROM e
                UNION SELECT b_id, a_id FROM e),
      reach AS (SELECT doc_id AS id, doc_id AS rr FROM d
                UNION
                SELECT e2.src AS id, reach.rr
                FROM edges e2 JOIN reach ON e2.dst = reach.id),
      lab AS (SELECT id AS doc_id, MIN(rr) AS entity_id
            FROM reach GROUP BY 1),
      sz AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS entity_size
            FROM lab GROUP BY 1)
      SELECT lab.doc_id, lab.entity_id, sz.entity_size,
        lab.doc_id = lab.entity_id AS is_canonical
      FROM lab JOIN sz USING (entity_id)"""))

  /** Source-partition modularity over the q72 near-dup graph
    * (Clusters.partitionModularity): exact-integer Newman Q. */
  private val q215 = QueryDef(
    "q215_dupgraph_modularity",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Corpus.simHashHammingPairs(docs, "doc_id", "text",
        maxHamming = 3).select(col("a_id"), col("b_id"))
      Clusters.partitionModularity(pairs, "a_id", "b_id",
        docs.select(col("doc_id"), col("source")), "doc_id", "source")
    },
    Some(s"""
      WITH ${ExtQueries.oSimHashCtes},
      prs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              FROM sims a JOIN sims b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
      lab AS (SELECT p.a_id AS a, p.b_id AS b, ma.source AS ca,
              mb.source AS cb
            FROM prs p JOIN documents ma ON ma.doc_id = p.a_id
                       JOIN documents mb ON mb.doc_id = p.b_id),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM lab),
      intra AS (SELECT ca AS community,
              CAST(COUNT(*) AS BIGINT) AS intra_edges
            FROM lab WHERE ca = cb GROUP BY 1),
      deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS dd FROM (
              SELECT a AS id FROM lab UNION ALL SELECT b FROM lab)
            GROUP BY 1),
      dc AS (SELECT mm.source AS community,
              CAST(SUM(deg.dd) AS BIGINT) AS degree_sum,
              CAST(COUNT(*) AS BIGINT) AS n_active_nodes
            FROM deg JOIN documents mm ON mm.doc_id = deg.id GROUP BY 1),
      mems AS (SELECT source AS community,
              CAST(COUNT(*) AS BIGINT) AS n_members
            FROM documents GROUP BY 1),
      perc AS (SELECT mems.community, mems.n_members,
              COALESCE(dc.n_active_nodes, 0) AS n_active_nodes,
              COALESCE(i.intra_edges, 0) AS intra_edges,
              COALESCE(dc.degree_sum, 0) AS degree_sum
            FROM mems LEFT JOIN dc ON dc.community = mems.community
                      LEFT JOIN intra i ON i.community = mems.community),
      g AS (SELECT CAST(4 * m.m * SUM(intra_edges)
                - SUM(degree_sum * degree_sum) AS DOUBLE)
              / CAST(4 * m.m * m.m AS DOUBLE) AS q_modularity
            FROM perc CROSS JOIN m GROUP BY m.m)
      SELECT perc.*, g.q_modularity FROM perc CROSS JOIN g"""))

  /** (image, caption) training-pair manifest with quality gates over
    * the multimodal columns (payload pruned out of the scan). */
  private val q216 = QueryDef(
    "q216_media_caption_pairs",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val media = Multimodal.mediaFromDocuments(docs).toDF()
        .select(col("media_id"), col("kind"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.format").as("format"))
      val caps = docs.select(col("doc_id"), col("lang"),
        size(TextFunctions.tokens(col("text"))).cast("long")
          .as("caption_tokens"))
      media.join(caps, col("media_id") === col("doc_id"))
        .withColumn("lang_ok", coalesce(col("lang") === "en", lit(false)))
        .withColumn("len_ok", coalesce(
          col("caption_tokens").between(5, 60), lit(false)))
        .withColumn("kind_ok", col("kind") === "image")
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("format"), col("caption_tokens"), col("lang_ok"),
          col("len_ok"), col("kind_ok"),
          (col("lang_ok") && col("len_ok") && col("kind_ok"))
            .as("pair_ok"))
    },
    Some(s"""
      WITH m AS (SELECT doc_id AS media_id,
              (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)]
                AS kind,
              CAST(doc_id % 16 + 8 AS INT) AS width,
              CAST(doc_id % 12 + 8 AS INT) AS height,
              (['jpeg', 'wav', 'mp4'])[CAST(doc_id % 3 + 1 AS INT)]
                AS format,
              lang,
              CAST(len(${ExtQueries.oToks("text")}) AS BIGINT)
                AS caption_tokens
            FROM documents)
      SELECT media_id, kind, width, height, format, caption_tokens,
        COALESCE(lang = 'en', FALSE) AS lang_ok,
        COALESCE(caption_tokens BETWEEN 5 AND 60, FALSE) AS len_ok,
        kind = 'image' AS kind_ok,
        COALESCE(lang = 'en', FALSE)
          AND COALESCE(caption_tokens BETWEEN 5 AND 60, FALSE)
          AND kind = 'image' AS pair_ok
      FROM m"""))

  val all: Seq[QueryDef] = Seq(q214, q215, q216)
}
