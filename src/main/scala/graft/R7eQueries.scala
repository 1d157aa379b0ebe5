package graft

import graft.Queries.QueryDef
import graft.operators.Corpus

/** Round-7 wave 5: BPE tokenization — ENCODING, not just merge learning.
  *
  * q97 learned the merge-candidate statistics; these apply them. q253
  * encodes the distinct vocabulary with the codegen `bpe_encode`
  * expression (iterative lowest-rank merging — the oracle replays the
  * loop as a recursive CTE whose state is the symbol list); q254 turns
  * that into per-document tokenizer-token counts via a broadcast
  * vocabulary join — the token-budget number every training-data
  * pipeline reports, computed Zipf-amortized (each distinct token
  * encoded exactly once, never per occurrence).
  */
object R7eQueries {

  private val TopK = 50

  /** CTE chain ending at `fin(tok, s)` — final symbol list per distinct
    * token — plus `toks` for downstream occurrence joins. DuckDB's
    * `list_position` returns 0 (not NULL) for absent elements; every
    * membership test is therefore `> 0`. */
  private val oBpeCtes = s"""
      toks AS (SELECT unnest(${ExtQueries.oToks("text")}) AS tok
               FROM documents),
      w AS (SELECT tok FROM toks WHERE length(tok) >= 2),
      p AS (SELECT unnest(list_transform(range(1, length(tok)),
              i -> substr(tok, CAST(i AS INT), 2))) AS pair FROM w),
      cnt AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p
              GROUP BY 1),
      merges AS (SELECT pair, row_number() OVER (ORDER BY n DESC, pair)
                   AS rank
                 FROM cnt QUALIFY rank <= $TopK),
      ml AS MATERIALIZED (SELECT LIST(pair ORDER BY rank) AS ml
                          FROM merges),
      vocab AS MATERIALIZED (SELECT DISTINCT tok FROM toks),
      v0 AS (SELECT tok, list_transform(range(1, length(tok) + 1),
               i -> substr(tok, CAST(i AS INT), 1)) AS s FROM vocab),
      enc AS (
        SELECT tok, s FROM v0
        UNION ALL
        SELECT tok, s[1:bi-1] || [s[bi] || s[bi+1]] || s[bi+2:] AS s
        FROM (
          SELECT e.tok, e.s, CAST(code % 4096 AS INT) AS bi
          FROM (
            SELECT e.tok, e.s,
              list_min(list_transform(
                list_filter(range(1, len(e.s)), i ->
                  list_position(m.ml, e.s[CAST(i AS INT)]
                    || e.s[CAST(i AS INT) + 1]) > 0),
                i -> list_position(m.ml, e.s[CAST(i AS INT)]
                  || e.s[CAST(i AS INT) + 1]) * 4096 + i)) AS code
            FROM enc e CROSS JOIN ml m) e
          WHERE code IS NOT NULL) e),
      fin AS (
        SELECT e.tok, e.s FROM enc e CROSS JOIN ml m
        WHERE list_min(list_transform(
            list_filter(range(1, len(e.s)), i ->
              list_position(m.ml, e.s[CAST(i AS INT)]
                || e.s[CAST(i AS INT) + 1]) > 0),
            i -> 1)) IS NULL)"""

  private val q253 = QueryDef(
    "q253_bpe_encode",
    (s, d) => Corpus.bpeEncodeVocab(Tables.documents(s, d), "text", TopK),
    Some(s"""
      WITH RECURSIVE $oBpeCtes
      SELECT tok AS token, list_aggregate(s, 'string_agg', ' ') AS encoded,
             CAST(len(s) AS BIGINT) AS n_symbols
      FROM fin"""))

  private val q254 = QueryDef(
    "q254_bpe_token_counts",
    (s, d) => Corpus.bpeTokenCounts(Tables.documents(s, d), "doc_id",
      "text", TopK),
    Some(s"""
      WITH RECURSIVE $oBpeCtes,
      occ AS (SELECT doc_id, unnest(${ExtQueries.oToks("text")}) AS tok
              FROM documents)
      SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(len(f.s)) AS BIGINT) AS n_bpe_symbols
      FROM occ JOIN fin f USING (tok)
      GROUP BY 1"""))

  /** Tokenizer fertility per source (BPE tokens/word, chars/BPE token):
    * the tokenizer-fit report, Zipf-amortized over the distinct
    * vocabulary like q253/q254. */
  private val q305 = QueryDef(
    "q305_tokenizer_fertility",
    (s, d) => Corpus.tokenizerFertility(Tables.documents(s, d), "source",
      "text", TopK),
    Some(s"""
      WITH RECURSIVE $oBpeCtes,
      occ AS (SELECT source, unnest(${ExtQueries.oToks("text")}) AS tok
              FROM documents),
      so AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
             FROM occ GROUP BY 1, 2)
      SELECT source,
             CAST(sum(cnt) AS BIGINT) AS n_words,
             CAST(sum(cnt * len(f.s)) AS BIGINT) AS n_bpe_tokens,
             CAST(sum(cnt * length(tok)) AS BIGINT) AS n_chars,
             CAST(sum(cnt * len(f.s)) AS DOUBLE)
               / CAST(sum(cnt) AS DOUBLE) AS fertility,
             CAST(sum(cnt * length(tok)) AS DOUBLE)
               / CAST(sum(cnt * len(f.s)) AS DOUBLE) AS chars_per_bpe_token
      FROM so JOIN fin f USING (tok)
      GROUP BY source"""))

  val all: Seq[QueryDef] = Seq(q253, q254, q305)
}
