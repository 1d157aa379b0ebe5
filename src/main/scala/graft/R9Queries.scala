package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions
import graft.operators.TopK

/** Round-9 wave 7: the grouped top-k PHYSICAL operator
  * (`graft.plans.GroupedTopKExec`) on real data, oracled against the
  * window ROW_NUMBER formulation it replaces.
  *
  * q319 is the reference's T2 top-N-per-group shape (SQLproject1.sql:
  * 689-699) routed through the custom `LogicalPlan -> SparkStrategy ->
  * SparkPlan` tier instead of a Window: map-side per-group heaps forward
  * at most k rows per group per partition, so the exchange moves
  * O(partitions x groups x k) rows instead of the whole fact table.
  * The order is made total (price desc, then the line's full business
  * key) so the boundary row is deterministic in both engines; money is
  * emitted as exact-in-double raw decimals.
  */
object R9Queries {

  private val q319 = QueryDef(
    "q319_grouped_topk_exec",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_suppkey"), col("l_orderkey"), col("l_partkey"),
        col("l_linenumber"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast("double").as("price"))
      TopK.perGroup(li,
        Seq(col("l_suppkey")),
        Seq(col("price").desc, col("l_orderkey"), col("l_partkey"),
          col("l_linenumber"), col("quantity")),
        5)
    },
    Some("""
      WITH ranked AS (
        SELECT l_suppkey, l_orderkey, l_partkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS quantity,
               CAST(l_extendedprice AS DOUBLE) AS price,
               row_number() OVER (
                 PARTITION BY l_suppkey
                 ORDER BY CAST(l_extendedprice AS DOUBLE) DESC,
                          l_orderkey, l_partkey, l_linenumber,
                          CAST(l_quantity AS DOUBLE)) AS rn
        FROM lineitem)
      SELECT l_suppkey, l_orderkey, l_partkey, l_linenumber, quantity, price
      FROM ranked WHERE rn <= 5"""))

  /** The exec on the LLM-pipeline side: longest-3 documents per
    * (source, lang) cell by whitespace token count — the "pick the best k
    * exemplars per stratum" selection a curriculum or eval-set builder
    * runs, where the window plan would sort the whole corpus per cell.
    * Token count is the q30 tokenizer pair (tokens / oToks), so the score
    * is integer-exact in both engines; doc_id breaks ties totally. */
  private val q320 = QueryDef(
    "q320_grouped_topk_docs",
    (s, d) => {
      val docs = Tables.documents(s, d).select(
        col("source"), col("lang"), col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      TopK.perGroup(docs,
        Seq(col("source"), col("lang")),
        Seq(col("n_tokens").desc, col("doc_id")),
        3)
    },
    Some(s"""
      WITH t AS (
        SELECT source, lang, doc_id,
               CAST(len(${ExtQueries.oToks("text")}) AS BIGINT) AS n_tokens
        FROM documents),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY source, lang
          ORDER BY n_tokens DESC, doc_id) AS rn
        FROM t)
      SELECT source, lang, doc_id, n_tokens FROM ranked WHERE rn <= 3"""))

  val all: Seq[QueryDef] = Seq(q319, q320)
}
