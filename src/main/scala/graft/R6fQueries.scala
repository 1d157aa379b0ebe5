package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.{Baskets, Similarity}

/** Round-6 wave 8: item-based collaborative filtering and contrastive
  * hard-negative mining.
  *
  * q203 turns the co-occurrence machinery (q126/q158) into the actual
  * recommender artifact — per-item neighbor lists under cosine over the
  * basket incidence matrix; q204 is the embedding-training data prep
  * that random negatives can't provide (semi-hard other-label matches).
  */
object R6fQueries {

  private val BasketCap = 24
  private val SimK = 3

  /** Top-3 cosine neighbors per part brand over order baskets
    * (Baskets.itemSimilarity). */
  private val q203 = QueryDef(
    "q203_item_similarity",
    (s, d) => {
      val branded = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      Baskets.itemSimilarity(branded, "l_orderkey", "p_brand",
        maxItemsPerGroup = BasketCap, k = SimK)
    },
    Some(s"""
      WITH items AS (SELECT DISTINCT l.l_orderkey AS g, p.p_brand AS item
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand IS NOT NULL),
      sized AS (SELECT g, item FROM (
              SELECT g, item, count(*) OVER (PARTITION BY g) AS n
              FROM items) WHERE n <= $BasketCap),
      sup AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n
            FROM sized GROUP BY 1),
      half AS (SELECT a.item AS item_a, b.item AS item_b,
              CAST(count(*) AS BIGINT) AS cooc
            FROM sized a JOIN sized b ON a.g = b.g AND a.item < b.item
            GROUP BY 1, 2),
      sym AS (SELECT item_a, item_b, cooc FROM half
              UNION ALL SELECT item_b, item_a, cooc FROM half),
      sc AS (SELECT s.item_a AS item, s.item_b AS neighbor, s.cooc,
              sa.n AS n_item, sb.n AS n_neighbor,
              CAST(s.cooc AS DOUBLE) / sqrt(CAST(sa.n * sb.n AS DOUBLE))
                AS cosine
            FROM sym s JOIN sup sa ON sa.item = s.item_a
                       JOIN sup sb ON sb.item = s.item_b)
      SELECT item, neighbor, cooc, n_item, n_neighbor, cosine,
        CAST(row_number() OVER (PARTITION BY item
          ORDER BY cosine DESC, neighbor) AS INT) AS rank
      FROM sc QUALIFY rank <= $SimK"""))

  private val EmbDim = ExtQueries.OracleEmbDim

  /** Top-5 other-label quantized-cosine matches per anchor (vec_id <
    * 10) — semi-hard negatives for contrastive training
    * (Similarity.hardNegatives). */
  private val q204 = QueryDef(
    "q204_hard_negatives",
    (s, d) => Similarity.hardNegatives(Tables.embeddings(s, d),
      "vec_id", "embedding", "label", col("vec_id") < 10, k = 5),
    Some {
      def idotSql(a: String, b: String) = (1 to EmbDim)
        .map(i => s"$a.q8[$i]*$b.q8[$i]").mkString(" + ")
      s"""
      WITH base AS (SELECT vec_id, label, embedding,
              list_max(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE)))) AS mx
            FROM embeddings WHERE label IS NOT NULL),
      qt AS (SELECT vec_id, label,
              list_transform(embedding, x ->
                CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx)) AS BIGINT))
                AS q8
            FROM base WHERE mx > 0),
      scored AS (SELECT q.vec_id AS q_id, q.label AS q_label,
              n.vec_id AS n_id, n.label AS n_label,
              CAST(${idotSql("q", "n")} AS DOUBLE) /
                (sqrt(CAST(${idotSql("q", "q")} AS DOUBLE)) *
                 sqrt(CAST(${idotSql("n", "n")} AS DOUBLE))) AS q_cosine
            FROM qt q JOIN qt n
              ON q.vec_id < 10 AND n.label <> q.label)
      SELECT q_id, q_label, n_id, n_label, q_cosine,
        CAST(row_number() OVER (PARTITION BY q_id
          ORDER BY q_cosine DESC, n_id) AS INT) AS rank
      FROM scored QUALIFY rank <= 5"""
    })

  val all: Seq[QueryDef] = Seq(q203, q204)
}
