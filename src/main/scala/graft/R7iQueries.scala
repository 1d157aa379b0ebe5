package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Baskets

/** Round-7 wave 9: level-3 frequent-itemset mining.
  *
  * q259 lifts the q126 pair co-occurrence to triples under A-priori
  * pruning (a triple is only counted when all three pairs are frequent
  * — downward closure), over brand baskets per order. The pruning is
  * the point at scale: the extension join runs on the frequent-pair
  * survivor list, never on cap³ raw combinations.
  */
object R7iQueries {

  private val Cap = 20
  private val MinSup = 50L

  private val q259 = QueryDef(
    "q259_frequent_triples",
    (s, d) => {
      val branded = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      Baskets.frequentTriples(branded, "l_orderkey", "p_brand",
        maxItemsPerGroup = Cap, minSupport = MinSup)
    },
    Some(s"""
      WITH b AS (
        SELECT DISTINCT l_orderkey AS g, p_brand AS item
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand IS NOT NULL),
      sz AS (SELECT g FROM b GROUP BY g HAVING count(*) <= $Cap),
      s AS (SELECT b.g, b.item FROM b JOIN sz USING (g)),
      nb AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS nb FROM s),
      gp AS (SELECT a.g, a.item AS ia, c.item AS ib
             FROM s a JOIN s c ON a.g = c.g AND a.item < c.item),
      fp AS (SELECT ia, ib FROM gp GROUP BY ia, ib
             HAVING count(*) >= $MinSup),
      cand AS (
        SELECT p1.ia AS a, p1.ib AS b, p2.ib AS c
        FROM fp p1 JOIN fp p2 ON p1.ia = p2.ia AND p1.ib < p2.ib
        WHERE EXISTS (SELECT 1 FROM fp p3
                      WHERE p3.ia = p1.ib AND p3.ib = p2.ib)),
      tri AS (
        SELECT gp.g, gp.ia AS a, gp.ib AS b, s.item AS c
        FROM gp
        JOIN fp ON fp.ia = gp.ia AND fp.ib = gp.ib
        JOIN s ON s.g = gp.g AND gp.ib < s.item
        WHERE EXISTS (SELECT 1 FROM cand
                      WHERE cand.a = gp.ia AND cand.b = gp.ib
                        AND cand.c = s.item))
      SELECT a AS item_a, b AS item_b, c AS item_c,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(count(*) AS DOUBLE) / CAST(nb.nb AS DOUBLE) AS support
      FROM tri CROSS JOIN nb
      GROUP BY a, b, c, nb.nb
      HAVING count(*) >= $MinSup"""))

  val all: Seq[QueryDef] = Seq(q259)
}
