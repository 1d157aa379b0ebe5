package graft

import graft.Queries.QueryDef
import graft.operators.Eval

/** Round-8 wave 2: embedding-space label separability.
  *
  * q293 histograms pairwise cosines over LSH-bucketed candidate pairs,
  * split same-label vs cross-label — the separability readout that says
  * whether the labels are learnable in this embedding space before
  * anyone trains on it (q176 flags individual mislabels; this reads the
  * space's global structure).
  */
object R8bQueries {

  private val Planes = 8
  private val Bins = 10

  private val q293 = QueryDef(
    "q293_label_separability",
    (s, d) => Eval.labelSeparability(Tables.embeddings(s, d), "vec_id",
      "embedding", "label", numPlanes = Planes,
      dim = ExtQueries.OracleEmbDim, bins = Bins),
    Some(s"""
      WITH b AS (SELECT vec_id, embedding, label,
              CAST(${ExtQueries.oLshBucket(Planes)} AS INT) AS bucket
            FROM embeddings),
      prs AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id,
                x.label AS la, y.label AS lb,
                ${ExtQueries.oCos("x.embedding", "y.embedding")} AS c
              FROM b x JOIN b y
                ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
      binned AS (SELECT la = lb AS same_label,
                   LEAST(CAST(floor(c * $Bins) AS INT), ${Bins - 1})
                     AS cos_bin
                 FROM prs WHERE c IS NOT NULL)
      SELECT same_label, cos_bin, CAST(count(*) AS BIGINT) AS n_pairs
      FROM binned GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q293)
}
