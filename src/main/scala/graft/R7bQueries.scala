package graft

import graft.Queries.QueryDef
import graft.operators.Pca

/** Round-7 wave 2: top principal component via integer power iteration.
  *
  * q247 extracts the top eigenvector of the embedding scatter matrix on
  * an exact 2^20 integer grid (so the DuckDB oracle can replay the
  * iteration bit-for-bit — it unrolls the 20 matvec/renormalize steps as
  * chained HUGEINT CTEs); q248 projects every centered vector onto it.
  * Together they are the whitening/variance-screen foundation q193's
  * covariance stopped short of.
  */
object R7bQueries {

  private val Iters = 20

  /** CTE chain ending at `vf(pos, v)` (signed top eigenvector on the
    * 2^20 grid, HUGEINT) plus `b`, `s`, `nn`, `mf` for downstream use. */
  private def oPowerCtes: String = {
    val base = """
      x AS (SELECT vec_id, unnest(embedding) AS e,
              unnest(generate_series(0, len(embedding) - 1)) AS pos
            FROM embeddings WHERE embedding IS NOT NULL),
      b AS MATERIALIZED (SELECT vec_id, pos,
              CAST(floor(CAST(e AS DOUBLE) * 1024) AS BIGINT) AS q FROM x),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
            FROM embeddings WHERE embedding IS NOT NULL),
      s AS (SELECT pos, CAST(SUM(q) AS BIGINT) AS s FROM b GROUP BY 1),
      pr AS (SELECT a.pos AS i, c.pos AS j,
              CAST(SUM(a.q * c.q) AS BIGINT) AS s_ij
            FROM b a JOIN b c ON a.vec_id = c.vec_id AND a.pos <= c.pos
            GROUP BY 1, 2),
      tri AS (SELECT pr.i, pr.j,
              CAST(nn.n AS HUGEINT) * pr.s_ij
                - CAST(si.s AS HUGEINT) * sj.s AS mval
            FROM pr JOIN s si ON si.pos = pr.i
                    JOIN s sj ON sj.pos = pr.j CROSS JOIN nn),
      mf AS MATERIALIZED (SELECT i, j, mval FROM tri
             UNION ALL SELECT j, i, mval FROM tri WHERE i <> j),
      v0 AS (SELECT DISTINCT i AS pos, 1048576::HUGEINT AS v FROM mf)"""
    val steps = (1 to Iters).map { k =>
      s"""
      w$k AS MATERIALIZED (
            SELECT m.i AS pos, CAST(SUM(m.mval * v.v) AS HUGEINT) AS w
            FROM mf m JOIN v${k - 1} v ON v.pos = m.j GROUP BY 1),
      x$k AS (SELECT MAX(ABS(w)) AS mx FROM w$k),
      v$k AS (SELECT pos,
              CAST((w * 1048576
                    - (((w * 1048576) % mx) + mx) % mx) // mx AS HUGEINT)
                AS v
            FROM w$k CROSS JOIN x$k WHERE mx > 0)"""
    }.mkString(",")
    val sign = s"""
      sgn AS (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
              FROM v$Iters ORDER BY ABS(v) DESC, pos LIMIT 1),
      vf AS MATERIALIZED (SELECT pos, CAST(v * sg AS HUGEINT) AS v
             FROM v$Iters CROSS JOIN sgn)"""
    base + "," + steps + "," + sign
  }

  private val q247 = QueryDef(
    "q247_pca_power",
    (s, d) => Pca.topComponent(Tables.embeddings(s, d), "vec_id",
      "embedding", qScale = 1024, iters = Iters),
    Some(s"""
      WITH $oPowerCtes,
      wf AS (SELECT m.i AS pos, CAST(SUM(m.mval * v.v) AS HUGEINT) AS w
            FROM mf m JOIN vf v ON v.pos = m.j GROUP BY 1),
      ray AS (SELECT CAST(SUM(vf.v * wf.w) AS DOUBLE)
                / CAST((SELECT SUM(v * v) FROM vf) AS DOUBLE) AS rayleigh
            FROM vf JOIN wf USING (pos))
      SELECT CAST(pos AS INT) AS pos, CAST(v AS BIGINT) AS v20, rayleigh
      FROM vf CROSS JOIN ray"""))

  private val q248 = QueryDef(
    "q248_pca_project",
    (s, d) => Pca.projectScores(Tables.embeddings(s, d), "vec_id",
      "embedding", qScale = 1024, iters = Iters),
    Some(s"""
      WITH $oPowerCtes,
      qv AS (SELECT b.vec_id, CAST(SUM(b.q * v.v) AS HUGEINT) AS qv
            FROM b JOIN vf v USING (pos) GROUP BY 1),
      svv AS (SELECT CAST(SUM(s.s * v.v) AS HUGEINT) AS sv
            FROM s JOIN vf v ON v.pos = s.pos)
      SELECT qv.vec_id,
             CAST(nn.n * qv.qv - svv.sv AS DOUBLE)
               / CAST(CAST(nn.n AS HUGEINT) * 1048576 * 1024 AS DOUBLE)
               AS score
      FROM qv CROSS JOIN svv CROSS JOIN nn"""))

  val all: Seq[QueryDef] = Seq(q247, q248)
}
