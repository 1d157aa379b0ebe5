package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Eval, NearDup}

/** Round-7 wave 26: leakage-free encodings and data-driven LSH design.
  *
  * q289 builds out-of-fold target encodings (each cell's mean excludes
  * its own fold — the trick that makes mean-encoding a legal feature);
  * q290 prices every (bands × rows) split of a 24-hash MinHash budget
  * against the corpus's OWN pair-similarity histogram — expected recall
  * at sim ≥ 0.7 and false-candidate rate among near-misses, replacing
  * textbook b/r folklore with measured mass.
  */
object R7zQueries {

  private val Folds = 5
  private val VBuckets = 64L

  private val q289 = QueryDef(
    "q289_target_encoding",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val fold = (conv(substring(md5(concat_ws("#",
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"))), 1, 4),
        16, 10).cast("int") % Folds).cast("int")
      Eval.targetEncodeOof(li,
        pmod(col("l_partkey"), lit(VBuckets)),
        fold,
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long"))
    },
    Some {
      val key = "CAST(l_orderkey AS VARCHAR) || '#' || " +
        "CAST(l_linenumber AS VARCHAR) || '#' || CAST(l_partkey AS VARCHAR)"
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5($key), $j, 1)) - 1)"
      val fold =
        s"CAST((4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)}) % $Folds AS INT)"
      s"""
      WITH r AS (
        SELECT l_partkey % $VBuckets AS value, $fold AS fold,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                 AS HUGEINT) AS y
        FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_extendedprice IS NOT NULL),
      cells AS (
        SELECT value, fold, CAST(count(*) AS BIGINT) AS n_in_fold,
               CAST(sum(y) AS HUGEINT) AS s
        FROM r GROUP BY 1, 2),
      tot AS (
        SELECT *, CAST(sum(n_in_fold) OVER (PARTITION BY value)
                 AS BIGINT) AS ct,
               CAST(sum(s) OVER (PARTITION BY value) AS HUGEINT) AS st
        FROM cells)
      SELECT value, fold, n_in_fold,
             CASE WHEN ct > n_in_fold
                  THEN CAST(st - s AS DOUBLE)
                    / CAST((ct - n_in_fold) * 100 AS DOUBLE) END
               AS encoding
      FROM tot"""
    })

  private val Budget = 24
  private val Bins = 20
  private val MinSim = 0.2
  private val SimThreshold = 0.7

  /** EXACT-histogram form — verification twin by contract (`_exact`
    * suffix + `uncapped = true` opt-in); the hot-shingle-capped
    * production form is q300. */
  private val q290 = QueryDef(
    "q290_lsh_planner_exact",
    (s, d) => NearDup.lshPlanner(Tables.documents(s, d), "doc_id", "text",
      n = 3, minSim = MinSim, simThreshold = SimThreshold,
      budget = Budget, bins = Bins, maxDf = 0, uncapped = true),
    Some {
      val tBin = math.ceil(SimThreshold * Bins).toInt
      val configs = (1 to Budget).filter(Budget % _ == 0)
        .map(b => (b, Budget / b))
      def pCurve(b: Int, r: Int, sMid: Double): Double = {
        var sr = 1.0; (1 to r).foreach(_ => sr *= sMid)
        var q = 1.0; (1 to b).foreach(_ => q *= (1.0 - sr))
        1.0 - q
      }
      val pivots = (0 until Bins).map(i =>
        s"COALESCE(SUM(CASE WHEN bin = $i THEN 1 END), 0) AS n$i")
        .mkString(",\n               ")
      val outs = configs.map { case (b, r) =>
        def chain(idx: Seq[Int]): String =
          idx.map(i => s"CAST(n$i AS DOUBLE) * ${pCurve(b, r, (i + 0.5) / Bins)}")
            .mkString(" + ")
        val above = (tBin until Bins)
        val near = (0 until tBin)
        s"""SELECT $b AS bands, $r AS rows_per_band,
             CAST(${above.map(i => s"n$i").mkString(" + ")} AS BIGINT)
               AS n_pairs_above,
             CAST(${near.map(i => s"n$i").mkString(" + ")} AS BIGINT)
               AS n_pairs_near,
             CASE WHEN ${above.map(i => s"n$i").mkString(" + ")} = 0
                  THEN 0.0
                  ELSE (${chain(above)})
                    / CAST(${above.map(i => s"n$i").mkString(" + ")}
                        AS DOUBLE) END AS exp_recall,
             CASE WHEN ${near.map(i => s"n$i").mkString(" + ")} = 0
                  THEN 0.0
                  ELSE (${chain(near)})
                    / CAST(${near.map(i => s"n$i").mkString(" + ")}
                        AS DOUBLE) END AS exp_fp_rate
      FROM h"""
      }.mkString("\n      UNION ALL ")
      s"""
      WITH t AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents),
      ws AS (SELECT doc_id, list_distinct(${ExtQueries.oShingles("w", 3)})
               AS sh
             FROM t WHERE len(w) >= 3),
      sh AS (SELECT doc_id, unnest(sh) AS s FROM ws),
      sz AS (SELECT doc_id, len(sh) AS n_sh FROM ws),
      pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  CAST(COUNT(*) AS BIGINT) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id),
      simed AS (
        SELECT p.i, sa.n_sh + sb.n_sh - p.i AS u
        FROM pairs p
        JOIN sz sa ON p.a_id = sa.doc_id
        JOIN sz sb ON p.b_id = sb.doc_id
        WHERE CAST(p.i AS DOUBLE)
          / CAST(sa.n_sh + sb.n_sh - p.i AS DOUBLE) >= $MinSim),
      binned AS (
        SELECT LEAST((i * $Bins) // u, ${Bins - 1}) AS bin FROM simed),
      h AS (SELECT $pivots FROM binned)
      $outs"""
    })

  val all: Seq[QueryDef] = Seq(q289, q290)
}
