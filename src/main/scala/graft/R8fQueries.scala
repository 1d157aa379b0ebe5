package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.functions.TextFunctions

/** Round-8 wave 6: classifier QA for the pipeline's own heuristics.
  *
  * q297 cross-tabulates the declared document language against the
  * q31 marker-based language-ID prediction — the confusion matrix plus
  * per-declared-language accuracy, the audit every heuristic gate needs
  * before its output feeds filtering decisions.
  */
object R8fQueries {

  private val q297 = QueryDef(
    "q297_lang_confusion",
    (s, d) => {
      val toks = TextFunctions.tokens(col("text"))
      val base = Tables.documents(s, d)
        .filter(col("lang").isNotNull)
        .select(col("doc_id"), col("lang"), toks.as("__t"))
      val scored = TextFunctions.langMarkers.foldLeft(base) {
        case (df, (l, ms)) =>
          df.withColumn(s"c_$l", TextFunctions.langScore(col("__t"), ms))
      }
      val predicted =
        when(col("c_en") === 0 && col("c_de") === 0 &&
          col("c_fr") === 0 && col("c_es") === 0, "unknown")
          .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") &&
            col("c_en") >= col("c_es"), "en")
          .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es"),
            "de")
          .when(col("c_fr") >= col("c_es"), "fr")
          .otherwise("es")
      val cells = scored.withColumn("predicted", predicted)
        .groupBy(col("lang").as("declared"), col("predicted"))
        .agg(count(lit(1)).as("n"))
      val tot = org.apache.spark.sql.expressions.Window
        .partitionBy(col("declared"))
      cells
        .withColumn("declared_total", sum(col("n")).over(tot))
        .withColumn("row_share",
          col("n").cast("double") / col("declared_total").cast("double"))
        .withColumn("is_match", col("declared") === col("predicted"))
    },
    Some {
      val scoreSql = TextFunctions.langMarkers.map { case (l, ms) =>
        val lst = ms.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(w, x -> x IN ($lst))) AS INT) AS c_$l"
      }.mkString(",\n             ")
      s"""
      WITH t AS (SELECT doc_id, lang, ${ExtQueries.oToks("text")} AS w
            FROM documents WHERE lang IS NOT NULL),
      sc AS (SELECT doc_id, lang,
             $scoreSql
      FROM t),
      pr AS (SELECT lang AS declared,
             CASE WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0
                    THEN 'unknown'
                  WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es
                    THEN 'en'
                  WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                  WHEN c_fr >= c_es THEN 'fr'
                  ELSE 'es' END AS predicted
      FROM sc),
      cells AS (SELECT declared, predicted,
                  CAST(count(*) AS BIGINT) AS n
                FROM pr GROUP BY 1, 2)
      SELECT declared, predicted, n,
             CAST(sum(n) OVER (PARTITION BY declared) AS BIGINT)
               AS declared_total,
             CAST(n AS DOUBLE)
               / CAST(sum(n) OVER (PARTITION BY declared) AS DOUBLE)
               AS row_share,
             declared = predicted AS is_match
      FROM cells"""
    })

  val all: Seq[QueryDef] = Seq(q297)
}
