package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef

/** Round-12 wave: the reference's literal RANK top-N shape on the custom
  * operator, and SQL-surface row-level operations on the DSv2 tier.
  */
object R12Queries {

  /** W4's ACTUAL window (`SQLproject1.sql:689-699` uses RANK with ties
    * kept, not row_number) through [[graft.plans.WindowTopKRewrite]] in
    * rank mode: the ties-kept bounded-heap operator replaces
    * `Exchange → Sort → Window → Filter`. Unlike the row_number form
    * (q323), the retained SET here is fully deterministic without any
    * tiebreaker — `RANK() <= k` keeps exactly the rows ≤ the k-th
    * smallest order value — so the oracle needs no total order and hash
    * parity proves the tie semantics themselves. The plan is `require`d
    * to contain the ties-kept operator on every Verify/Bench run. */
  private val q334 = QueryDef(
    "q334_rank_topk_ties",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.operators.TopK.ensureRegistered(s)
      s.conf.set(graft.plans.WindowTopKRewrite.RewriteConf, "true")
      try {
        val df = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rk", rank().over(
            Window.partitionBy("source").orderBy(col("n_chars"))))
          .filter(col("rk") <= 3).drop("rk")
        val plan = df.queryExecution.executedPlan.toString
        require(plan.contains("GroupedTopKFinalWithTies"),
          "rank window shape must plan to the ties-kept heap operator, " +
            s"got:\n$plan")
        df.localCheckpoint() // materialize while the rewrite conf is on
      } finally s.conf.unset(graft.plans.WindowTopKRewrite.RewriteConf)
    },
    Some("""
      WITH ranked AS (
        SELECT source, doc_id, n_chars,
               rank() OVER (PARTITION BY source
                 ORDER BY n_chars) AS rk
        FROM documents)
      SELECT source, doc_id, n_chars FROM ranked WHERE rk <= 3"""))

  val all: Seq[QueryDef] = Seq(q334)
}
