package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Stats

/** Round-7 wave 23: sequential testing done honestly.
  *
  * q285 runs a Wald SPRT over variant-B's daily conversion stream —
  * the always-valid sequential monitor that replaces the fixed-horizon
  * q161/q217 tests when stakeholders peek daily. The `decided` flag
  * marks every day AFTER the first boundary crossing: reading the
  * statistic there is exactly the peeking error. Log constants live on
  * a shared scaled-integer grid interpolated into the oracle as
  * literals, so engine `ln` rounding cannot flip a decision.
  */
object R7wQueries {

  private val P0 = 0.25
  private val P1 = 0.30
  private val AlphaPct = 5

  private val q285 = QueryDef(
    "q285_sprt_monitor",
    (s, d) => {
      val bucket = conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      // event-grain Bernoulli stream: B-variant users' events per day,
      // success = the event is a purchase (gives a long daily series —
      // user-grain first-seen days collapse to the stream's first days)
      val daily = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull
          && bucket >= 50)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_new"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c_new"))
      Stats.sprtMonitor(daily, "day", col("n_new"), col("c_new"),
        P0, P1, AlphaPct)
        .select(col("day").cast("string").as("day"), col("n"), col("c"),
          col("llr"), col("state"), col("decided"))
    },
    Some {
      val (l1, l2, up, lo) = Stats.sprtConstants(P0, P1, AlphaPct)
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS c_new
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL AND $bucket >= 50
        GROUP BY 1),
      cum AS (
        SELECT day,
               CAST(sum(n_new) OVER w AS BIGINT) AS n,
               CAST(sum(c_new) OVER w AS BIGINT) AS c
        FROM daily
        WINDOW w AS (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      l AS (
        SELECT day, n, c,
               c * CAST($l1 AS BIGINT) + (n - c) * CAST($l2 AS BIGINT)
                 AS llr_s
        FROM cum),
      st AS (
        SELECT day, n, c,
               CAST(llr_s AS DOUBLE) / 1073741824.0 AS llr,
               CASE WHEN llr_s >= $up THEN 'accept_h1'
                    WHEN llr_s <= $lo THEN 'accept_h0'
                    ELSE 'continue' END AS state
        FROM l)
      SELECT strftime(day, '%Y-%m-%d') AS day, n, c, llr, state,
             COALESCE(max(CASE WHEN state <> 'continue' THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) = 1, FALSE) AS decided
      FROM st"""
    })

  val all: Seq[QueryDef] = Seq(q285)
}
