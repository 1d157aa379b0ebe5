package graft

import org.apache.spark.sql.functions._

import graft.Queries.QueryDef
import graft.operators.Baskets

/** Round-5 wave 7: association rules over user-day behavior baskets and
  * a deterministic hash-split A/B experiment report.
  */
object R5gQueries {

  /** Directed association rules over (user, day) baskets of event types:
    * support / confidence / lift from exact integer counts. */
  private val q158 = QueryDef(
    "q158_association_rules",
    (s, d) => Baskets.associationRules(
      Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(concat_ws("|", col("user_id"),
          date_format(to_date(col("ts")), "yyyy-MM-dd")).as("basket"),
          col("event_type")),
      "basket", "event_type", maxItemsPerGroup = 10, minPairGroups = 1L),
    Some("""
      WITH it AS (SELECT DISTINCT
              CAST(user_id AS VARCHAR) || '|' ||
                strftime(CAST(ts AS DATE), '%Y-%m-%d') AS g,
              event_type AS item
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL),
      sized AS (SELECT g, item FROM (
                  SELECT g, item, count(*) OVER (PARTITION BY g) AS n
                  FROM it)
                WHERE n <= 10),
      tot AS (SELECT count(DISTINCT g) AS n_baskets FROM sized),
      ic AS (SELECT item, count(*) AS ni FROM sized GROUP BY 1),
      p AS (SELECT a.item AS ia, b.item AS ib, count(*) AS n_both
            FROM sized a JOIN sized b ON a.g = b.g AND a.item < b.item
            GROUP BY 1, 2),
      dir AS (SELECT ia AS antecedent, ib AS consequent, n_both FROM p
              UNION ALL
              SELECT ib, ia, n_both FROM p)
      SELECT antecedent, consequent, CAST(n_both AS BIGINT) AS n_both,
             CAST(ia.ni AS BIGINT) AS n_antecedent,
             CAST(ic2.ni AS BIGINT) AS n_consequent,
             CAST(n_baskets AS BIGINT) AS n_baskets,
             CAST(n_both AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
             CAST(n_both AS DOUBLE) / CAST(ia.ni AS DOUBLE) AS confidence,
             CAST(n_both * n_baskets AS DOUBLE) /
               CAST(ia.ni * ic2.ni AS DOUBLE) AS lift
      FROM dir
      JOIN ic ia ON dir.antecedent = ia.item
      JOIN ic ic2 ON dir.consequent = ic2.item
      CROSS JOIN tot"""))

  /** Hash-split A/B report: users assigned to variants by md5 bucket
    * (the q58 split machinery), measured on purchase conversion. The
    * deterministic assignment is what makes an experiment REPLAYABLE —
    * any engine recomputes the same variants. */
  private val q159 = QueryDef(
    "q159_ab_report",
    (s, d) => {
      val bucket = conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      val users = Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("__conv"))
        .withColumn("variant", when(bucket < 50, "A").otherwise("B"))
      users.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("__conv").cast("long")).as("n_converted"))
        .withColumn("conversion_rate",
          col("n_converted").cast("double") / col("n_users").cast("double"))
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
      WITH u AS (SELECT user_id,
              max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS conv
            FROM events WHERE user_id IS NOT NULL GROUP BY 1),
      v AS (SELECT *, CASE WHEN $bucket < 50 THEN 'A' ELSE 'B' END
              AS variant FROM u)
      SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(conv) AS BIGINT) AS n_converted,
             CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS conversion_rate
      FROM v GROUP BY 1"""
    })

  val all: Seq[QueryDef] = Seq(q158, q159)
}
