package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.Quality

/** Round-7 wave 18: windowed ranking and distributional effects.
  *
  * q275 reports the trending top-3 brands per day by 7-day rolling
  * revenue — pre-aggregated to (brand, day) grain so the range window
  * never touches raw rows; q276 computes quantile treatment effects
  * for the md5 A/B split: per-decile spend differences, the
  * distributional answer q159's mean-based report flattens away.
  */
object R7rQueries {

  private val q275 = QueryDef(
    "q275_trending_topk",
    (s, d) => {
      val daily = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate").isNotNull)
        .groupBy(col("p_brand"), to_date(col("l_shipdate")).as("day"))
        .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("cents"))
      val w7 = Window.partitionBy(col("p_brand"))
        .orderBy(col("day").cast("timestamp").cast("long"))
        .rangeBetween(-6L * 86400, 0)
      val rolled = daily
        .withColumn("rolling_cents", sum(col("cents")).over(w7))
      val rk = Window.partitionBy(col("day"))
        .orderBy(col("rolling_cents").desc, col("p_brand"))
      rolled
        .withColumn("rank", row_number().over(rk).cast("int"))
        .filter(col("rank") <= 3)
        .select(col("day").cast("string").as("day"), col("p_brand"),
          col("rolling_cents"), col("rank"))
    },
    Some("""
      WITH daily AS (
        SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                 AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate IS NOT NULL
        GROUP BY 1, 2),
      rolled AS (
        SELECT p_brand, day,
               CAST(sum(cents) OVER (PARTITION BY p_brand
                 ORDER BY epoch(CAST(day AS TIMESTAMP))
                 RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS rolling_cents
        FROM daily),
      rk AS (
        SELECT strftime(day, '%Y-%m-%d') AS day, p_brand, rolling_cents,
               CAST(row_number() OVER (PARTITION BY day
                 ORDER BY rolling_cents DESC, p_brand) AS INT) AS rank
        FROM rolled)
      SELECT day, p_brand, rolling_cents, rank FROM rk WHERE rank <= 3"""))

  private val Deciles = Seq(0.25, 0.5, 0.75, 0.9)

  private val q276 = QueryDef(
    "q276_quantile_effects",
    (s, d) => {
      val bucket = conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("int") % 100
      val spend = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
        .withColumn("variant", when(bucket < 50, "A").otherwise("B"))
      val pcts = Quality.exactPercentiles(spend, Seq("variant"), "cents",
        Deciles)
      val a = pcts.filter(col("variant") === "A")
      val b = pcts.filter(col("variant") === "B")
      a.crossJoin(b.select(col("n").as("n_b") +:
          Deciles.map(p => col("p" + math.round(p * 100))
            .as("b_p" + math.round(p * 100))): _*))
        .select(Seq(col("n").as("n_a"), col("n_b")) ++
          Deciles.flatMap { p =>
            val l = "p" + math.round(p * 100)
            Seq(col(l).as(s"a_$l"), col(s"b_$l"),
              (col(s"b_$l") - col(l)).as(s"effect_$l"))
          }: _*)
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket =
        s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      val pSel = Deciles.map { p =>
        val l = "p" + math.round(p * 100)
        s"max(CASE WHEN rn <= CAST(ceil($p * n - 0.000000001) AS BIGINT) THEN cents END) AS $l"
      }.mkString(",\n               ")
      val effects = Deciles.map { p =>
        val l = "p" + math.round(p * 100)
        s"a.$l AS a_$l, b.$l AS b_$l, b.$l - a.$l AS effect_$l"
      }.mkString(",\n             ")
      s"""
      WITH spend AS (
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents,
               CASE WHEN $bucket < 50 THEN 'A' ELSE 'B' END AS variant
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id),
      ranked AS (
        SELECT variant, cents,
               row_number() OVER (PARTITION BY variant ORDER BY cents)
                 AS rn,
               CAST(count(*) OVER (PARTITION BY variant) AS BIGINT) AS n
        FROM spend),
      pcts AS (
        SELECT variant, CAST(max(n) AS BIGINT) AS n,
               $pSel
        FROM ranked GROUP BY variant)
      SELECT a.n AS n_a, b.n AS n_b,
             $effects
      FROM pcts a CROSS JOIN pcts b
      WHERE a.variant = 'A' AND b.variant = 'B'"""
    })

  val all: Seq[QueryDef] = Seq(q275, q276)
}
