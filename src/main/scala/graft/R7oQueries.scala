package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.{Allocation, Bitemporal}

/** Round-7 wave 15: bitemporal truth and exact proration.
  *
  * q270 answers "what did the warehouse believe on date T about the
  * state at date V" over an append-only version table with both valid
  * and system time — the two-axis question q25's SCD2 cannot express
  * (late-arriving facts give every version a recording lag). q271
  * prorates each order's total across its line items with largest-
  * remainder cent allocation — per-order sums reconcile exactly, the
  * invariant float proration cannot give.
  */
object R7oQueries {

  private val ValidAt = "1998-01-01"
  private val KnownAt = "1998-01-05"

  private val q270 = QueryDef(
    "q270_bitemporal_asof",
    (s, d) => {
      val changes = Tables.orders(s, d)
        .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        .withColumn("recorded", expr(
          "timestampadd(DAY, CAST(o_orderkey % 10 AS INT), o_orderdate)"))
      val versions = Bitemporal.versionTable(changes, "o_custkey",
        col("o_orderdate"), col("recorded"), col("o_orderkey"),
        payload = Seq("o_orderkey", "cents"))
      Bitemporal.asOf(versions, "o_custkey",
        lit(ValidAt).cast("timestamp_ntz"), lit(KnownAt).cast("timestamp_ntz"))
        .select(col("o_custkey"), col("version"), col("o_orderkey"),
          col("cents"),
          date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd").as("valid_to"),
          date_format(col("sys_from"), "yyyy-MM-dd").as("sys_from"))
    },
    Some(s"""
      WITH ch AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents,
               o_orderdate + (o_orderkey % 10) * INTERVAL 1 DAY
                 AS recorded
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
      v AS (
        SELECT o_custkey, o_orderkey, cents,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               recorded AS sys_from,
               CAST(row_number() OVER w AS INT) AS version
        FROM ch
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)),
      known AS (
        SELECT *, min(CASE WHEN valid_from > TIMESTAMP '$ValidAt'
                 THEN valid_from END)
                 OVER (PARTITION BY o_custkey) AS belief_to
        FROM v WHERE sys_from <= TIMESTAMP '$KnownAt'),
      q AS (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY valid_from DESC, version DESC) AS rn
        FROM known
        WHERE valid_from <= TIMESTAMP '$ValidAt')
      SELECT o_custkey, version, o_orderkey, cents,
             strftime(valid_from, '%Y-%m-%d') AS valid_from,
             strftime(belief_to, '%Y-%m-%d') AS valid_to,
             strftime(sys_from, '%Y-%m-%d') AS sys_from
      FROM q WHERE rn = 1"""))

  private val q271 = QueryDef(
    "q271_penny_allocation",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 20 === 0)
        .groupBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("w_cents"))
      val withTarget = li.join(
        Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("target_cents")),
        Seq("l_orderkey"))
      Allocation.pennyAllocate(withTarget, Seq("l_orderkey"),
        col("target_cents"), col("w_cents"),
        Seq(col("l_linenumber"), col("l_partkey")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("w_cents"), col("alloc"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey, l_linenumber, l_partkey,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS w_cents
        FROM lineitem WHERE l_orderkey % 20 = 0
        GROUP BY 1, 2, 3),
      j AS (
        SELECT li.*, CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                 AS BIGINT) AS t
        FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey),
      w AS (
        SELECT *, CAST(sum(w_cents) OVER (PARTITION BY l_orderkey)
                 AS BIGINT) AS tw
        FROM j),
      f AS (
        SELECT *, (t * w_cents) // tw AS fl, (t * w_cents) % tw AS rem
        FROM w WHERE tw > 0),
      r AS (
        SELECT *,
               CAST(t - sum(fl) OVER (PARTITION BY l_orderkey) AS BIGINT)
                 AS leftover,
               row_number() OVER (PARTITION BY l_orderkey
                 ORDER BY rem DESC, l_linenumber, l_partkey) AS rk
        FROM f)
      SELECT l_orderkey, l_linenumber, l_partkey, w_cents,
             CAST(fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
               AS BIGINT) AS alloc
      FROM r"""))

  val all: Seq[QueryDef] = Seq(q270, q271)
}
