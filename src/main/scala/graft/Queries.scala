package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashing
import graft.operators._

/** Registry of every operator query (SURVEY.md §2) with its DuckDB oracle.
  *
  * Numeric-compare discipline: the driver hash-compares our parquet output
  * against DuckDB's result, so every aggregated double goes through an EXACT
  * decimal intermediate and is emitted as a double derived from that decimal
  * (`CAST(decimal AS DOUBLE)` is correctly rounded in both engines, so the
  * bits match). Raw doubles pass through untouched. Dates/timestamps are
  * emitted as ISO strings to dodge dtype-mapping ambiguity between readers.
  */
object Queries {

  final case class QueryDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private val D2 = DecimalType(18, 2)
  private val D4 = DecimalType(9, 4)

  /** Exact 2-dec decimal view of a raw double measure. */
  private def money(c: Column): Column = c.cast(D2)
  /** Final emit: exact decimal -> double (bit-identical across engines).
    * NEVER down-cast a decimal's scale first: Spark rounds HALF_UP, DuckDB
    * half-to-even, so exact .5 boundaries would diverge. Decimal→double is
    * correctly rounded in both engines. */
  private def asDouble(c: Column): Column = c.cast("double")
  private def emit2(c: Column): Column = c.cast("double")
  private def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Oracle building blocks (DuckDB SQL mirroring the helpers above). */
  private def oMoney(x: String) = s"CAST($x AS DECIMAL(18,2))"
  private def oSum2(x: String) = s"CAST(SUM(${oMoney(x)}) AS DOUBLE)"

  // ---------------------------------------------------------------- queries

  /** A4/A3: grouped SUM/COUNT aggregation with exact decimal money math
    * (reference: profit-by-subcategory view, SQLproject1.sql:680-687). */
  private val q01 = QueryDef(
    "q01_pricing_agg",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          emit2(sum(money(col("l_quantity")))).as("sum_qty"),
          emit2(sum(money(col("l_extendedprice")))).as("sum_base_price"),
          emit2(sum(money(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast(D4)))).as("sum_disc_price"),
          count(lit(1)).as("count_lines"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${oSum2("l_quantity")} AS sum_qty,
             ${oSum2("l_extendedprice")} AS sum_base_price,
             CAST(SUM(${oMoney("l_extendedprice")} *
               (1 - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE)
               AS sum_disc_price,
             COUNT(*) AS count_lines
      FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  /** A1: DISTINCT projection (dim seeding, SQLproject1.sql:391-425). */
  private val q02 = QueryDef(
    "q02_distinct_dim",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus")).distinct(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"))

  /** A2: GROUP BY + MAX attribute snapshot (one row per natural key,
    * reference customer/product snapshots SQLproject1.sql:454-463). */
  private val q03 = QueryDef(
    "q03_snapshot_max",
    (s, d) => Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(max(col("c_name")).as("max_name"),
           max(col("c_mktsegment")).as("max_segment"),
           emit2(max(money(col("c_acctbal")))).as("max_acctbal"),
           count(lit(1)).as("n_customers")),
    Some(s"""
      SELECT c_nationkey, MAX(c_name) AS max_name,
             MAX(c_mktsegment) AS max_segment,
             CAST(MAX(${oMoney("c_acctbal")}) AS DOUBLE) AS max_acctbal,
             COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey"""))

  /** P4/U2: data-quality rule counts, all rules in one scan
    * (qa.LoadIssues, SQLproject1.sql:213-240). */
  private val q04 = QueryDef(
    "q04_dq_counts",
    (s, d) => Quality.check(Tables.lineitem(s, d), Seq(
      Quality.Rule("HIGH_DISCOUNT", "l_discount > 0.05", col("l_discount") > 0.05),
      Quality.Rule("ZERO_TAX", "l_tax = 0", col("l_tax") === 0),
      Quality.Rule("RETURNED", "l_returnflag = R", col("l_returnflag") === "R"))),
    Some("""
      SELECT 'HIGH_DISCOUNT' AS issue_type, 'l_discount > 0.05' AS issue_detail,
             COUNT(*) FILTER (WHERE l_discount > 0.05) AS row_count FROM lineitem
      UNION ALL
      SELECT 'ZERO_TAX', 'l_tax = 0',
             COUNT(*) FILTER (WHERE l_tax = 0) FROM lineitem
      UNION ALL
      SELECT 'RETURNED', 'l_returnflag = R',
             COUNT(*) FILTER (WHERE l_returnflag = 'R') FROM lineitem"""))

  /** J1: star join fact->dims with broadcast of the small sides
    * (fact.Sales -> dim lookups, SQLproject1.sql:586-615). */
  private val q05 = QueryDef(
    "q05_star_join",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(emit2(sum(money(col("o_totalprice")))).as("revenue"),
             count(lit(1)).as("n_orders"))
    },
    Some(s"""
      SELECT r_name, n_name, ${oSum2("o_totalprice")} AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""))

  /** J2+X3: case-insensitive multi-column join collapsed to a single MD5
    * hash-key equi-join (geography lookup, SQLproject1.sql:323-325,441-445).
    * At scale this turns a 5-column shuffle key into one 32-byte key. */
  private val q06 = QueryDef(
    "q06_hashkey_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val hk = Hashing.hashKey(Seq(col("c_mktsegment"), col("c_nationkey")))
      val dim = c.select(upper(col("c_mktsegment")).as("segment"),
                         col("c_nationkey").as("nationkey"))
        .distinct()
        .withColumn("hash_key",
          Hashing.hashKey(Seq(col("segment"), col("nationkey"))))
      val fact = Tables.orders(s, d)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .withColumn("hash_key", hk)
      fact.join(broadcast(dim), Seq("hash_key"))
        .groupBy(col("hash_key"), col("segment"), col("nationkey"))
        .agg(count(lit(1)).as("n_orders"),
             emit2(sum(money(col("o_totalprice")))).as("revenue"))
    },
    Some(s"""
      WITH dim AS (
        SELECT DISTINCT upper(c_mktsegment) AS segment, c_nationkey AS nationkey
        FROM customer),
      dimh AS (
        SELECT segment, nationkey,
               md5(concat_ws('|', upper(segment), upper(CAST(nationkey AS VARCHAR)))) AS hash_key
        FROM dim),
      fact AS (
        SELECT o_orderkey, o_totalprice,
               md5(concat_ws('|', upper(c_mktsegment), upper(CAST(c_nationkey AS VARCHAR)))) AS hash_key
        FROM orders JOIN customer ON o_custkey = c_custkey)
      SELECT f.hash_key, d.segment, d.nationkey,
             COUNT(*) AS n_orders, ${oSum2("f.o_totalprice")} AS revenue
      FROM fact f JOIN dimh d ON f.hash_key = d.hash_key
      GROUP BY f.hash_key, d.segment, d.nationkey"""))

  /** J3/T1: latest row per key (CROSS APPLY TOP(1) ... ORDER BY DESC,
    * SQLproject1.sql:589-602) as a row_number window. */
  private val q07 = QueryDef(
    "q07_latest_per_key",
    (s, d) => Windows.latestPerKey(Tables.orders(s, d),
        Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"),
              dstr(col("o_orderdate")).as("last_order_date"),
              asDouble(money(col("o_totalprice"))).as("last_totalprice")),
    Some(s"""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS last_order_date,
             CAST(${oMoney("o_totalprice")} AS DOUBLE) AS last_totalprice
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      WHERE rn = 1"""))

  /** J5: anti join / NOT EXISTS (idempotent-load guard,
    * SQLproject1.sql:612-615). */
  private val q08 = QueryDef(
    "q08_anti_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** J6: semi join / EXISTS (SCD2 changed-row detection shape,
    * SQLproject1.sql:497-509). */
  private val q09 = QueryDef(
    "q09_semi_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(f, c("c_custkey") === f("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"""))

  /** W1: keep-exactly-one dedup by explicit preference ordering
    * (SQLproject1.sql:198-211). */
  private val q10 = QueryDef(
    "q10_window_dedup",
    (s, d) => Dedup.keepFirst(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_partkey"),
        // the synthetic data has (orderkey,partkey,linenumber) collisions —
        // extend the preference ordering until it is total, or the survivor
        // is engine-dependent
        Seq(col("l_linenumber").desc, col("l_suppkey").desc,
            col("l_quantity").desc, col("l_extendedprice").desc))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
              col("l_quantity")),
    Some("""
      SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
              ORDER BY l_linenumber DESC, l_suppkey DESC, l_quantity DESC,
                       l_extendedprice DESC) AS rn FROM lineitem)
      WHERE rn = 1"""))

  /** W2: stable line numbering within a group (SQLproject1.sql:564-568). */
  private val q11 = QueryDef(
    "q11_line_number",
    (s, d) => Windows.lineNumber(Tables.orders(s, d),
        Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")),
        "order_seq")
      .select(col("o_custkey"), col("o_orderkey"), col("order_seq")),
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq
      FROM orders"""))

  /** W3: ROWS-framed rolling 30-row sum over a pre-aggregated daily grain
    * (qa.v_Rolling30, SQLproject1.sql:628-638). Pre-aggregating bounds the
    * per-partition sort at scale (nation x day, not nation x order). */
  private val q12 = QueryDef(
    "q12_rolling30",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val daily = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("o_orderdate").cast("date").as("order_date"))
        .agg(sum(money(col("o_totalprice"))).as("daily_rev"))
      Windows.rollingSum(daily, Seq(col("n_name")), Seq(col("order_date")),
          col("daily_rev"), 30, "rev_30d")
        .select(col("n_name"), dstr(col("order_date")).as("order_date"),
                emit2(col("daily_rev")).as("daily_rev"),
                emit2(col("rev_30d")).as("rev_30d"))
    },
    Some(s"""
      WITH daily AS (
        SELECT n_name, CAST(o_orderdate AS DATE) AS order_date,
               SUM(${oMoney("o_totalprice")}) AS daily_rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, CAST(o_orderdate AS DATE))
      SELECT n_name, strftime(order_date, '%Y-%m-%d') AS order_date,
             CAST(CAST(daily_rev AS DECIMAL(18,2)) AS DOUBLE) AS daily_rev,
             CAST(CAST(SUM(daily_rev) OVER (PARTITION BY n_name ORDER BY order_date
               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE)
               AS rev_30d
      FROM daily"""))

  /** W4/T2: top-N per group via RANK — ties kept
    * (qa.v_TopProductsBySubCat, SQLproject1.sql:689-699). */
  private val q13 = QueryDef(
    "q13_rank_topn",
    (s, d) => Windows.topNPerGroup(Tables.part(s, d),
        Seq(col("p_brand")), col("p_retailprice"), 5)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
              col("rnk").cast("int").as("rnk")),
    Some("""
      SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS INT) AS rnk
      FROM (SELECT *, RANK() OVER (PARTITION BY p_brand
              ORDER BY p_retailprice DESC) AS rnk FROM part)
      WHERE rnk <= 5"""))

  /** W5: share-of-total over a whole partition with NULLIF(total,0) guard
    * (ProfitShare, SQLproject1.sql:693-694). */
  private val q14 = QueryDef(
    "q14_share_of_total",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val rev = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(money(col("o_totalprice"))).cast(D2).as("rev"))
      rev.select(col("r_name"), col("n_name"),
          asDouble(col("rev")).as("revenue"),
          (asDouble(col("rev")) /
            nullif(asDouble(sum(col("rev")).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
            ).cast(D2)), lit(0.0))).as("region_share"))
    },
    Some(s"""
      WITH rev AS (
        SELECT r_name, n_name,
               CAST(SUM(${oMoney("o_totalprice")}) AS DECIMAL(18,2)) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name)
      SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
             CAST(rev AS DOUBLE) /
               NULLIF(CAST(CAST(SUM(rev) OVER (PARTITION BY r_name) AS DECIMAL(18,2)) AS DOUBLE), 0.0)
               AS region_share
      FROM rev"""))

  /** A7/A8: pivot-style subtotal lattice as ROLLUP over the date hierarchy
    * (PivotTable8, Superstore_Dashboard.xlsx!xl/pivotTables/pivotTable2.xml).
    * grouping_id disambiguates subtotal rows from genuine NULL keys. */
  private val q15 = QueryDef(
    "q15_rollup",
    (s, d) => Tables.orders(s, d)
      .rollup(year(col("o_orderdate")).as("o_year"),
              month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           emit2(sum(money(col("o_totalprice")))).as("revenue"),
           grouping_id().cast("int").as("gid")),
    Some(s"""
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(month(o_orderdate) AS INT) AS o_month,
             COUNT(*) AS n_orders, ${oSum2("o_totalprice")} AS revenue,
             CAST(GROUPING(year(o_orderdate), month(o_orderdate)) AS INT) AS gid
      FROM orders
      GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate))"""))

  /** X1: calendar date spine from data-driven bounds via sequence+explode
    * (the recursive-CTE replacement, SQLproject1.sql:262-284). */
  private val q16 = QueryDef(
    "q16_date_spine",
    (s, d) => {
      val spine = DateSpine.fromBounds(Tables.orders(s, d),
        col("o_orderdate").cast("date"), col("o_orderdate").cast("date"))
      spine.select(col("date_key"), dstr(col("date")).as("date_str"),
        col("year"), col("quarter"), col("month"), col("day"),
        col("week_of_year"), col("month_name"), col("quarter_name"),
        col("is_weekend"))
    },
    Some("""
      WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                        max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
      days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM b)
      SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
             strftime(d, '%Y-%m-%d') AS date_str,
             CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter,
             CAST(month(d) AS INT) AS month, CAST(day(d) AS INT) AS day,
             CAST(weekofyear(d) AS INT) AS week_of_year,
             monthname(d) AS month_name,
             'Q' || CAST(quarter(d) AS VARCHAR) AS quarter_name,
             dayname(d) IN ('Saturday', 'Sunday') AS is_weekend
      FROM days"""))

  /** U1/U2: set operations — EXCEPT (distinct) between two key sets. */
  private val q17 = QueryDef(
    "q17_set_ops",
    (s, d) => {
      val o = Tables.orders(s, d)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val p = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      f.except(p)
    },
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"""))

  /** P6/P7: CASE WHEN buckets + zero-pad normalization + NULL-safe chains
    * (postal-code repair, SQLproject1.sql:430-435). */
  private val q18 = QueryDef(
    "q18_case_pad",
    (s, d) => Tables.customer(s, d).select(
      col("c_custkey"),
      lpad(col("c_custkey").cast("string"), 9, "0").as("custkey_padded"),
      when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high").as("balance_bucket"),
      coalesce(nullif(trim(col("c_name")), lit("")), lit("UNKNOWN")).as("name_clean"),
      Cleaning.zeroPadNumeric(col("c_custkey").cast("string"), 12).as("custkey_pad12")),
    Some("""
      SELECT c_custkey,
             lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS custkey_padded,
             CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS balance_bucket,
             COALESCE(NULLIF(trim(c_name), ''), 'UNKNOWN') AS name_clean,
             CASE WHEN TRY_CAST(CAST(c_custkey AS VARCHAR) AS INT) IS NOT NULL
                  THEN lpad(CAST(TRY_CAST(CAST(c_custkey AS VARCHAR) AS INT) AS VARCHAR), 12, '0')
                  ELSE CAST(c_custkey AS VARCHAR) END AS custkey_pad12
      FROM customer"""))

  /** X3: MD5 hash-key + SHA2-256 hash-diff canonicalization
    * (SQLproject1.sql:323-325, 465-472). */
  private val q19 = QueryDef(
    "q19_hash_functions",
    (s, d) => Tables.customer(s, d).select(
      col("c_custkey"),
      Hashing.hashKey(Seq(col("c_name"), col("c_mktsegment"), col("c_nationkey")))
        .as("hash_key"),
      Hashing.hashDiff(Seq(col("c_name"), col("c_mktsegment"), col("c_nationkey")))
        .as("hash_diff")),
    Some("""
      SELECT c_custkey,
             md5(concat_ws('|', upper(coalesce(c_name, '')),
                                upper(coalesce(c_mktsegment, '')),
                                upper(coalesce(CAST(c_nationkey AS VARCHAR), ''))))
               AS hash_key,
             sha256(concat_ws('|', upper(coalesce(c_name, '')),
                                   upper(coalesce(c_mktsegment, '')),
                                   upper(coalesce(CAST(c_nationkey AS VARCHAR), ''))))
               AS hash_diff
      FROM customer"""))

  /** P1/P3/P10: trim/clean/regexp-extract/try_cast over semi-structured
    * event props (staging normalization, SQLproject1.sql:172-191). */
  private val q20 = QueryDef(
    "q20_clean_strings",
    (s, d) => Tables.events(s, d).select(
      col("event_id"),
      upper(trim(col("event_type"))).as("etype"),
      Cleaning.cleanControlChars(col("props")).as("props_clean"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).try_cast(IntegerType).as("k"),
      when(col("value") < 50, "low").when(col("value") < 150, "mid")
        .otherwise("high").as("value_bucket")),
    Some("""
      SELECT event_id, upper(trim(event_type)) AS etype,
             regexp_replace(props, '[[:cntrl:]]', '', 'g') AS props_clean,
             TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k,
             CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid'
                  ELSE 'high' END AS value_bucket
      FROM events"""))

  /** X4/§2.9: the scalar date-function surface (year/quarter/month/day,
    * month name, EOMONTH/last_day, DATEADD, DATEDIFF-month boundary). */
  private val q21 = QueryDef(
    "q21_date_functions",
    (s, d) => {
      val od = col("o_orderdate").cast("date")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(od).as("y"), quarter(od).as("q"), month(od).as("m"),
        dayofmonth(od).as("dom"),
        date_format(od, "MMMM").as("month_name"),
        dstr(last_day(od)).as("eomonth"),
        dstr(date_add(od, 30)).as("plus30"),
        date_format(od, "yyyyMMdd").cast("int").as("date_key"),
        ((lit(2002) * 12 + lit(1)) - (year(od) * 12 + month(od)))
          .cast("int").as("months_to_2002"))
    },
    Some("""
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS y,
             CAST(quarter(o_orderdate) AS INT) AS q,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(day(o_orderdate) AS INT) AS dom,
             monthname(o_orderdate) AS month_name,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eomonth,
             strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
             CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
             CAST((2002*12 + 1) - (year(o_orderdate)*12 + month(o_orderdate)) AS INT)
               AS months_to_2002
      FROM orders"""))

  /** A5/A6 + EOMONTH/DATEDIFF: customer cohort analysis
    * (qa.v_CustomerCohort, SQLproject1.sql:645-673). */
  private val q22 = QueryDef(
    "q22_cohort",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
      val first = o.groupBy(col("o_custkey"))
        .agg(min(col("od")).as("first_od"))
      val perMonth = o.groupBy(col("o_custkey"), last_day(col("od")).as("order_month"))
        .agg(count(lit(1)).as("orders_count"))
      perMonth.join(first, "o_custkey")
        .select(col("o_custkey"),
          dstr(last_day(col("first_od"))).as("cohort_month"),
          dstr(col("order_month")).as("order_month"),
          ((year(col("order_month")) * 12 + month(col("order_month"))) -
           (year(col("first_od")) * 12 + month(col("first_od"))))
            .cast("int").as("months_since"),
          col("orders_count"))
    },
    Some("""
      WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
      first AS (SELECT o_custkey, min(od) AS first_od FROM o GROUP BY o_custkey),
      per_month AS (SELECT o_custkey, last_day(od) AS order_month,
                           COUNT(*) AS orders_count
                    FROM o GROUP BY o_custkey, last_day(od))
      SELECT p.o_custkey,
             strftime(last_day(f.first_od), '%Y-%m-%d') AS cohort_month,
             strftime(p.order_month, '%Y-%m-%d') AS order_month,
             CAST((year(p.order_month)*12 + month(p.order_month)) -
                  (year(f.first_od)*12 + month(f.first_od)) AS INT) AS months_since,
             p.orders_count
      FROM per_month p JOIN first f ON p.o_custkey = f.o_custkey"""))

  /** Domain-anomaly filter with NULLIF-guarded division
    * (qa.v_SuspiciousDiscounts, SQLproject1.sql:703-716). */
  private val q23 = QueryDef(
    "q23_suspicious_ratio",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_discount") > 0)
      .withColumn("tax_ratio", col("l_tax") / nullif(col("l_discount"), lit(0.0)))
      .filter(!col("tax_ratio").between(0.05, 2.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
              col("l_discount"), col("l_tax"), col("tax_ratio")),
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax,
             l_tax / NULLIF(l_discount, 0.0) AS tax_ratio
      FROM lineitem
      WHERE l_discount > 0
        AND NOT (l_tax / NULLIF(l_discount, 0.0) BETWEEN 0.05 AND 2.0)"""))

  /** J7: insert-only dimension merge preserving surrogate keys
    * (MERGE WHEN NOT MATCHED INSERT, SQLproject1.sql:390-416). */
  private val q24 = QueryDef(
    "q24_merge_insert_only",
    (s, d) => {
      val c = Tables.customer(s, d)
      val existing = Dims.buildDim(
        c.filter(col("c_custkey") <= 750).select(col("c_mktsegment").as("segment")),
        Seq("segment"), "segment_key")
      val incoming = c.select(col("c_mktsegment").as("segment"))
      Dims.insertOnlyMerge(existing, incoming, Seq("segment"), "segment_key")
    },
    Some("""
      WITH existing AS (
        SELECT segment, CAST(ROW_NUMBER() OVER (ORDER BY segment) AS BIGINT) AS segment_key
        FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer WHERE c_custkey <= 750)),
      incoming AS (SELECT DISTINCT c_mktsegment AS segment FROM customer),
      mx AS (SELECT COALESCE(MAX(segment_key), 0) AS m FROM existing),
      added AS (
        SELECT i.segment,
               CAST(m + ROW_NUMBER() OVER (ORDER BY i.segment) AS BIGINT) AS segment_key
        FROM incoming i, mx
        WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.segment = i.segment))
      SELECT segment, segment_key FROM existing
      UNION ALL
      SELECT segment, segment_key FROM added"""))

  /** J8/X3: SCD Type 2 merge — initial load of a partial snapshot, then a
    * merge of a drifted snapshot (SQLproject1.sql:449-560). Classifies rows
    * into kept / closed / new-version / brand-new via hash-diff compare. */
  private val q25 = QueryDef(
    "q25_scd2_merge",
    (s, d) => {
      val c = Tables.customer(s, d)
      val snap1 = c.filter(col("c_custkey") % 7 =!= 0).select(
        col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"), money(col("c_acctbal")).as("acctbal"))
      val snap2 = c.select(
        col("c_custkey").as("custkey"), col("c_name").as("name"),
        when(col("c_custkey") % 5 === 0, "MOVED").otherwise(col("c_mktsegment"))
          .as("segment"),
        money(col("c_acctbal")).as("acctbal"))
      val tracked = Seq("name", "segment", "acctbal")
      val dim0 = Scd2.initialLoad(snap1, tracked)
      val dim1 = Scd2.merge(dim0, snap2, Seq("custkey"), tracked, "2024-06-01")
      dim1.select(col("custkey"), col("name"), col("segment"),
        asDouble(col("acctbal")).as("acctbal"), col("hash_diff"),
        dstr(col("effective_from")).as("effective_from"),
        dstr(col("effective_to")).as("effective_to"), col("is_current"))
    },
    Some("""
      WITH snap1 AS (
        SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment,
               CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        FROM customer WHERE c_custkey % 7 <> 0),
      snap2 AS (
        SELECT c_custkey AS custkey, c_name AS name,
               CASE WHEN c_custkey % 5 = 0 THEN 'MOVED' ELSE c_mktsegment END AS segment,
               CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
        FROM customer),
      h1 AS (SELECT *, sha256(concat_ws('|', upper(coalesce(name,'')),
                 upper(coalesce(segment,'')),
                 upper(coalesce(CAST(acctbal AS VARCHAR),'')))) AS hash_diff FROM snap1),
      h2 AS (SELECT *, sha256(concat_ws('|', upper(coalesce(name,'')),
                 upper(coalesce(segment,'')),
                 upper(coalesce(CAST(acctbal AS VARCHAR),'')))) AS hash_diff FROM snap2),
      d0 AS (SELECT custkey, name, segment, acctbal, hash_diff,
                    DATE '1900-01-01' AS ef, DATE '9999-12-31' AS et, TRUE AS cur
             FROM h1),
      changed AS (SELECT d0.custkey FROM d0
                  JOIN h2 ON d0.custkey = h2.custkey AND d0.hash_diff <> h2.hash_diff),
      kept AS (SELECT * FROM d0
               WHERE custkey NOT IN (SELECT custkey FROM changed)),
      closed AS (SELECT custkey, name, segment, acctbal, hash_diff,
                        ef, DATE '2024-06-01' AS et, FALSE AS cur
                 FROM d0 WHERE custkey IN (SELECT custkey FROM changed)),
      newv AS (SELECT custkey, name, segment, acctbal, hash_diff,
                      DATE '2024-06-01' AS ef, DATE '9999-12-31' AS et, TRUE AS cur
               FROM h2 WHERE custkey IN (SELECT custkey FROM changed)),
      brand AS (SELECT custkey, name, segment, acctbal, hash_diff,
                       DATE '1900-01-01' AS ef, DATE '9999-12-31' AS et, TRUE AS cur
                FROM h2 WHERE custkey NOT IN (SELECT custkey FROM d0))
      SELECT custkey, name, segment, CAST(acctbal AS DOUBLE) AS acctbal, hash_diff,
             strftime(ef, '%Y-%m-%d') AS effective_from,
             strftime(et, '%Y-%m-%d') AS effective_to,
             cur AS is_current
      FROM (SELECT * FROM kept UNION ALL SELECT * FROM closed
            UNION ALL SELECT * FROM newv UNION ALL SELECT * FROM brand)"""))

  // ------------------------------------------------------------- registry

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
    q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25) ++
    ExtQueries.all ++ MoreQueries.all ++ R2Queries.all ++ R3Queries.all ++
    R4Queries.all ++ R4bQueries.all ++ R4cQueries.all ++ R4dQueries.all ++
    R4eQueries.all ++ R4fQueries.all ++ R4gQueries.all ++ R5Queries.all ++
    R5bQueries.all ++ R5cQueries.all ++ R5dQueries.all ++ R5eQueries.all ++
    R5fQueries.all ++ R5gQueries.all ++ R5hQueries.all ++ R5iQueries.all ++
    R5jQueries.all ++ R5kQueries.all ++ R5lQueries.all ++ R6Queries.all ++
    R6bQueries.all ++ R6cQueries.all ++ R6dQueries.all ++ R6eQueries.all ++
    R6fQueries.all ++ R6gQueries.all ++ R6hQueries.all ++ R6iQueries.all ++
    R6jQueries.all ++ R6kQueries.all ++ R6lQueries.all ++ R6mQueries.all ++
    R6nQueries.all ++ R6oQueries.all ++ R6pQueries.all ++ R6qQueries.all ++
    R6rQueries.all ++ R6sQueries.all ++ R7Queries.all ++ R7bQueries.all ++ R7cQueries.all ++ R7dQueries.all ++ R7eQueries.all ++ R7fQueries.all ++ R7gQueries.all ++ R7hQueries.all ++ R7iQueries.all ++ R7jQueries.all ++ R7kQueries.all ++ R7lQueries.all ++ R7mQueries.all ++ R7nQueries.all ++ R7oQueries.all ++ R7pQueries.all ++ R7qQueries.all ++ R7rQueries.all ++ R7sQueries.all ++ R7tQueries.all ++ R7uQueries.all ++ R7vQueries.all ++ R7wQueries.all ++ R7xQueries.all ++ R7yQueries.all ++ R7zQueries.all ++ R8Queries.all ++ R8bQueries.all ++ R8cQueries.all ++ R8dQueries.all ++ R8eQueries.all ++ R8fQueries.all ++ R8gQueries.all ++ R8hQueries.all ++ R8iQueries.all ++ R9Queries.all ++ R9bQueries.all ++ R10Queries.all ++ R11Queries.all ++ R12Queries.all ++ R13Queries.all ++ R14Queries.all ++ R15Queries.all ++ R16Queries.all ++ R17Queries.all ++ R18Queries.all ++ R19Queries.all

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
