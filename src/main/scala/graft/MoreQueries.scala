package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Queries.QueryDef
import graft.operators.AsOf

/** Second wave of operator-coverage queries: pivot/cube/grouping-sets
  * lattices, exact quantiles, the full window-navigation surface, a true
  * 30-day RANGE frame, lateral top-N, as-of join, generators, array and
  * string scalar families, set ops, null-safe joins, ordered-arg
  * aggregates, and the no-oracle approx/xxhash scale demos. */
object MoreQueries {

  private val D2 = DecimalType(18, 2)
  private def money(c: Column): Column = c.cast(D2)
  private def emit2(c: Column): Column = c.cast("double")
  private def dstr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  private def oMoney(x: String) = s"CAST($x AS DECIMAL(18,2))"
  private def oSum2(x: String) = s"CAST(SUM(${oMoney(x)}) AS DOUBLE)"

  /** A7 transpose: the pivot RELATIONAL operator (not just the rollup
    * lattice) — status columns out of status rows. */
  private val q26 = QueryDef(
    "q26_pivot",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(emit2(sum(money(col("o_totalprice"))))),
    Some(s"""
      SELECT o_orderpriority,
             CAST(SUM(${oMoney("o_totalprice")}) FILTER (WHERE o_orderstatus='F') AS DOUBLE) AS F,
             CAST(SUM(${oMoney("o_totalprice")}) FILTER (WHERE o_orderstatus='O') AS DOUBLE) AS O,
             CAST(SUM(${oMoney("o_totalprice")}) FILTER (WHERE o_orderstatus='P') AS DOUBLE) AS P
      FROM orders GROUP BY o_orderpriority"""))

  /** A8 generalization: full CUBE lattice with grouping_id. */
  private val q27 = QueryDef(
    "q27_cube",
    (s, d) => Tables.orders(s, d)
      .cube(col("o_orderstatus"), year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        emit2(sum(money(col("o_totalprice")))).as("revenue"),
        grouping_id().cast("int").as("gid")),
    Some(s"""
      SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS o_year,
             COUNT(*) AS n_orders, ${oSum2("o_totalprice")} AS revenue,
             CAST(GROUPING(o_orderstatus, year(o_orderdate)) AS INT) AS gid
      FROM orders GROUP BY CUBE(o_orderstatus, year(o_orderdate))"""))

  /** Explicit GROUPING SETS (the exact pivot-subtotal shape when neither
    * rollup nor cube fits). */
  private val q28 = QueryDef(
    "q28_grouping_sets",
    (s, d) => Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        grouping_id().cast("int").as("gid")),
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""))

  /** Exact interpolated percentiles + distinct counts per group. */
  private val q29 = QueryDef(
    "q29_quantiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        countDistinct(col("l_partkey")).as("nd_parts"),
        count(lit(1)).as("n")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS median_qty,
             quantile_cont(l_quantity, 0.9) AS p90_qty,
             COUNT(DISTINCT l_partkey) AS nd_parts, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag"""))

  /** Window navigation family: lag/lead/first_value + day deltas
    * (completes the §2.5 frame coverage beyond the reference's set). */
  private val q42 = QueryDef(
    "q42_lead_lag",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        dstr(col("o_orderdate")).as("order_date"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        first(col("o_orderkey")).over(w).as("first_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date"))
          .as("days_since_prev"),
        ntile(4).over(w).cast("int").as("quartile"))
    },
    Some("""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             lag(o_orderkey, 1) OVER w AS prev_orderkey,
             lead(o_orderkey, 1) OVER w AS next_orderkey,
             first_value(o_orderkey) OVER w AS first_orderkey,
             CAST(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS INT)
               AS days_since_prev,
             CAST(ntile(4) OVER w AS INT) AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""))

  /** True 30-DAY rolling revenue via a RANGE frame over day numbers — the
    * calendar-correct contrast to the reference's 30-ROW frame (W3). */
  private val q43 = QueryDef(
    "q43_range_30day",
    (s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val daily = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("o_orderdate").cast("date").as("order_date"))
        .agg(sum(money(col("o_totalprice"))).as("daily_rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("n_name"))
        .orderBy(unix_date(col("order_date")))
        .rangeBetween(-29, org.apache.spark.sql.expressions.Window.currentRow)
      daily.select(col("n_name"), dstr(col("order_date")).as("order_date"),
        emit2(col("daily_rev")).as("daily_rev"),
        emit2(sum(col("daily_rev")).over(w)).as("rev_30day"))
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
             CAST(CAST(SUM(daily_rev) OVER (PARTITION BY n_name
               ORDER BY datediff('day', DATE '1970-01-01', order_date)
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE)
               AS rev_30day
      FROM daily"""))

  /** LATERAL correlated top-N per row (Spark SQL >= 3.4 decorrelates it;
    * the reference's CROSS APPLY TOP(1) generalized to TOP(2)). */
  private val q44 = QueryDef(
    "q44_lateral_topn",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""")
    },
    Some("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t"""))

  /** As-of join: each order sees the customer's most recent STRICTLY
    * earlier order (union-trick operator, one shuffle — no range join). */
  private val q45 = QueryDef(
    "q45_asof_join",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
      AsOf.join(o, o, Seq("o_custkey"),
          leftTs = col("o_orderdate"), rightTs = col("o_orderdate"),
          tiebreak = col("o_orderkey"),
          payload = Seq("o_orderkey", "o_totalprice"), strict = true)
        .select(col("o_orderkey"), col("o_custkey"),
          dstr(col("o_orderdate")).as("order_date"),
          col("asof_o_orderkey").as("prev_orderkey"),
          col("asof_o_totalprice").as("prev_totalprice"))
    },
    Some("""
      SELECT o1.o_orderkey, o1.o_custkey,
             strftime(o1.o_orderdate, '%Y-%m-%d') AS order_date,
             (SELECT (max(struct_pack(ts := o2.o_orderdate, tb := o2.o_orderkey,
                                      v := o2.o_orderkey))).v
              FROM orders o2 WHERE o2.o_custkey = o1.o_custkey
                AND o2.o_orderdate < o1.o_orderdate) AS prev_orderkey,
             (SELECT (max(struct_pack(ts := o2.o_orderdate, tb := o2.o_orderkey,
                                      v := o2.o_totalprice))).v
              FROM orders o2 WHERE o2.o_custkey = o1.o_custkey
                AND o2.o_orderdate < o1.o_orderdate) AS prev_totalprice
      FROM orders o1"""))

  /** Generators: posexplode over a split array (UDTF-shaped row expansion). */
  private val q46 = QueryDef(
    "q46_posexplode",
    (s, d) => Tables.part(s, d)
      .select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
      .select(col("p_partkey"), col("pos").cast("int").as("pos"), col("word")),
    Some("""
      SELECT p_partkey, CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos,
             unnest(w) AS word
      FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)"""))

  /** Array scalar family over the embedding column (element access, size,
    * min/max, predicate counts — all codegen-friendly, no UDF). */
  private val q47 = QueryDef(
    "q47_array_ops",
    (s, d) => Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("n_dims"),
      array_max(col("embedding")).cast("double").as("vmax"),
      array_min(col("embedding")).cast("double").as("vmin"),
      size(filter(col("embedding"), x => x > 0)).as("n_pos"),
      element_at(col("embedding"), 1).cast("double").as("e1"),
      element_at(col("embedding"), -1).cast("double").as("e_last")),
    Some("""
      SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
             CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax,
             CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vmin,
             CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
             CAST(embedding[1] AS DOUBLE) AS e1,
             CAST(embedding[-1] AS DOUBLE) AS e_last
      FROM embeddings"""))

  /** String scalar family beyond the reference's §2.9 set. */
  private val q48 = QueryDef(
    "q48_string_funcs",
    (s, d) => Tables.part(s, d).select(
      col("p_partkey"),
      substring_index(col("p_name"), " ", 1).as("first_word"),
      reverse(col("p_brand")).as("brand_rev"),
      translate(col("p_type"), "aeiou", "AEIOU").as("type_vowels"),
      instr(col("p_name"), "red").cast("int").as("red_pos"),
      ascii(col("p_brand")).cast("int").as("brand_ascii"),
      levenshtein(col("p_brand"), col("p_type")).cast("int").as("lev_dist"),
      repeat(substring(col("p_brand"), 1, 2), 2).as("brand_rep")),
    Some("""
      SELECT p_partkey,
             split_part(p_name, ' ', 1) AS first_word,
             reverse(p_brand) AS brand_rev,
             translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
             CAST(strpos(p_name, 'red') AS INT) AS red_pos,
             CAST(ascii(p_brand) AS INT) AS brand_ascii,
             CAST(levenshtein(p_brand, p_type) AS INT) AS lev_dist,
             repeat(p_brand[1:2], 2) AS brand_rep
      FROM part"""))

  /** Set-op family completion: INTERSECT (q17 covers EXCEPT). */
  private val q49 = QueryDef(
    "q49_intersect",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    },
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"""))

  /** Null-safe equality (<=>) driving a FULL OUTER join of two keyed
    * aggregates where the key itself is nullable. */
  private val q50 = QueryDef(
    "q50_nullsafe_full_join",
    (s, d) => {
      val e = Tables.events(s, d).withColumn("k",
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).try_cast(IntegerType) % 10)
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("k").as("ck")).agg(count(lit(1)).as("n_clicks"))
      val errors = e.filter(col("event_type") === "error")
        .groupBy(col("k").as("ek")).agg(count(lit(1)).as("n_errors"))
      clicks.join(errors, col("ck") <=> col("ek"), "full")
        .select(coalesce(col("ck"), col("ek")).as("k"),
          col("n_clicks"), col("n_errors"))
    },
    Some("""
      WITH e AS (SELECT event_type,
                   TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS k
                 FROM events),
      clicks AS (SELECT k AS ck, COUNT(*) AS n_clicks FROM e
                 WHERE event_type = 'click' GROUP BY k),
      errors AS (SELECT k AS ek, COUNT(*) AS n_errors FROM e
                 WHERE event_type = 'error' GROUP BY k)
      SELECT coalesce(ck, ek) AS k, n_clicks, n_errors
      FROM clicks FULL OUTER JOIN errors ON ck IS NOT DISTINCT FROM ek"""))

  /** Ordered-argument aggregates: deterministic max_by/min_by via struct
    * ordering, count_if, bool_and/bool_or. */
  private val q51 = QueryDef(
    "q51_arg_aggregates",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("best_order"),
        min(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("worst_order"),
        count_if(col("o_totalprice") > 100000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_totalprice") > 400000).as("any_huge")),
    Some("""
      SELECT o_orderstatus,
             (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS best_order,
             (min(struct_pack(p := o_totalprice, k := o_orderkey))).k AS worst_order,
             CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
             bool_and(o_totalprice > 0) AS all_positive,
             bool_or(o_totalprice > 400000) AS any_huge
      FROM orders GROUP BY o_orderstatus"""))

  /** Approximate aggregates — the 100 TB path where exact distinct counts
    * and quantiles stop being affordable. Sketch VALUES are engine-specific
    * (HLL++ here, DuckDB's HLL there), so the oracle-compared columns are
    * the exact values plus each engine's own within-error-bound BOOLEANS:
    * both engines assert their sketch lands inside the same envelope, which
    * is the property the operator actually promises. ApproxAccuracySpec
    * additionally bounds the raw Spark sketch error. */
  private val q52 = QueryDef(
    "q52_approx_aggs",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_nd_parts"),
        // rsd 1%: the 5% envelope is then ~5 sigma, not the coin-flip-ish
        // ~1 sigma the default 5% rsd would make of it
        approx_count_distinct(col("l_partkey"), 0.01).as("__approx_nd"),
        percentile_approx(col("l_quantity").cast("double"), lit(0.5),
          lit(10000)).as("__approx_med"),
        expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)").as("__exact_med"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_nd_parts"), col("n"),
        (abs(col("__approx_nd").cast("double") -
             col("exact_nd_parts").cast("double")) <=
          col("exact_nd_parts").cast("double") * 0.05).as("nd_within_5pct"),
        (abs(col("__approx_med") - col("__exact_med")) <= 1.0)
          .as("median_within_1")),
    Some("""
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_nd_parts,
             CAST(COUNT(*) AS BIGINT) AS n,
             abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
                 - CAST(COUNT(DISTINCT l_partkey) AS DOUBLE))
               <= CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) * 0.05
               AS nd_within_5pct,
             abs(approx_quantile(CAST(l_quantity AS DOUBLE), 0.5)
                 - median(CAST(l_quantity AS DOUBLE))) <= 1.0
               AS median_within_1
      FROM lineitem GROUP BY l_returnflag"""))

  /** Surrogate/join keys for dims too big to window over (§7.4(c)):
    * xxhash64/crc32/murmur3 on the Spark side, plus an md5-based key that
    * IS engine-portable. The md5 key is oracle-compared cell-for-cell; the
    * engine-specific hashes are surfaced as collision-freeness booleans
    * (all-distinct over the corpus), which DuckDB states as the expected
    * constant — a broken/degenerate Spark hash column flips them false. */
  private val q53 = QueryDef(
    "q53_xxhash_keys", { (s, d) =>
      // only the 64-bit hash gets a collision-freeness boolean: at 2^32
      // hashes (crc32, murmur3) distinctness is a birthday coin-flip from
      // ~80k rows up, so stating it as an oracle constant would fail on a
      // larger fixture for reasons unrelated to correctness. The 32-bit
      // hashes are exercised (forced through a count the optimizer cannot
      // prune) without asserting an invariant they don't have.
      val keyed = Tables.customer(s, d).select(
        col("c_custkey"),
        md5(concat_ws("|", col("c_name"), col("c_mktsegment")))
          .as("portable_key"),
        xxhash64(col("c_name"), col("c_mktsegment")).as("__xx"),
        crc32(col("c_name").cast("binary")).as("__crc"),
        hash(col("c_name"), col("c_nationkey")).as("__mm"))
      val stats = keyed.agg(
        countDistinct(col("__xx")).as("__nd_xx"),
        countDistinct(col("__crc"), col("__mm")).as("__nd_32"),
        count(lit(1)).as("__n"))
      keyed.crossJoin(broadcast(stats)).select(
        col("c_custkey"), col("portable_key"),
        (col("__nd_xx") === col("__n")).as("xx_collision_free"),
        (col("__nd_32") > 0).as("hashes_32bit_computed"))
    },
    Some("""
      SELECT c_custkey,
             md5(c_name || '|' || c_mktsegment) AS portable_key,
             TRUE AS xx_collision_free,
             TRUE AS hashes_32bit_computed
      FROM customer"""))

  /** Multimodal metadata-only aggregation (payload column pruned from the
    * scan); metadata derivation is deterministic from doc_id, so DuckDB
    * can mirror it exactly. */
  private val q54 = QueryDef(
    "q54_media_metadata",
    (s, d) => operators.Multimodal.metadataSummary(
        operators.Multimodal.mediaFromDocuments(Tables.documents(s, d)))
      .select(col("kind"), col("n_media"),
        col("avg_width"), col("total_duration_ms")),
    Some("""
      WITH media AS (
        SELECT doc_id,
               ['image','audio','video'][(doc_id % 3) + 1] AS kind,
               CAST((doc_id % 16) + 8 AS INT) AS width,
               CAST((doc_id % 5000) + 1000 AS BIGINT) AS duration_ms
        FROM documents)
      SELECT kind, COUNT(*) AS n_media,
             CAST(SUM(CAST(width AS DOUBLE)) / COUNT(*) AS DOUBLE) AS avg_width,
             CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms
      FROM media GROUP BY kind"""))

  /** Multimodal decode + feature extraction. The stub codec is a 64-bit
    * LCG (state h_t = a^t·seed + c·Σ_{j<t}a^j, all mod 2^64), so its
    * per-media mean/std/p_zero have a closed form DuckDB can evaluate
    * exactly: a recursive CTE builds the 31^j / a^j / Σa^j power tables
    * once, HUGEINT arithmetic emulates 64-bit wraparound (seed split into
    * 32-bit halves keeps a^t·seed inside the signed-128 range), and the
    * moments are exact integers so the final doubles are bit-identical. */
  /** Shared oracle CTE chain replaying FakeCodec.decode in HUGEINT SQL:
    * ends at `bytes(media_id, kind, n, j, v)` — the j-th (1-based)
    * decoded unsigned byte of each media stream. Used by q55 (moments)
    * and R6Queries' q182/q183 (perceptual hash); `payload` lets callers
    * derive the seed bytes from a text transform (q183 header media). */
  private[graft] def oMediaBytesCtes(
      payload: String = "encode(text)",
      nExpr: String =
        "GREATEST(1, (doc_id % 16 + 8) * (doc_id % 12 + 8) * 3)"): String = s"""
      media AS (
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
               $payload AS payload,
               octet_length($payload) AS plen,
               CAST($nExpr AS INT) AS n
        FROM documents),
      bounds AS (SELECT GREATEST(MAX(plen), MAX(n)) AS mx FROM media),
      pw AS (
        SELECT 0 AS j, 1::HUGEINT AS p31, 1::HUGEINT AS ap, 0::HUGEINT AS s
        UNION ALL
        SELECT j + 1,
               (p31 * 31::HUGEINT) % 18446744073709551616::HUGEINT,
               (ap * 6364136223846793005::HUGEINT) % 18446744073709551616::HUGEINT,
               (s + ap) % 18446744073709551616::HUGEINT
        FROM pw WHERE j < (SELECT mx FROM bounds)),
      seedpos AS (
        SELECT media_id, plen, hex(payload) AS hx,
               unnest(generate_series(0, plen - 1)) AS k
        FROM media),
      seedterm AS (
        SELECT b.media_id,
               CAST(CASE WHEN bv > 127 THEN bv - 256 ELSE bv END AS HUGEINT) * p.p31 AS term
        FROM (SELECT media_id, plen, k,
                strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1)) * 16
                + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1)) - 17 AS bv
              FROM seedpos) b
        JOIN pw p ON p.j = b.plen - 1 - b.k),
      seeds AS (
        SELECT m.media_id,
               ((((1125899906842597::HUGEINT * p.p31 + COALESCE(st.tsum, 0::HUGEINT))
                  % 18446744073709551616::HUGEINT) + 18446744073709551616::HUGEINT)
                  % 18446744073709551616::HUGEINT) AS seed
        FROM media m
        JOIN pw p ON p.j = m.plen
        LEFT JOIN (SELECT media_id, SUM(term) AS tsum FROM seedterm GROUP BY 1) st
          USING (media_id)),
      bytes AS (
        SELECT m.media_id, m.kind, m.n, p.j AS j,
               CAST((((p.ap * (s.seed % 4294967296::HUGEINT))
                      + ((p.ap * (s.seed // 4294967296::HUGEINT)) % 4294967296::HUGEINT)
                        * 4294967296::HUGEINT
                      + 1442695040888963407::HUGEINT * p.s)
                     % 18446744073709551616::HUGEINT)
                    // 72057594037927936::HUGEINT AS BIGINT) AS v
        FROM media m
        JOIN seeds s USING (media_id)
        JOIN pw p ON p.j BETWEEN 1 AND m.n)"""

  private val q55 = QueryDef(
    "q55_media_features",
    (s, d) => operators.Multimodal.extractFeatures(
      operators.Multimodal.spreadForDecode(
        operators.Multimodal.mediaFromDocuments(Tables.documents(s, d)))).toDF(),
    Some(s"""
      WITH RECURSIVE ${oMediaBytesCtes()},
      agg AS (
        SELECT media_id, CAST(SUM(v) AS BIGINT) AS sv, CAST(SUM(v*v) AS BIGINT) AS sq,
               CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS z,
               ANY_VALUE(n) AS n
        FROM bytes GROUP BY 1)
      SELECT m.media_id, m.kind, CAST(a.n AS INT) AS n_bytes,
             CAST(a.sv AS DOUBLE) / a.n AS mean,
             sqrt(CAST(a.sq AS DOUBLE) / a.n
                  - (CAST(a.sv AS DOUBLE) / a.n) * (CAST(a.sv AS DOUBLE) / a.n)) AS std,
             CAST(a.z AS DOUBLE) / a.n AS p_zero
      FROM media m JOIN agg a USING (media_id)"""))

  /** Proper winnowing (not just the global-min fingerprint of q32): min
    * hash per sliding window over the POSITIONAL shingle sequence, then
    * the distinct fingerprint set per document. Local edits perturb only
    * the windows they touch. */
  private val q56 = QueryDef(
    "q56_winnow_fingerprints",
    (s, d) => {
      val w = 4
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val sh = graft.functions.TextFunctions.wordShingles(toks, 3) // ordered!
      Tables.documents(s, d)
        .select(col("doc_id"), transform(sh, x => md5(x)).as("__h"))
        .filter(size(col("__h")) >= w)
        .select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(1), size(col("__h")) - (w - 1)),
            i => array_min(slice(col("__h"), i, lit(w)))))).as("fingerprint"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
                 FROM documents),
      sh AS (SELECT doc_id,
               list_transform(range(1, len(w) - 1),
                 i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS h
             FROM t WHERE len(w) >= 3),
      wins AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(h) - 2),
                   i -> list_aggregate(h[i:i+3], 'min'))) AS fps
               FROM sh WHERE len(h) >= 4)
      SELECT doc_id, unnest(fps) AS fingerprint FROM wins"""))

  /** TF-IDF-style term scoring. The idf factor is the raw ratio
    * (N - df + 0.5)/(df + 0.5) — BM25's idf argument without the log:
    * IEEE +-*\/ are correctly rounded so the score is bit-identical
    * across engines, which ln() does not guarantee. Real pipelines wrap
    * ln() around exactly this ratio. */
  private val q57 = QueryDef(
    "q57_tfidf",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
        .filter(length(col("term")) >= 4)
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
      tf.join(broadcast(df_), "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          (col("tf").cast("double") *
            ((col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
              (col("df").cast("double") + 0.5))).as("score"))
        .filter(col("score") > 1.0)
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(list_filter(
                      string_split_regex(text, '\s+'), x -> x <> '')) AS term
                    FROM documents),
      f AS (SELECT * FROM toks WHERE length(term) >= 4),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM f GROUP BY doc_id, term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) *
               ((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
                (CAST(df.df AS DOUBLE) + 0.5)) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
      WHERE CAST(tf.tf AS DOUBLE) *
              ((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5) /
               (CAST(df.df AS DOUBLE) + 0.5)) > 1.0"""))

  /** Deterministic train/val/test split by content-independent key hash —
    * the scalable, engine-portable alternative to sampleBy: stable under
    * re-runs, repartitioning, and engine changes. */
  private val q58 = QueryDef(
    "q58_hash_split", {
      (s, d) =>
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
          16, 10).cast("int") % 100
        Tables.documents(s, d).select(
          col("doc_id"), bucket.as("bucket"),
          when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").as("split"))
    },
    Some {
      val nib = (j: Int) =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $j, 1)) - 1)"
      val bucket = s"CAST(4096*${nib(1)} + 256*${nib(2)} + 16*${nib(3)} + ${nib(4)} AS INT) % 100"
      s"""
      SELECT doc_id, $bucket AS bucket,
             CASE WHEN $bucket < 80 THEN 'train'
                  WHEN $bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents"""
    })

  private val EmbDim = ExtQueries.OracleEmbDim
  private val IvfK = 8
  private def oDot(a: String, b: String) = ExtQueries.oDot(a, b)
  private def oCos(a: String, b: String) = ExtQueries.oCos(a, b)
  private val oCentroids = s"""
      cent AS MATERIALIZED (SELECT vec_id AS centroid_id, embedding AS cemb
               FROM embeddings
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $IvfK)"""

  /** IVF assignment: nearest deterministic seed centroid per vector (the
    * build side of the inverted-file ANN index). */
  private val q59 = QueryDef(
    "q59_ivf_assign",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.operators.Similarity.ivfAssign(e, "vec_id", "embedding",
        graft.operators.Similarity.ivfCentroids(e, "vec_id", "embedding", IvfK))
    },
    Some(s"""
      WITH $oCentroids,
      sc AS (SELECT e.vec_id, c.centroid_id,
               ${oCos("e.embedding", "c.cemb")} AS cos
             FROM embeddings e CROSS JOIN cent c),
      rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY cos DESC, centroid_id) AS rn FROM sc)
      SELECT vec_id, centroid_id, cos AS centroid_cos FROM rk WHERE rn = 1"""))

  /** IVF top-k search probing nprobe=2 of $IvfK buckets — candidate volume
    * is corpus * nprobe / k instead of the full corpus. */
  private val q60 = QueryDef(
    "q60_ivf_topk",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.operators.Similarity.ivfTopK(e, "vec_id", "embedding",
        col("vec_id") < 10,
        graft.operators.Similarity.ivfCentroids(e, "vec_id", "embedding", IvfK),
        k = 3, nprobe = 2)
    },
    Some(s"""
      WITH $oCentroids,
      asc_ AS MATERIALIZED (SELECT vec_id, centroid_id FROM (
               SELECT e.vec_id, c.centroid_id,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY ${oCos("e.embedding", "c.cemb")} DESC,
                                 c.centroid_id) AS rn
               FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
      q AS (SELECT vec_id AS q_id, embedding AS qemb FROM embeddings
            WHERE vec_id < 10),
      qc AS MATERIALIZED (SELECT q_id, qemb, centroid_id FROM (
             SELECT q.q_id, q.qemb, c.centroid_id,
                    ROW_NUMBER() OVER (PARTITION BY q.q_id
                      ORDER BY ${oCos("q.qemb", "c.cemb")} DESC,
                               c.centroid_id) AS rn
             FROM q CROSS JOIN cent c) WHERE rn <= 2),
      cand AS (SELECT qc.q_id, qc.qemb, e.vec_id AS n_id, e.embedding AS nemb
               FROM qc
               JOIN asc_ a ON a.centroid_id = qc.centroid_id
               JOIN embeddings e ON e.vec_id = a.vec_id
               WHERE qc.q_id <> e.vec_id),
      sc AS MATERIALIZED (SELECT q_id, n_id, ${oCos("qemb", "nemb")} AS cosine FROM cand),
      rk AS (SELECT q_id, n_id, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY cosine DESC, n_id) AS INT) AS rank FROM sc)
      SELECT q_id, n_id, cosine, rank FROM rk WHERE rank <= 3"""))

  /** One-scan column profiler over a mixed-type column set. */
  private val q61 = QueryDef(
    "q61_profile",
    (s, d) => graft.operators.Quality.profile(Tables.orders(s, d),
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")),
    Some {
      def one(c: String) = s"""
        SELECT '$c' AS column_name, COUNT($c) AS n_present,
               COUNT(*) - COUNT($c) AS n_null,
               COUNT(DISTINCT $c) AS n_distinct,
               CAST(MIN($c) AS VARCHAR) AS min_value,
               CAST(MAX($c) AS VARCHAR) AS max_value
        FROM orders"""
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .map(one).mkString("\n        UNION ALL")
    })

  /** JSON scalar surface: path extraction (string + typed via from_json
    * schema) and construction (to_json over a struct). */
  private val q62 = QueryDef(
    "q62_json_ops",
    (s, d) => Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").try_cast(IntegerType).as("k_path"),
      from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
        .getField("k").as("k_typed"),
      to_json(struct(col("event_type").as("t"),
        col("user_id").as("u"))).as("json_out")),
    Some("""
      SELECT event_id,
             TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
             TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
             CAST(to_json(struct_pack(t := event_type, u := user_id)) AS VARCHAR)
               AS json_out
      FROM events"""))

  /** Gopher-style repetition quality signals: a document dominated by one
    * term or one bigram is low-quality training data. All ratios are
    * integer-derived doubles (exact division — deterministic cross-engine). */
  private val q63 = QueryDef(
    "q63_repetition_signals",
    (s, d) => {
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val base = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("__t"),
          graft.functions.TextFunctions.wordShingles(toks, 2).as("__b"))
      val tf = base.select(col("doc_id"), explode(col("__t")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_distinct"),
          max(col("tf")).as("max_tf"))
      val bf = base.select(col("doc_id"), explode(col("__b")).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("bf"))
        .groupBy("doc_id")
        .agg(sum(col("bf")).as("n_bigrams"), max(col("bf")).as("max_bf"))
      tf.join(bf, "doc_id").select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"),
        (col("max_tf").cast("double") / col("n_tokens").cast("double"))
          .as("top_term_share"),
        (col("max_bf").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_share"))
    },
    Some(s"""
      WITH t AS (SELECT doc_id, ${oToksQ63("text")} AS w FROM documents),
      tf AS (SELECT doc_id, unnest(w) AS term FROM t),
      tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
      ta AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                    COUNT(*) AS n_distinct, MAX(tf) AS max_tf
             FROM tfc GROUP BY doc_id),
      bg AS (SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i+1])) AS bg
             FROM t WHERE len(w) >= 2),
      bgc AS (SELECT doc_id, bg, COUNT(*) AS bf FROM bg GROUP BY 1, 2),
      ba AS (SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
                    MAX(bf) AS max_bf
             FROM bgc GROUP BY doc_id)
      SELECT ta.doc_id, n_tokens, n_distinct,
             CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS distinct_ratio,
             CAST(max_tf AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS top_term_share,
             CAST(max_bf AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
               AS top_bigram_share
      FROM ta JOIN ba ON ta.doc_id = ba.doc_id"""))

  private def oToksQ63(t: String) =
    s"list_filter(string_split_regex($t, '\\s+'), x -> x <> '')"

  /** Deterministic stratified sampling: exactly N docs per language,
    * chosen by md5-hash order — reproducible across engines, runs, and
    * partitionings (unlike sampleBy's RNG), the standard way to carve
    * balanced eval sets out of a skewed corpus. */
  private val q64 = QueryDef(
    "q64_stratified_sample",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 25)
        .select(col("doc_id"), col("lang"), col("__rn").cast("int").as("sample_rank"))
    },
    Some("""
      SELECT doc_id, lang, CAST(rn AS INT) AS sample_rank
      FROM (SELECT doc_id, lang,
              ROW_NUMBER() OVER (PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents)
      WHERE rn <= 25"""))

  /** Embedding-cosine near-duplicate pairs (exact, brute-force scoring —
    * the verification baseline; LSH/IVF candidate pre-filters are the
    * scale path, see Similarity.cosineNearDupPairs). */
  private val q65 = QueryDef(
    "q65_embed_neardup",
    (s, d) => graft.operators.Similarity.cosineNearDupPairs(
      Tables.embeddings(s, d), "vec_id", "embedding", threshold = 0.4),
    Some(s"""
      WITH a AS (SELECT vec_id AS a_id, embedding AS ae FROM embeddings),
      b AS (SELECT vec_id AS b_id, embedding AS be FROM embeddings)
      SELECT a_id, b_id, ${oCos("ae", "be")} AS cosine
      FROM a JOIN b ON a_id < b_id
      WHERE ${oCos("ae", "be")} >= 0.4"""))

  /** Typed Aggregator top-k per group — one pass, O(groups x k) state, no
    * partition sort (contrast with the window/rank formulations q13/q44). */
  private val q66 = QueryDef(
    "q66_topk_aggregator", {
      (s, d) =>
        import s.implicits._
        import graft.functions.TopKAggregator
        import graft.functions.TopKAggregator.ScoredId
        val rows = Tables.orders(s, d)
          .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
          .as[(String, Double, Long)]
        rows.groupByKey(_._1)
          .mapValues(r => ScoredId(r._2, r._3))
          .agg(TopKAggregator.topK(3).toColumn.name("top"))
          .toDF("o_orderstatus", "top")
          .select(col("o_orderstatus"),
            posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("o_orderstatus"),
            (col("pos") + 1).cast("int").as("rk"),
            col("t.id").as("o_orderkey"),
            col("t.score").as("o_totalprice"))
    },
    Some("""
      SELECT o_orderstatus, CAST(rn AS INT) AS rk, o_orderkey, o_totalprice
      FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3"""))

  private val RecallK = 3
  private val MaxNprobe = 4

  /** Measured IVF recall@k curve over nprobe = 1..4 against brute-force
    * ground truth on the q37 query sample — the ANN analogue of the q290
    * LSH planner; one candidate-scoring pass serves the whole curve. */
  private val q307 = QueryDef(
    "q307_ivf_recall_curve",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      graft.operators.Similarity.ivfRecallCalibration(e, "vec_id",
        "embedding", col("vec_id") < 10,
        graft.operators.Similarity.ivfCentroids(e, "vec_id", "embedding",
          IvfK),
        k = RecallK, maxNprobe = MaxNprobe)
    },
    Some(s"""
      WITH $oCentroids,
      q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS qemb
            FROM embeddings WHERE vec_id < 10),
      ex AS MATERIALIZED (SELECT q_id, n_id FROM (
             SELECT q.q_id, e.vec_id AS n_id,
                    ROW_NUMBER() OVER (PARTITION BY q.q_id
                      ORDER BY ${oCos("q.qemb", "e.embedding")} DESC,
                               e.vec_id) AS rn
             FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
             WHERE rn <= $RecallK),
      exn AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex),
      asc_ AS MATERIALIZED (SELECT vec_id, centroid_id FROM (
               SELECT e.vec_id, c.centroid_id,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY ${oCos("e.embedding", "c.cemb")} DESC,
                                 c.centroid_id) AS rn
               FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
      qc AS MATERIALIZED (SELECT q_id, qemb, centroid_id, rn AS probe_rank FROM (
             SELECT q.q_id, q.qemb, c.centroid_id,
                    ROW_NUMBER() OVER (PARTITION BY q.q_id
                      ORDER BY ${oCos("q.qemb", "c.cemb")} DESC,
                               c.centroid_id) AS rn
             FROM q CROSS JOIN cent c) WHERE rn <= $MaxNprobe),
      cand AS MATERIALIZED (SELECT qc.q_id, e.vec_id AS n_id,
                 ${oCos("qc.qemb", "e.embedding")} AS cosine,
                 qc.probe_rank
               FROM qc
               JOIN asc_ a USING (centroid_id)
               JOIN embeddings e ON e.vec_id = a.vec_id
               WHERE qc.q_id <> e.vec_id),
      pp AS MATERIALIZED (SELECT q_id, n_id, np,
               ROW_NUMBER() OVER (PARTITION BY q_id, np
                 ORDER BY cosine DESC, n_id) AS rk
             FROM cand CROSS JOIN (SELECT unnest(generate_series(1,
               $MaxNprobe)) AS np)
             WHERE probe_rank <= np),
      hit AS (SELECT np, CAST(count(*) AS BIGINT) AS n_hit
              FROM pp JOIN ex USING (q_id, n_id)
              WHERE rk <= $RecallK GROUP BY np),
      spine AS (SELECT unnest(generate_series(1, $MaxNprobe)) AS np)
      SELECT CAST(s.np AS INT) AS nprobe, exn.n_exact,
             CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
             CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
               / CAST(exn.n_exact AS DOUBLE) AS recall
      FROM spine s LEFT JOIN hit h ON h.np = s.np CROSS JOIN exn"""))

  val all: Seq[QueryDef] = Seq(
    q26, q27, q28, q29, q42, q43, q44, q45, q46, q47, q48, q49, q50, q51,
    q52, q53, q54, q55, q56, q57, q58, q59, q60, q61, q62, q63, q64, q65,
    q66, q307)
}
