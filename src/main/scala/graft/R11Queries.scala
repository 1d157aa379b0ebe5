package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Queries.QueryDef
import graft.operators.Bucketing

/** Round-11 wave: physical-layout co-location.
  *
  * q329 is the bucketed fact-to-fact join — the one join shape where
  * "let Catalyst pick" is not enough at 100 TB, because the win comes
  * from a WRITE-time layout decision (hash-bucket both facts on the
  * join key) that no optimizer can retrofit onto an unbucketed scan.
  * The query writes lineitem and orders as bucketed managed tables,
  * joins + per-key aggregates them, `require`s the physical plan has
  * ZERO shuffle exchanges (the co-location proof, enforced on every
  * Verify/Bench run, not only in the spec), then rolls the per-order
  * rows up to priority level. The oracle is pure join+agg SQL — layout
  * must never change results.
  */
object R11Queries {

  private val D2 = DecimalType(18, 2)
  private val Buckets = 16

  private val q329 = QueryDef(
    "q329_bucketed_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      Bucketing.writeBucketed(li, "graft_li_bucketed", "l_orderkey",
        Buckets, Seq("l_orderkey"))
      Bucketing.writeBucketed(ord, "graft_ord_bucketed", "o_orderkey",
        Buckets, Seq("o_orderkey"))
      // both sides of a fact-to-fact join are huge at 100 TB: disable the
      // broadcast fallback so the zero-exchange require proves
      // CO-LOCATION (BroadcastHashJoin would also show zero SHUFFLE
      // exchanges); materialize inside the conf window (q323 pattern)
      // restore the PRIOR value, not the default (an unset would leak
      // a plan-shape change into every later query of the session)
      val priorBroadcast =
        s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val perOrder = s.table("graft_li_bucketed")
          .join(s.table("graft_ord_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast(D2)).as("rev"),
            count(lit(1)).as("n_lines"))
        val exchanges = Bucketing.shuffleExchangeCount(perOrder)
        require(exchanges == 0,
          s"bucketed join+agg must plan zero shuffle exchanges, saw $exchanges")
        perOrder.groupBy(col("o_orderpriority"))
          .agg(sum(col("rev")).cast("double").as("revenue"),
            sum(col("n_lines")).as("n_lines"),
            count(lit(1)).as("n_orders"))
          .localCheckpoint()
      } finally priorBroadcast match {
        case Some(v) =>
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None =>
          s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    },
    Some("""
      WITH per_order AS (
        SELECT l_orderkey, o_orderpriority,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev,
               COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2)
      SELECT o_orderpriority,
             CAST(SUM(rev) AS DOUBLE) AS revenue,
             CAST(SUM(n_lines) AS BIGINT) AS n_lines,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM per_order GROUP BY 1"""))

  private val SbAlpha = 0.4
  private val SbA2 = SbAlpha * SbAlpha
  private val SbA3 = SbAlpha * SbAlpha * SbAlpha

  /** Stupid Backoff trigram LM (Brants et al. 2007): model counted on
    * the even-doc_id half, the odd half scored held-out — so all four
    * backoff levels actually fire. The oracle replays the counts, the
    * backoff CASE, and the floor(ln·2³⁰) grid bit-for-bit. */
  private val q330 = QueryDef(
    "q330_stupid_backoff",
    (s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.stupidBackoffScore(
        eval = docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        model = docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        idCol = "doc_id", textCol = "text", alpha = SbAlpha)
    },
    Some(sbOracle))

  /** The same scoring through the INCREMENTAL model path: fit on the
    * doc_id%4==0 quarter, fold in the %4==2 quarter with
    * [[graft.operators.Corpus.updateNgramModel]] (counts merged, corpus
    * never rescanned) — together exactly q330's even-half model. The
    * oracle is the REFIT model's SQL, so a hash match IS the
    * `update(fit(A), B) == fit(A ∪ B)` proof on real data. */
  private val q332 = QueryDef(
    "q332_ngram_model_update",
    (s, d) => {
      import graft.operators.Corpus
      val docs = Tables.documents(s, d)
      val m0 = Corpus.fitNgramModel(
        docs.filter(pmod(col("doc_id"), lit(4)) === 0), "text")
      val m = Corpus.updateNgramModel(m0,
        docs.filter(pmod(col("doc_id"), lit(4)) === 2), "text")
      Corpus.stupidBackoffScoreWith(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), m,
        "doc_id", "text", SbAlpha)
    },
    Some(sbOracle))

  private lazy val sbOracle: String = s"""
      WITH mt AS MATERIALIZED (SELECT ${ExtQueries.oToks("text")} AS w
            FROM documents WHERE doc_id % 2 = 0),
      m1 AS MATERIALIZED (
        SELECT u, COUNT(*) AS c1
        FROM (SELECT unnest(w) AS u FROM mt) GROUP BY 1),
      m2 AS MATERIALIZED (
        SELECT g2, COUNT(*) AS c2
        FROM (SELECT unnest(${ExtQueries.oShingles("w", 2)}) AS g2
              FROM mt WHERE len(w) >= 2) GROUP BY 1),
      m3 AS MATERIALIZED (
        SELECT g3, COUNT(*) AS c3
        FROM (SELECT unnest(${ExtQueries.oShingles("w", 3)}) AS g3
              FROM mt WHERE len(w) >= 3) GROUP BY 1),
      n AS (SELECT CAST(SUM(c1) AS DOUBLE) AS N FROM m1),
      et AS (SELECT doc_id, ${ExtQueries.oToks("text")} AS w
            FROM documents WHERE doc_id % 2 = 1),
      dt AS MATERIALIZED (
        SELECT doc_id, g3, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(${ExtQueries.oShingles("w", 3)}) AS g3
              FROM et WHERE len(w) >= 3) GROUP BY 1, 2),
      parts AS (SELECT doc_id, g3, cnt,
          sp[1] || ' ' || sp[2] AS p2,
          sp[2] || ' ' || sp[3] AS s2,
          sp[2] AS wb, sp[3] AS wc
        FROM (SELECT doc_id, g3, cnt, string_split(g3, ' ') AS sp FROM dt)),
      scored AS (SELECT doc_id, cnt,
          CASE WHEN m3.c3 IS NOT NULL THEN 0
               WHEN bc.c2 IS NOT NULL THEN 1
               WHEN uc.c1 IS NOT NULL THEN 2
               ELSE 3 END AS level,
          CAST(floor(CASE
            WHEN m3.c3 IS NOT NULL THEN
              ln(CAST(m3.c3 AS DOUBLE) / CAST(ab.c2 AS DOUBLE))
            WHEN bc.c2 IS NOT NULL THEN
              ln(($SbAlpha * CAST(bc.c2 AS DOUBLE)) / CAST(ub.c1 AS DOUBLE))
            WHEN uc.c1 IS NOT NULL THEN
              ln(($SbA2 * CAST(uc.c1 AS DOUBLE)) / N)
            ELSE ln($SbA3 / N) END * 1073741824.0) AS BIGINT) AS lp_scaled
        FROM parts
        LEFT JOIN m3 ON parts.g3 = m3.g3
        LEFT JOIN m2 ab ON parts.p2 = ab.g2
        LEFT JOIN m2 bc ON parts.s2 = bc.g2
        LEFT JOIN m1 ub ON parts.wb = ub.u
        LEFT JOIN m1 uc ON parts.wc = uc.u
        CROSS JOIN n)
      SELECT doc_id,
        CAST(SUM(cnt) AS BIGINT) AS n_transitions,
        CAST(SUM(CASE WHEN level = 0 THEN cnt ELSE 0 END) AS BIGINT)
          AS n_seen,
        CAST(SUM(CASE WHEN level = 1 THEN cnt ELSE 0 END) AS BIGINT)
          AS n_bo1,
        CAST(SUM(CASE WHEN level = 2 THEN cnt ELSE 0 END) AS BIGINT)
          AS n_bo2,
        CAST(SUM(CASE WHEN level = 3 THEN cnt ELSE 0 END) AS BIGINT)
          AS n_oov,
        -(CAST(SUM(cnt * lp_scaled) AS DOUBLE) / 1073741824.0) /
          CAST(SUM(cnt) AS DOUBLE) AS sb_nats
      FROM scored GROUP BY doc_id"""

  /** The ENTIRE graftcsv DSv2 path inside the correctness gate: lineitem
    * (string-cast, the raw-layer contract) written through the sink
    * (truncate-overwrite commit + zone-map sidecar) clustered by return
    * flag, read back through the scan with the equality filter pushed
    * (and zone-pruned) and the grouped COUNT/MIN/MAX pushed into the
    * readers. The oracle never sees the CSV — it replays the same
    * aggregate over the parquet table, so the round-trip must be exact.
    * String MIN/MAX compare binary in both engines. */
  private val q331 = QueryDef(
    "q331_graftcsv_roundtrip",
    (s, d) => {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q331_roundtrip").toString
      Tables.lineitem(s, d)
        .select(col("l_orderkey").cast("string").as("ok"),
          col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .repartition(4, col("rf"))
        .write.format("graftcsv").mode("overwrite").save(dir)
      s.read.format("graftcsv").load(dir)
        .filter(col("rf") === "R")
        .groupBy(col("ls"))
        .agg(count(lit(1)).as("n_lines"),
          min(col("ok")).as("min_ok"), max(col("ok")).as("max_ok"))
    },
    Some("""
      SELECT l_linestatus AS ls,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             MIN(CAST(l_orderkey AS VARCHAR)) AS min_ok,
             MAX(CAST(l_orderkey AS VARCHAR)) AS max_ok
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1"""))

  /** Top-N pushdown through the oracle gate: the q331 CSV round-trip
    * shape, but the re-scan is an ORDER BY + LIMIT under a TOTAL string
    * order (tie-broken by the unique key), so the per-split bounded-heap
    * readers must surface exactly the global top rows. String order is
    * binary in both engines (ASCII digits), and the driver's compare is
    * row-set based, so determinism needs only the total order. */
  private val q333 = QueryDef(
    "q333_graftcsv_topn",
    (s, d) => {
      val dir = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_q333_topn").toString
      Tables.lineitem(s, d)
        .select(col("l_orderkey").cast("string").as("ok"),
          (col("l_orderkey") * 8 + col("l_linenumber")).cast("string")
            .as("line_uid"),
          col("l_returnflag").as("rf"))
        .write.format("graftcsv").mode("overwrite")
        .option("maxSplitBytes", "262144") // force many splits on re-scan
        .save(dir)
      s.read.format("graftcsv").option("maxSplitBytes", "262144").load(dir)
        .filter(col("rf") === "R")
        .orderBy(col("ok").asc, col("line_uid").asc)
        .limit(25)
    },
    Some("""
      SELECT CAST(l_orderkey AS VARCHAR) AS ok,
             CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) AS line_uid,
             l_returnflag AS rf
      FROM lineitem WHERE l_returnflag = 'R'
      ORDER BY ok, line_uid LIMIT 25"""))

  val all: Seq[QueryDef] = Seq(q329, q330, q331, q332, q333)
}
