package graft

import org.apache.spark.sql.functions._

/** The DSv2 FunctionCatalog tier: GraftFunctions loaded through the
  * catalog plugin, resolvable from pure SQL, magic-method (codegen'd
  * Invoke) planning, aggregate partial/merge correctness across
  * partitions, and parity with the engine-side conventions. */
class QuirkCsvFunctionCatalogSpec extends SparkSpec {

  private lazy val root = {
    val r = java.nio.file.Files.createTempDirectory("graft_fn_cat").toString
    spark.conf.set("spark.sql.catalog.graft_fn",
      classOf[graft.sources.QuirkCsvCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_fn.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_fn.lib")
    r
  }

  test("token_count resolves via SQL and matches TextFunctions.tokens") {
    root
    import spark.implicits._
    val docs = Seq("a b  c", "  leading and trailing  ", "", "\tone\n",
      "multi\nline\ttabs andvt", null).toDF("text")
    docs.createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      "SELECT graft_fn.lib.token_count(text) AS n FROM fn_docs")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    val viaEngine = docs.select(
      org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .collect().map(r => if (r.isNullAt(0) || r.getInt(0) == -1) -1
        else r.getInt(0)).toSeq
    viaSql shouldBe viaEngine
    viaSql shouldBe Seq(3, 3, 0, 1, 5, -1)
  }

  test("token_count plans the magic method (codegen Invoke, not produceResult)") {
    root
    // non-foldable input (literals constant-fold the whole call away —
    // itself proof the function evaluates at plan time, but not what
    // this test pins): a range-derived string keeps the Project live
    spark.range(4)
      .selectExpr("concat('tok ', CAST(id AS STRING)) AS text")
      .createOrReplaceTempView("fn_rng")
    val df = spark.sql(
      "SELECT graft_fn.lib.token_count(text) AS n FROM fn_rng")
    val plan = df.queryExecution.executedPlan.toString
    // magic-method resolution plans Invoke(...); the fallback
    // row-boxing path would show ApplyFunctionExpression
    assert(!plan.contains("ApplyFunctionExpression"),
      s"expected magic-method Invoke planning, got:\n$plan")
    assert(plan.toLowerCase.contains("invoke"),
      s"expected an invoke call in the plan, got:\n$plan")
    df.collect().map(_.getInt(0)).toSeq shouldBe Seq(2, 2, 2, 2)
  }

  test("int_dot: exact integer dot product, null propagation, length guard") {
    root
    import spark.implicits._
    Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-2L, 7L), Seq(3L, 1L))
    ).toDF("a", "b").createOrReplaceTempView("fn_vecs")
    spark.sql("SELECT graft_fn.lib.int_dot(a, b) AS d FROM fn_vecs")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(32L, 1L)
    // null input -> null result (not a crash)
    spark.sql(
      "SELECT graft_fn.lib.int_dot(CAST(NULL AS ARRAY<BIGINT>), a) FROM fn_vecs")
      .collect().foreach(_.isNullAt(0) shouldBe true)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_fn.lib.int_dot(a, array(1L)) FROM fn_vecs")
        .collect()
    }
    err.getMessage should include("length mismatch")
  }

  test("int_dot matches quantizeInt8 self-dot on real embeddings") {
    root
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        graft.operators.Similarity.quantizeInt8(col("embedding")).as("q8"))
      .filter(col("q8").isNotNull)
    emb.createOrReplaceTempView("fn_emb")
    val viaSql = spark.sql(
      """SELECT vec_id, graft_fn.lib.int_dot(q8, q8) AS nsq
         FROM fn_emb ORDER BY vec_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaEngine = emb.select(col("vec_id"),
      aggregate(zip_with(col("q8"), col("q8"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("nsq"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    viaSql shouldBe viaEngine
    viaSql.length should be > 0
  }

  test("xor_checksum: order-independent, partial-merge correct, SQL-replayable") {
    root
    import spark.implicits._
    val vals = (1 to 1000).map(i => s"doc-$i")
    // many partitions forces real partial states + merges
    vals.toDF("v").repartition(16).createOrReplaceTempView("fn_cs")
    val viaAgg = spark.sql(
      "SELECT graft_fn.lib.xor_checksum(v) AS c FROM fn_cs")
      .collect().head.getLong(0)
    // the documented equivalent expression, evaluated row-wise then
    // folded driver-side — the cross-engine contract
    val rowHashes = spark.sql(
      "SELECT CAST(conv(substring(md5(v), 1, 15), 16, 10) AS BIGINT) FROM fn_cs")
      .collect().map(_.getLong(0))
    viaAgg shouldBe rowHashes.reduce(_ ^ _)
    // reversed input order: same checksum (commutative by construction)
    val viaReversed = vals.reverse.toDF("v").repartition(7)
      .createOrReplaceTempView("fn_cs_rev")
    spark.sql("SELECT graft_fn.lib.xor_checksum(v) FROM fn_cs_rev")
      .collect().head.getLong(0) shouldBe viaAgg
    // grouped aggregation + NULLs contribute nothing + empty-group zero
    Seq(("a", "x"), ("a", null), ("b", null))
      .toDF("g", "v").createOrReplaceTempView("fn_cs_g")
    val grouped = spark.sql(
      """SELECT g, graft_fn.lib.xor_checksum(v) AS c FROM fn_cs_g
         GROUP BY g ORDER BY g""").collect()
    grouped.length shouldBe 2
    grouped(1).getLong(1) shouldBe 0L // all-NULL group
    grouped(0).getLong(1) should not be 0L
  }

  test("SHOW FUNCTIONS lists the library; descriptions document the contract") {
    root
    val shown = spark.sql("SHOW FUNCTIONS IN graft_fn.lib")
      .collect().map(_.getString(0)).toSet
    graft.sources.GraftFunctions.names.foreach { n =>
      assert(shown.exists(_.endsWith(n)), s"$n missing from $shown")
    }
    // DESCRIBE FUNCTION on a non-session v2 catalog is unsupported in
    // Spark 4.1 (ResolveSessionCatalog only rewrites session-catalog
    // functions to DescribeFunctionCommand) — the catalog API's own
    // description() carries the user-facing contract instead
    graft.sources.GraftFunctions.load("xor_checksum").get
      .description() should include("order-independent")
  }
}
