package graft

import org.apache.spark.sql.functions._

import graft.superstore.{Ingest, Marts, Pipeline, Staging}

/** Golden end-to-end tests on the real reference CSV (SURVEY §5.2.2): every
  * assertion is a number measured on `superstore.csv` and recorded in
  * BASELINE.md. Skipped gracefully when the reference checkout is absent. */
class SuperstorePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val csv = "/root/reference/Project1/superstore.csv"
  private def available = new java.io.File(csv).exists()

  private lazy val out = Pipeline.run(spark, csv)

  test("ingest repairs all quirks: 9,994 rows, 21 columns, no corrupt rows") {
    assume(available)
    val raw = out.raw
    raw.count() shouldBe 9994
    // fully-quoted rows were unwrapped, not dropped: every row has an OrderID
    raw.filter($"OrderID".isNull || !$"OrderID".rlike("^[A-Z]{2}-")).count() shouldBe 0
    // cp1252 NBSP decoded (Konftel product name survives intact)
    raw.filter($"ProductName".contains("Konftel 250")).count() should be >= 1L
  }

  test("excel-compat mode reproduces the workbook's 7,484-row data loss") {
    assume(available)
    Ingest.readRaw(spark, csv, excelCompat = true).count() shouldBe 7484
  }

  test("typed staging: all dates parse (M/d/yyyy), aggregate invariants hold") {
    assume(available)
    val stg = out.staged
    stg.filter($"order_date".isNull || $"ship_date".isNull).count() shouldBe 0
    // staged columns follow the reference DDL (DECIMAL(18,2) per row, so
    // the stored sum is 2297201.07, same as SQL Server would hold); the
    // BASELINE invariants are measured at full precision on the raw strings
    val stored = stg.agg(sum($"sales").cast("decimal(18,2)").cast("string"),
      sum($"quantity")).as[(String, Long)].head()
    stored._1 shouldBe "2297201.07"
    stored._2 shouldBe 37873L
    val raw = out.raw.agg(
      sum($"Sales".cast("decimal(18,4)")).cast("decimal(18,2)").cast("string"),
      sum($"Profit".cast("decimal(18,4)")).cast("decimal(18,2)").cast("string"))
      .as[(String, String)].head()
    raw._1 shouldBe "2297200.86"
    raw._2 shouldBe "286397.02"
  }

  test("dedup: 9,986 rows survive (8 duplicate order lines removed)") {
    assume(available)
    out.deduped.count() shouldBe 9986
  }

  test("QA rule counts: 0 null dates, 1,871 negative-profit rows") {
    assume(available)
    val issues = out.loadIssues.select("issue_type", "row_count")
      .as[(String, Long)].collect().toMap
    issues("NULL_DATES") shouldBe 0
    // 1,871 negative-profit measured on all 9,994; dedup removes 4 of them
    issues("NEGATIVE_PROFIT") shouldBe 1867L +- 8L
    issues("INCONSISTENT_GEOGRAPHY") shouldBe 0
  }

  test("dim cardinalities match the measured profile") {
    assume(available)
    out.dims.shipMode.count() shouldBe 4
    out.dims.category.count() shouldBe 3
    out.dims.subCategory.count() shouldBe 17
    out.dims.customer.count() shouldBe 793
    out.dims.product.select("product_id").distinct().count() shouldBe 1862
    out.dims.geography.select("region").distinct().count() shouldBe 4
    out.dims.geography.select("state").distinct().count() shouldBe 49
  }

  test("date spine spans order-date min to ship-date max: 1,464 days") {
    assume(available)
    out.dims.date.count() shouldBe 1464
  }

  test("fact: grain preserved, surrogate keys resolve, idempotency keys unique") {
    assume(available)
    val fact = out.fact.cache()
    fact.count() shouldBe 9986
    // PK (order_id, order_line_no) unique — the reference's fact constraint
    fact.groupBy("order_id", "order_line_no").count()
      .filter($"count" > 1).count() shouldBe 0
    // every row resolves every dim key (no orphans)
    fact.filter($"ship_mode_key".isNull || $"customer_key".isNull ||
      $"product_key".isNull || $"geography_key".isNull ||
      $"sub_category_key".isNull || $"order_date_key".isNull).count() shouldBe 0
    fact.unpersist()
    ()
  }

  test("pivot mart by category: 3 categories + grand total, measures consistent") {
    assume(available)
    val p = out.pivotByCategory.collect()
    p.length shouldBe 4 // 3 categories + rollup grand total
    val total = p.find(_.isNullAt(0)).get
    total.getAs[Long]("sum_quantity") shouldBe
      out.deduped.agg(sum($"quantity")).as[Long].head()
  }

  test("rolling30 equals brute force for one region prefix") {
    assume(available)
    val r30 = out.rolling30.filter($"region" === "West")
      .orderBy($"date", $"order_id", $"order_line_no")
      .select($"sales".cast("double"), $"sales_30".cast("double"))
      .as[(Double, Double)].collect()
    val sales = r30.map(_._1)
    r30.zipWithIndex.foreach { case ((_, s30), i) =>
      val brute = sales.slice((i - 29).max(0), i + 1).sum
      s30 shouldBe brute +- 1e-6
    }
  }

  test("rolling30Daily: window runs on (region, day) grain and equals " +
    "brute force over daily totals") {
    assume(available)
    val daily = Marts.rolling30Daily(out.fact, out.dims.geography, out.dims.date)
    val west = daily.filter($"region" === "West").orderBy($"date")
      .select($"sales".cast("double"), $"sales_30".cast("double"))
      .as[(Double, Double)].collect()
    val sales = west.map(_._1)
    west.zipWithIndex.foreach { case ((_, s30), i) =>
      s30 shouldBe sales.slice((i - 29).max(0), i + 1).sum +- 1e-6
    }
    // grain is daily: one row per (region, date), far fewer than fact lines
    daily.groupBy("region", "date").count().filter($"count" > 1)
      .count() shouldBe 0
    // the scale property: the window's sort input is the pre-aggregated
    // daily grain, so the Window sits ABOVE the aggregate in the plan
    val plan = daily.queryExecution.optimizedPlan.toString
    plan.indexOf("Window").should(be >= 0)
    plan.indexOf("Window") should be < plan.indexOf("Aggregate")
  }

  test("rolling30Daily calendarRange: true 30-day window — gap days " +
    "shrink it, never stretch it") {
    assume(available)
    val daily = Marts.rolling30Daily(out.fact, out.dims.geography,
      out.dims.date, calendarRange = true)
    val west = daily.filter($"region" === "West").orderBy($"date")
      .select($"date".cast("string"), $"sales".cast("double"),
        $"sales_30".cast("double"))
      .as[(String, Double, Double)].collect()
    val byDate = west.map(r => java.time.LocalDate.parse(r._1) -> r._2).toMap
    west.foreach { case (ds, _, s30) =>
      val d = java.time.LocalDate.parse(ds)
      val brute = byDate.collect {
        case (d2, v) if !d2.isAfter(d) && !d2.isBefore(d.minusDays(29)) => v
      }.sum
      s30 shouldBe brute +- 1e-6
    }
  }

  test("audit columns: runTs stamps fact.load_ts and LoadIssues.created_at; " +
    "omitted when unset") {
    assume(available)
    // default run: no audit columns (deterministic golden outputs unchanged)
    out.fact.columns should not contain "load_ts"
    out.loadIssues.columns should not contain "created_at"
    val ts = "2024-06-01 12:34:56"
    val stamped = Pipeline.run(spark, csv, runTs = Some(ts))
    val loadTs = stamped.fact.select($"load_ts".cast("string")).distinct()
      .as[String].collect()
    loadTs shouldBe Array(ts)
    val createdAt = stamped.loadIssues.select($"created_at".cast("string"))
      .distinct().as[String].collect()
    createdAt shouldBe Array(ts)
  }

  test("top products per sub-category: rank <= 5 with ties kept") {
    assume(available)
    val tp = out.topProducts
    tp.filter($"rnk" > 5).count() shouldBe 0
    tp.groupBy("sub_category").count().filter($"count" < 5).count() shouldBe 0
  }

  test("profit_share divides by the FULL sub-category total, not the top-5's") {
    assume(available)
    // independent recomputation of the full-subcategory totals
    val full = out.fact
      .join(out.dims.product.select("product_key", "product_name", "sub_category"),
        "product_key")
      .groupBy("sub_category", "product_name")
      .agg(sum($"profit").as("p"))
    val totals = full.groupBy("sub_category").agg(sum($"p").as("t"))
    val expected = full.join(totals, "sub_category")
      .select($"sub_category", $"product_name",
        ($"p" * lit(1.0) / $"t").cast("decimal(9,4)").as("want"))
    val mismatches = out.topProducts
      .join(expected, Seq("sub_category", "product_name"))
      .filter($"profit_share" =!= $"want")
    mismatches.count() shouldBe 0
  }

  test("chart series match the workbook's cached chart values " +
    "(xl/charts/chart1-4.xml over the 7,484-row excel-lossy table)") {
    assume(available)
    // the charts render pivot ranges over tbl_Superstore = the
    // excel-compat ingest, staged (no dedup — the workbook keeps all rows)
    val stg = Staging.typed(Ingest.readRaw(spark, csv, excelCompat = true))
    // chart1 (column) / chart2 (bar): identical series, cached in the
    // workbook as Count of Sales = [1169, 4589, 1726] over
    // [Furniture, Office Supplies, Technology] — leaf rows, no total
    val bar = Marts.chartCategoryBar(stg).collect()
    bar.map(_.getString(0)).toSeq shouldBe
      Seq("Furniture", "Office Supplies", "Technology")
    bar.map(_.getAs[Long]("count_sales")).toSeq shouldBe Seq(1169L, 4589L, 1726L)
    bar.map(_.getAs[Long]("count_profit")).toSeq shouldBe Seq(1169L, 4589L, 1726L)
    // chart3 (line, "Sales, Profit & Quantity by Year/Month"): month
    // grain, (year, month) ascending; the workbook caches the first
    // Count-of-Sales points as 54, 33, 119, 107
    val line = Marts.chartYearMonthLine(stg).collect()
    line.length shouldBe 48 // 4 years x 12 months, no subtotal rows
    line.take(4).map(_.getAs[Long]("count_sales")).toSeq shouldBe
      Seq(54L, 33L, 119L, 107L)
    // chart4 (3-D pie): first series as slice shares; shares sum to 1
    val pie = Marts.chartCategoryPie(stg).collect()
    pie.map(_.getAs[Long]("count_sales")).toSeq shouldBe Seq(1169L, 4589L, 1726L)
    math.abs(pie.map(_.getAs[Double]("share")).sum - 1.0) should be < 1e-12
    // slicers cross-filter the chart series exactly like the pivots (A9)
    val west = Marts.chartCategoryBar(stg, regions = Some(Seq("West")))
      .agg(sum($"count_sales")).as[Long].head()
    west shouldBe stg.filter($"region" === "West").count()
  }
}
