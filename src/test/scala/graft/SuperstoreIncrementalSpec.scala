package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd2
import graft.superstore.{Pipeline, StarSchema}

/** Day-2 incremental semantics on the real CSV: SCD2 history accrues only
  * for changed keys, and the fact guard makes re-loads no-ops. */
class SuperstoreIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val csv = "/root/reference/Project1/superstore.csv"
  private def available = new java.io.File(csv).exists()

  private lazy val out = Pipeline.run(spark, csv)

  test("fact re-load with the same batch is a no-op (J5 guard)") {
    assume(available)
    val fact = out.fact.cache()
    val n = fact.count()
    StarSchema.appendFactIdempotent(fact, fact).count() shouldBe n
    fact.unpersist()
    ()
  }

  test("fact append of genuinely new lines adds exactly those lines") {
    assume(available)
    val fact = out.fact
    val existing = fact.filter($"order_id" =!= "CA-2016-152156")
    val merged = StarSchema.appendFactIdempotent(existing, fact)
    merged.count() shouldBe fact.count()
    merged.groupBy("order_id", "order_line_no").count()
      .filter($"count" > 1).count() shouldBe 0
  }

  /** Prior warehouse, MATERIALIZED (read-then-overwrite hazard: the merge
    * reads these and produces their replacement — SURVEY §7.5.1). */
  private lazy val prior = {
    val d = out.dims
    (StarSchema.SuperstoreDims(
      date = d.date.localCheckpoint(), shipMode = d.shipMode.localCheckpoint(),
      category = d.category.localCheckpoint(),
      subCategory = d.subCategory.localCheckpoint(),
      geography = d.geography.localCheckpoint(),
      customer = d.customer.localCheckpoint(),
      product = d.product.localCheckpoint()),
      out.fact.localCheckpoint())
  }

  private def writeDay2(lines: String*): String = {
    val header = "Row ID,Order ID,Order Date,Ship Date,Ship Mode," +
      "Customer ID,Customer Name,Segment,Country,City,State,Postal Code," +
      "Region,Product ID,Category,Sub-Category,Product Name,Sales," +
      "Quantity,Discount,Profit;"
    val f = java.nio.file.Files.createTempFile("day2_", ".csv")
    java.nio.file.Files.write(f,
      (header +: lines).mkString("\n").getBytes("ISO-8859-1"))
    f.toString
  }

  test("runIncremental: same batch re-run is a full no-op — dims keep " +
    "every key, fact gains no rows") {
    assume(available)
    val (dims0, fact0) = prior
    val inc = Pipeline.runIncremental(spark, csv, dims0, fact0, "2024-06-01")
    inc.fact.count() shouldBe fact0.count()
    // SCD2 dims unchanged row-for-row, surrogate keys included
    inc.dims.customer.except(dims0.customer).count() shouldBe 0
    dims0.customer.except(inc.dims.customer).count() shouldBe 0
    inc.dims.product.except(dims0.product).count() shouldBe 0
    // simple dims unchanged too
    inc.dims.geography.except(dims0.geography).count() shouldBe 0
    inc.dims.shipMode.count() shouldBe dims0.shipMode.count()
  }

  test("runIncremental: drifted customer closes+opens SCD2 versions with " +
    "preserved keys; duplicate fact lines are not re-appended") {
    assume(available)
    val (dims0, fact0) = prior
    // day-2 drop: Claire Gute's existing order COMPLETE (runIncremental's
    // contract: orders arrive with all their lines) with Segment drifted,
    // plus one brand-new order from a brand-new customer
    val day2 = writeDay2(
      "1,CA-2016-152156,11/8/2016,11/11/2016,Second Class,CG-12520," +
        "Claire Gute,Home Office,United States,Henderson,Kentucky,42420," +
        "South,FUR-BO-10001798,Furniture,Bookcases," +
        "Bush Somerset Collection Bookcase,261.96,2,0,41.9136;",
      "\"2,CA-2016-152156,11/8/2016,11/11/2016,Second Class,CG-12520," +
        "Claire Gute,Home Office,United States,Henderson,Kentucky,42420," +
        "South,FUR-CH-10000454,Furniture,Chairs,\"\"Hon Deluxe Fabric " +
        "Upholstered Stacking Chairs, Rounded Back\"\",731.94,3,0,219.582\";",
      "3,CA-2024-990001,6/1/2024,6/3/2024,Second Class,ZZ-99999," +
        "Zed Zedson,Corporate,United States,Henderson,Kentucky,42420," +
        "South,FUR-BO-10001798,Furniture,Bookcases," +
        "Bush Somerset Collection Bookcase,100.00,1,0,10.00;")
    val inc = Pipeline.runIncremental(spark, day2, dims0, fact0, "2024-06-01")

    val cust = inc.dims.customer.cache()
    // drifted key: old version closed at runDate, new current version opened
    val claire = cust.filter($"customer_id" === "CG-12520")
      .orderBy("effective_from")
    claire.count() shouldBe 2
    val Array(closed, opened) = claire.collect()
    closed.getAs[Boolean]("is_current") shouldBe false
    closed.getAs[java.sql.Date]("effective_to").toString shouldBe "2024-06-01"
    opened.getAs[Boolean]("is_current") shouldBe true
    opened.getAs[String]("segment") shouldBe "Home Office"
    // brand-new customer entered; everyone else untouched
    cust.filter($"customer_id" === "ZZ-99999").count() shouldBe 1
    cust.count() shouldBe dims0.customer.count() + 2
    // surviving rows keep their surrogate keys; new rows offset past max
    val maxPrior = dims0.customer.agg(max($"customer_key")).as[Long].head()
    val priorKeys = dims0.customer
      .select($"customer_id", $"effective_from".cast("string"), $"customer_key")
      .as[(String, String, Long)].collect().toSet
    val afterKeys = cust
      .select($"customer_id", $"effective_from".cast("string"), $"customer_key")
      .as[(String, String, Long)].collect().toSet
    (priorKeys -- afterKeys) shouldBe Set.empty
    (afterKeys -- priorKeys).foreach(_._3 should be > maxPrior)
    // still exactly one current row per customer
    cust.filter($"is_current").groupBy("customer_id").count()
      .filter($"count" > 1).count() shouldBe 0
    cust.unpersist()

    // fact: the drifted line's (order_id, order_line_no) already exists, so
    // only the genuinely new order appends — through the J5 guard
    inc.fact.count() shouldBe fact0.count() + 1
    val fresh = inc.fact.filter($"order_id" === "CA-2024-990001")
    fresh.count() shouldBe 1
    fresh.filter($"customer_key".isNull || $"order_date_key".isNull ||
      $"geography_key".isNull || $"product_key".isNull).count() shouldBe 0
    // the date spine grew to cover the new order's dates
    inc.dims.date.agg(max($"date").cast("string")).as[String]
      .head() should be >= "2024-06-03"
  }

  test("day-2 SCD2 merge: only drifted customers gain history rows") {
    assume(available)
    val dim0 = out.dims.customer
    // day-2 snapshot: every Consumer-segment customer moves to 'Web'
    val snap2 = StarSchema.customerSnapshot(out.deduped)
      .withColumn("segment",
        when($"segment" === "Consumer", "Web").otherwise($"segment"))
    val dim1 = Scd2.merge(
      dim0.drop("customer_key"), snap2, Seq("customer_id"),
      Seq("customer_name", "segment", "region"), "2024-06-01")

    val consumers = out.dims.customer
      .filter($"segment" === "Consumer").count()
    // closed old versions + new current versions, others untouched
    dim1.filter(!$"is_current").count() shouldBe consumers
    dim1.filter($"is_current").count() shouldBe dim0.count()
    dim1.filter($"is_current" && $"segment" === "Web").count() shouldBe consumers
    // invariant: still exactly one current row per customer
    dim1.filter($"is_current").groupBy("customer_id").count()
      .filter($"count" > 1).count() shouldBe 0
  }
}
