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
