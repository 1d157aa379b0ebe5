package graft

import org.apache.spark.sql.functions._

/** The no-oracle scale queries still need correctness envelopes: approx
  * sketches must land within documented error of the exact answers. */
class ApproxAccuracySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sf/lineitem.parquet").exists()

  test("approx_count_distinct within 5% of exact per group") {
    assume(available)
    val rows = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    rows should not be empty
    rows.foreach { case (_, approx, exact) =>
      math.abs(approx - exact).toDouble / exact should be < 0.05
    }
  }

  test("percentile_approx at high accuracy matches exact median on integers") {
    assume(available)
    val (approx, exact) = Tables.lineitem(spark, sf)
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("a"),
        percentile(col("l_quantity"), lit(0.5)).as("e"))
      .as[(Double, Double)].head()
    // quantities are small integers: the sketch at accuracy 10000 must land
    // within one unit of the exact interpolated median
    math.abs(approx - exact) should be <= 1.0
  }

  test("xxhash64 keys: deterministic and collision-free on the customer dim") {
    assume(available)
    val df = Tables.customer(spark, sf)
      .select(col("c_custkey"), xxhash64(col("c_name"), col("c_mktsegment")).as("k"))
      .cache()
    df.select("k").distinct().count() shouldBe df.count()
    // stable across evaluations (pure function of inputs)
    val a = df.orderBy("c_custkey").select("k").as[Long].collect()
    val b = Tables.customer(spark, sf)
      .select(xxhash64(col("c_name"), col("c_mktsegment")).as("k"),
        col("c_custkey"))
      .orderBy("c_custkey").select("k").as[Long].collect()
    a.toSeq shouldBe b.toSeq
  }
}
