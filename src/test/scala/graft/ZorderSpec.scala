package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Z-order layout (Scale.powerOfTwoBucket / zorderValue). */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zorderValue interleaves bits: reference check") {
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (10L, 6L), (255L, 255L),
      (170L, 85L))
    val df = cases.toDF("a", "b")
      .withColumn("z", Scale.zorderValue(col("a"), col("b"), 8))
    df.collect().foreach { r =>
      r.getLong(2) shouldBe ref(r.getLong(0), r.getLong(1), 8)
    }
  }

  test("powerOfTwoBucket is monotonic, bounded, and shift-exact") {
    val df = (0L to 1000L).toDF("x")
      .withColumn("bkt", Scale.powerOfTwoBucket(col("x"), lit(0L),
        lit(1000L), 4))
    val buckets = df.orderBy("x").select("bkt").as[Long].collect()
    buckets.min shouldBe 0L
    buckets.max should be < 16L
    buckets.sliding(2).foreach(p => p(1) should be >= p(0))
    // 1000 needs 10 bits -> shift 6 -> bucket = x >> 6
    buckets(640.toInt) shouldBe 10L
  }

  test("z-order layout prunes BOTH dimensions; single sort prunes one") {
    // 64x64 grid, 6-bit buckets are the coordinates themselves; 16 files
    // of 256 rows. Under z-order each file is one 16x16 tile, so a
    // b-quartile predicate [0,15] touches exactly the 4 bottom tiles;
    // under sort-by-a every file spans all of b and none can be skipped.
    val grid = (for { a <- 0 until 64; b <- 0 until 64 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
      .withColumn("zv", Scale.zorderValue(col("a"), col("b"), 6))
    def filesHit(sortCol: String): Long = {
      val ranked = grid.withColumn("rn",
        row_number().over(Window.orderBy(col(sortCol), col("a"), col("b"))))
      ranked.withColumn("file_id", ((col("rn") - 1) * 16 / 4096).cast("int"))
        .groupBy("file_id")
        .agg(min("b").as("b_lo"), max("b").as("b_hi"))
        .filter(col("b_hi") >= 0 && col("b_lo") <= 15)
        .count()
    }
    filesHit("zv") shouldBe 4L
    filesHit("a") shouldBe 16L
  }
}
