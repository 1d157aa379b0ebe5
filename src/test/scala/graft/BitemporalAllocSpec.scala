package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Allocation, Bitemporal}

class BitemporalAllocSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  private val changes = Seq(
    // key 1: value changes on day 1 and day 10; the day-10 change is
    // recorded LATE (day 15)
    (1L, ts(1), ts(1), 100L, 11L),
    (1L, ts(10), ts(15), 200L, 12L))
    .toDF("k", "valid", "recorded", "v", "tb")

  private def versions = Bitemporal.versionTable(changes, "k",
    col("valid"), col("recorded"), col("tb"), Seq("v"))

  test("versionTable chains valid intervals per key") {
    val got = versions.orderBy("version").collect()
    got.length shouldBe 2
    got(0).getAs[Timestamp]("valid_to") shouldBe ts(10)
    assert(got(1).isNullAt(got(1).fieldIndex("valid_to")))
  }

  test("asOf sees only what the warehouse knew at knownAt") {
    // world state at day 12: v=200 (changed day 10) — but on day 12 the
    // warehouse had not yet recorded it, so it still believes v=100
    val believed = Bitemporal.asOf(versions, "k",
      lit(ts(12)), lit(ts(12))).collect().head
    believed.getAs[Long]("v") shouldBe 100L
    // a week later the late fact has arrived: same validAt now reads 200
    val later = Bitemporal.asOf(versions, "k",
      lit(ts(12)), lit(ts(20))).collect().head
    later.getAs[Long]("v") shouldBe 200L
  }

  test("asOf before any recording returns nothing") {
    Bitemporal.asOf(versions, "k", lit(ts(12)),
      lit(Timestamp.valueOf("2023-12-30 00:00:00"))).count() shouldBe 0L
  }

  test("asOf validAt before the first change returns nothing") {
    Bitemporal.asOf(versions, "k", lit(Timestamp.valueOf(
      "2023-12-25 00:00:00")), lit(ts(20))).count() shouldBe 0L
  }

  // -------------------------------------------- pennyAllocate

  test("allocations reconcile to the target per group") {
    val df = Seq(
      ("o1", 100L, 33L, 1), ("o1", 100L, 33L, 2), ("o1", 100L, 34L, 3),
      ("o2", 7L, 1L, 1), ("o2", 7L, 1L, 2), ("o2", 7L, 1L, 3))
      .toDF("g", "t", "w", "tb")
    val got = Allocation.pennyAllocate(df, Seq("g"), col("t"), col("w"),
      Seq(col("tb"))).collect()
    got.filter(_.getString(0) == "o1").map(_.getAs[Long]("alloc")).sum shouldBe 100L
    got.filter(_.getString(0) == "o2").map(_.getAs[Long]("alloc")).sum shouldBe 7L
  }

  test("proration is proportional and remainder goes to biggest share") {
    val df = Seq(("g", 10L, 2L, 1), ("g", 10L, 1L, 2))
      .toDF("g", "t", "w", "tb")
    val got = Allocation.pennyAllocate(df, Seq("g"), col("t"), col("w"),
      Seq(col("tb"))).collect()
      .map(r => r.getAs[Int]("tb") -> r.getAs[Long]("alloc")).toMap
    // exact thirds: 6.67 and 3.33 -> 7 and 3
    got(1) shouldBe 7L
    got(2) shouldBe 3L
  }

  test("zero-weight groups are dropped, zero-weight rows get zero") {
    val df = Seq(("dead", 10L, 0L, 1), ("live", 10L, 0L, 1),
      ("live", 10L, 5L, 2)).toDF("g", "t", "w", "tb")
    val got = Allocation.pennyAllocate(df, Seq("g"), col("t"), col("w"),
      Seq(col("tb"))).collect()
    got.map(_.getString(0)).distinct.toSeq shouldBe Seq("live")
    got.map(r => r.getAs[Int]("tb") -> r.getAs[Long]("alloc")).toMap shouldBe
      Map(1 -> 0L, 2 -> 10L)
  }
}
