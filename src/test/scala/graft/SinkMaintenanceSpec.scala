package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** File-maintenance sinks: dynamic day-partition overwrite and small-file
  * compaction. */
class SinkMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("writeDayPartitioned: rewriting one day leaves the others intact") {
    val path = Files.createTempDirectory("graft_daypart").toString
    val day1 = Seq((1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 11:00:00"), "b"))
    val day2 = Seq((3L, ts("2024-01-02 10:00:00"), "c"))
    Scale.writeDayPartitioned((day1 ++ day2).toDF("id", "ts", "v"),
      path, "ts")
    // re-load ONLY day 2 with different content
    Scale.writeDayPartitioned(
      Seq((9L, ts("2024-01-02 12:00:00"), "z")).toDF("id", "ts", "v"),
      path, "ts")
    val back = spark.read.parquet(path)
      .select($"id", $"v").as[(Long, String)].collect().toSet
    // day 1 rows survive; day 2 fully replaced (3L gone, 9L present)
    back shouldBe Set((1L, "a"), (2L, "b"), (9L, "z"))
  }

  test("writeDayPartitioned is idempotent for the same input") {
    val path = Files.createTempDirectory("graft_daypart2").toString
    val rows = Seq((1L, ts("2024-03-05 00:30:00"), "x"),
      (2L, ts("2024-03-06 00:30:00"), "y"))
    Scale.writeDayPartitioned(rows.toDF("id", "ts", "v"), path, "ts")
    Scale.writeDayPartitioned(rows.toDF("id", "ts", "v"), path, "ts")
    spark.read.parquet(path).count() shouldBe 2L
  }

  test("compact: many small files become few, content unchanged") {
    val src = Files.createTempDirectory("graft_compact_src").toString
    val dest = Files.createTempDirectory("graft_compact_dst").toString
    // 40 files of ~25 rows each
    (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .repartition(40).write.mode("overwrite").parquet(src)
    val (before, after) = Scale.compact(spark, src, dest,
      targetRowsPerFile = 500L)
    before shouldBe 40L
    after shouldBe 2L
    val a = spark.read.parquet(src).as[(Long, String)].collect().toSet
    val b = spark.read.parquet(dest).as[(Long, String)].collect().toSet
    b shouldBe a
  }

  test("compact: never fewer than one file") {
    val src = Files.createTempDirectory("graft_compact_s2").toString
    val dest = Files.createTempDirectory("graft_compact_d2").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(src)
    val (_, after) = Scale.compact(spark, src, dest, 1000000L)
    after shouldBe 1L
  }
}
