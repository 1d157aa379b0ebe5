package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.streaming.StreamOps

class ProfileAndStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column with null/distinct/min/max") {
    val df = Seq(
      (1, Some("a"), 1.5), (2, None, -0.5), (3, Some("b"), 2.5)
    ).toDF("id", "s", "v")
    val p = Quality.profile(df, Seq("id", "s", "v"))
      .orderBy("column_name").collect()
    p.length shouldBe 3
    val s = p.find(_.getString(0) == "s").get
    s.getAs[Long]("n_present") shouldBe 2
    s.getAs[Long]("n_null") shouldBe 1
    s.getAs[Long]("n_distinct") shouldBe 2
    s.getAs[String]("min_value") shouldBe "a"
    s.getAs[String]("max_value") shouldBe "b"
    // one scan: exactly one aggregate over the source, no union of scans
    val scans = Quality.profile(df, Seq("id", "s", "v"))
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        case s if s.getClass.getSimpleName.contains("Relation") => s
      }
    scans.length shouldBe 1
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join buffers with watermarks and joins in-window") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = StreamOps.intervalJoin(
      clicks.toDF.toDF("user", "click_ts"),
      buys.toDF.toDF("buyer", "buy_ts").withColumnRenamed("buyer", "user"),
      "user", "click_ts", "buy_ts", "1 minute", withinSec = 600)
    val q = joined
      .select(col("click_ts"), col("buy_ts"))
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()

    clicks.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:00")))
    buys.addData((1L, ts("2024-01-01 00:05:00")),  // in window
      (2L, ts("2024-01-01 00:20:00")))             // outside 10 min
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssjoin").collect()
    rows.length shouldBe 1
    rows.head.getTimestamp(1) shouldBe ts("2024-01-01 00:05:00")
  }
}
