package graft

import org.apache.spark.sql.functions._

/** graft.expressions.SortedCommonCount: equality with
  * size(array_intersect) on sorted distinct arrays, null handling, and
  * SQL registration. */
class SortedCommonCountSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.register(spark)

  private def common(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("native", call_function("sorted_common", $"a", $"b"))
    .withColumn("ref", org.apache.spark.sql.functions
      .size(array_intersect($"a", $"b")).cast("long"))

  test("matches size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),          // partial overlap
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),          // identical
      (Seq(1L, 2L), Seq(3L, 4L)),                  // disjoint
      (Seq.empty[Long], Seq(1L)),                  // empty left
      (Seq(-5L, 0L, Long.MaxValue), Seq(Long.MinValue, -5L, Long.MaxValue)),
      (Seq(1L), Seq.empty[Long])                   // empty right
    ).toDF("a", "b")
    common(df).collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"row $r")
    }
  }

  test("random sorted-distinct arrays agree with array_intersect") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200) {
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    common(rows.toDF("a", "b")).collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(3), s"row $r")
    }
  }

  test("NULL array yields NULL; null elements match iff on both sides") {
    val df = Seq(
      (Some(Seq(Some(1L), Some(2L), None)), Some(Seq(Some(2L), None))),
      (Some(Seq(Some(1L), None)), Some(Seq(Some(2L), Some(3L)))),
      (None, Some(Seq(Some(1L))))
    ).toDF("a", "b")
      .withColumn("native", call_function("sorted_common", $"a", $"b"))
    val got = df.select($"native").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // row 1: common 2 plus the shared null = 2; row 2: no overlap, null
    // only on one side = 0; row 3: NULL array
    assert(got.toSeq == Seq(Some(2L), Some(0L), None))
  }

  test("resolves from SQL and survives codegen") {
    val got = spark.sql(
      "SELECT sorted_common(array(1L, 5L, 9L), array(5L, 9L, 12L)) AS c")
      .as[Long].head()
    assert(got == 2L)
  }
}
