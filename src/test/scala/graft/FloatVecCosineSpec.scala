package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class FloatVecCosineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    GraftExtensions.register(spark)
    Seq(
      (0, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),   // identical
      (1, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (2, Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f)), // opposite
      (3, Array(0.3f, 0.7f, -0.2f), Array(0.9f, -0.1f, 0.4f))
    ).toDF("id", "a", "b")
  }

  test("native vec_cosine: known geometry") {
    val out = vecs.select($"id",
        call_function("vec_cosine", $"a", $"b").as("c"))
      .orderBy("id").as[(Int, Double)].collect().map(_._2)
    out(0) shouldBe 1.0 +- 1e-12
    out(1) shouldBe 0.0 +- 1e-12
    out(2) shouldBe -1.0 +- 1e-12
  }

  test("bit-identical to the HOF formulation (same fold order)") {
    val both = vecs.select(
      call_function("vec_cosine", $"a", $"b").as("native"),
      Similarity.cosine($"a", $"b").as("hof"))
    both.filter($"native" =!= $"hof").count() shouldBe 0
  }

  test("codegen and interpreted paths agree") {
    val codegenOff = vecs.sparkSession.sessionState.conf
    val before = codegenOff.getConfString("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = vecs.select(call_function("vec_cosine", $"a", $"b"))
        .as[Double].collect().toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = vecs.select(call_function("vec_cosine", $"a", $"b"))
        .as[Double].collect().toSeq
      interp shouldBe gen
    } finally spark.conf.set("spark.sql.codegen.wholeStage", before)
  }

  test("NULL propagation and SQL registration") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    df.select(call_function("vec_cosine", $"a", $"b"))
      .collect().head.isNullAt(0) shouldBe true
    // registered for SQL too
    vecs.createOrReplaceTempView("vecs_test")
    spark.sql("SELECT vec_cosine(a, b) FROM vecs_test").count() shouldBe 4
  }
}
