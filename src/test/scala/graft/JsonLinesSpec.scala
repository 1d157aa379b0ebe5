package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.JsonLines

class JsonLinesSpec extends SparkSpec {
  import spark.implicits._

  // non-nullable doc_id = REQUIRED (absence or type drift quarantines);
  // nullable text = optional
  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private def write(lines: String*): String = {
    val f = java.nio.file.Files.createTempFile("jsonl_", ".jsonl")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("good rows parse, malformed rows are quarantined with the raw line") {
    val path = write(
      """{"doc_id": 1, "text": "hello"}""",
      """{"doc_id": 2, "text": "world"}""",
      """{"doc_id": 3 "text": "missing comma"}""", // malformed
      "",                                          // blank line: ignored
      """not json at all""")
    val out = JsonLines.readWithQuarantine(spark, path, schema)
    out.good.orderBy($"doc_id").as[(Long, String)].collect().toSeq shouldBe
      Seq((1L, "hello"), (2L, "world"))
    val quarantined = out.quarantined.as[String].collect()
    quarantined should have length 2
    quarantined should contain("not json at all")
    // nothing dropped silently: good + quarantined == non-blank input lines
    out.good.count() + out.quarantined.count() shouldBe 4
  }

  test("required-field type drift or absence quarantines the whole row") {
    // PERMISSIVE from_json silently NULLs a type-drifted field (no corrupt
    // record) - the non-nullable marker routes such rows to quarantine so
    // drift can't produce null-padded rows
    val path = write(
      """{"doc_id": "not-a-number", "text": "x"}""",
      """{"text": "doc_id missing"}""",
      """{"doc_id": 7}""", // optional text absent: fine
      """{"doc_id": 8, "text": "ok"}""")
    val out = JsonLines.readWithQuarantine(spark, path, schema)
    out.good.orderBy($"doc_id").as[(Long, Option[String])].collect()
      .toSeq shouldBe Seq((7L, None), (8L, Some("ok")))
    out.quarantined.count() shouldBe 2
  }

  test("schema already containing the corrupt column is rejected") {
    val bad = StructType(schema.fields :+
      StructField(JsonLines.CorruptCol, StringType))
    an[IllegalArgumentException] should be thrownBy
      JsonLines.readWithQuarantine(spark, "/tmp/nope.jsonl", bad)
  }
}
