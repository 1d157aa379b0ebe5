package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) ingest with corrupt-record quarantine —
  * the arrival format of crawl/export corpora, and the same
  * never-drop-silently posture as the CSV path (superstore.Ingest,
  * SURVEY §1.4): a malformed line must surface in a quarantine frame, not
  * vanish.
  *
  * Implementation: `spark.read.text` + `from_json` with an explicit
  * corrupt-record field, NOT the json datasource's internal corrupt
  * column — Spark disallows queries that reference only that internal
  * column (the quarantine branch is exactly such a query), while
  * `from_json` carries the raw line through as ordinary data. The text
  * reader is splittable (newline-framed), so a large drop parallelizes by
  * byte range; schema is REQUIRED (inference would scan the corpus twice
  * and type-drift across files).
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  final case class WithQuarantine(good: DataFrame, quarantined: DataFrame)

  /** Read `path` against `schema`; rows that fail to parse land in
    * `quarantined` with the raw line preserved. Both frames are filters
    * over one text scan + parse.
    *
    * Schema NULLABILITY is the required-field contract: `from_json`'s
    * PERMISSIVE mode flags structurally malformed JSON in the corrupt
    * column but silently NULLs a field whose value merely has the wrong
    * type — so a row whose non-nullable field parsed to NULL (absent key
    * or type drift) is quarantined too, never emitted null-padded. Mark a
    * field nullable to accept its absence. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): WithQuarantine = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already define $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // JSONL allows blank lines
      .select(col("value"),
        from_json(col("value"), withCorrupt).as("__j"))
    val requiredNull = schema.fields.filterNot(_.nullable)
      .map(f => col(s"__j.${f.name}").isNull)
      .foldLeft(lit(false))(_ || _)
    val bad = col(s"__j.$CorruptCol").isNotNull || requiredNull
    WithQuarantine(
      good = parsed.filter(!bad)
        .select(schema.fieldNames.toIndexedSeq.map(f => col(s"__j.$f")): _*),
      quarantined = parsed.filter(bad)
        .select(col("value").as("raw_line")))
  }
}
