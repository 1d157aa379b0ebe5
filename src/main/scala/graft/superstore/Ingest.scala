package graft.superstore

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Quirk-tolerant Superstore CSV ingest (SURVEY §1.4, §2.1 S1-S3).
  *
  * The reference's raw layer (`SQLproject1.sql:82-127`) BULK INSERTs the CSV
  * into an all-NVARCHAR table and lets later stages deal with the mess. The
  * file's documented quirks, each handled here as an explicit, testable step:
  *
  *  1. every line ends with a spurious `;` before CRLF (incl. the header —
  *     the Excel path's last column is literally named `Profit;`);
  *  2. 2,510 rows are wrapped entirely in quotes with inner quotes doubled
  *     (a CSV row embedded as one quoted field) — the Excel path silently
  *     drops all of them (`recordCount="7484"`); we unwrap instead;
  *  3. product names contain embedded commas inside quotes;
  *  4. stray 0xA0 bytes → decoded as windows-1252 (NBSP), not UTF-8;
  *  5. CRLF line endings.
  *
  * Default mode = documented INTENT (all 9,994 rows parse, real dates).
  * `excelCompat = true` reproduces the workbook's lossy behavior (drops the
  * fully-quoted rows) for differential testing against the pivot numbers.
  *
  * Scale shape: the file is read distributed (CSV source with quoting
  * disabled = one string column per line), the repair is a codegen'd column
  * expression chain, and the parse is `from_csv` — no driver-side loops, no
  * collect; the same plan works on a 100 TB pile of equally-messy files.
  */
object Ingest {

  /** The 21 physical header columns (Row ID is dropped downstream,
    * matching `SQLproject1.sql:82-106` / Power Query `Removed Columns`). */
  val rawColumns: Seq[String] = Seq(
    "RowID", "OrderID", "OrderDate", "ShipDate", "ShipMode", "CustomerID",
    "CustomerName", "Segment", "Country", "City", "State", "PostalCode",
    "Region", "ProductID", "Category", "SubCategory", "ProductName",
    "Sales", "Quantity", "Discount", "Profit")

  val rawSchema: StructType =
    StructType(rawColumns.map(StructField(_, StringType, nullable = true)))

  /** Read raw lines distributed, with cp1252 decoding and quoting disabled
    * so the wrapped-row quirk survives to the repair step. */
  private def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\u0001")      // never occurs: whole line -> one column
      .option("quote", "\u0000")    // disable quote handling at line level
      // cp1252 proper is not in Spark 4's CSV charset allowlist; the file's
      // only non-ASCII byte is 0xA0 (NBSP), where latin-1 == cp1252
      .option("encoding", "iso-8859-1")
      .option("lineSep", "\n")
      .csv(path)
      .toDF("line")

  /** Raw layer: all-string columns + audit columns (S3), header skipped.
    *
    * @param excelCompat reproduce the workbook's `QuoteStyle.None` data loss
    *                    (drop the fully-quoted rows) instead of repairing.
    */
  def readRaw(spark: SparkSession, path: String,
              excelCompat: Boolean = false): DataFrame = {
    val lines = readLines(spark, path)
      .withColumn("source_file", input_file_name())
      .filter(!col("line").startsWith("Row ID")) // header
    val kept =
      if (excelCompat) lines.filter(!col("line").rlike("^\""))
      else lines

    val noCr = regexp_replace(col("line"), "\r$", "")
    val noSemi = regexp_replace(noCr, ";$", "")
    // A wrapped row is the WHOLE line as one quoted field (inner quotes
    // doubled). Detect it structurally, not by `^"[0-9]` (which would also
    // fire on a normal row whose legitimately-quoted first field starts
    // with a digit): after collapsing doubled quotes, a fully-wrapped line
    // is left with exactly its two OUTER quotes — first and last character,
    // none interior. Requiring the positions (not just the count of 2)
    // keeps the repair off legitimate rows whose quotes also collapse to
    // two but not at both ends — e.g. a quoted first field plus a
    // quoted-empty last field (`"a",...,""` -> `"a",...,`).
    val undoubled = regexp_replace(noSemi, "\"\"", "")
    val isWrapped = noSemi.startsWith("\"") && noSemi.endsWith("\"") &&
      length(noSemi) > 1 &&
      undoubled.startsWith("\"") && undoubled.endsWith("\"") &&
      length(undoubled) > 1 &&
      !undoubled.substr(lit(2), length(undoubled) - 2).contains("\"")
    val repaired = when(isWrapped,
        regexp_replace(
          noSemi.substr(lit(2), length(noSemi) - 2), "\"\"", "\""))
      .otherwise(noSemi)

    kept
      .withColumn("__fixed", repaired)
      .withColumn("__parsed", from_csv(col("__fixed"), rawSchema,
        Map("sep" -> ",", "quote" -> "\"", "escape" -> "\"",
            "mode" -> "PERMISSIVE")))
      .select(col("__parsed.*"), col("source_file"))
      .withColumn("ingested_at", current_timestamp())
  }
}
