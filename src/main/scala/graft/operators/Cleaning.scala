package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String/typing normalization operators (SURVEY §2.2 P1-P3, P7, P10).
  *
  * Reference semantics: `NULLIF(LTRIM(RTRIM(col)),'')` trim + empty→NULL
  * (SQLproject1.sql:172-187), whitespace strip (:182), `TRY_CONVERT` safe
  * casts (:173-191), zero-pad normalization of numeric postal codes
  * (:430-435), and Power Query `Text.Trim`/`Text.Clean`.
  *
  * All are pure `Column` combinators over built-in functions — they stay
  * inside whole-stage codegen and push down through Catalyst.
  */
object Cleaning {

  /** P1: trim and convert empty strings to NULL. */
  def trimToNull(c: Column): Column = nullif(trim(c), lit(""))

  /** P2: remove all spaces, empty→NULL. */
  def stripSpacesToNull(c: Column): Column =
    nullif(regexp_replace(c, " ", ""), lit(""))

  /** P10: strip control characters (Power Query `Text.Clean`). */
  def cleanControlChars(c: Column): Column =
    regexp_replace(c, "\\p{Cntrl}", "")

  /** P3: safe cast — NULL on failure, never an error (`TRY_CONVERT`). */
  def tryCast(c: Column, to: DataType): Column = c.try_cast(to)

  /** P3: safe date parse with an explicit pattern (e.g. "M/d/yyyy"). */
  def tryToDate(c: Column, pattern: String): Column =
    to_date(try_to_timestamp(c, lit(pattern)))

  /** P7: if the value is numeric, zero-pad it to `width` digits (restores
    * leading zeros lost by spreadsheet round-trips); otherwise pass through. */
  def zeroPadNumeric(c: Column, width: Int): Column = {
    val asInt = c.try_cast(IntegerType)
    when(asInt.isNotNull, lpad(asInt.cast(StringType), width, "0")).otherwise(c)
  }

  /** P6: weekend flag from a date column. */
  def isWeekend(d: Column): Column =
    date_format(d, "EEEE").isin("Saturday", "Sunday")

  /** Canonical text-matching form for corpus text: NFC-normalize
    * (composed/decomposed variants of the same glyph become one string),
    * strip accents (NFD, drop combining marks, recompose), lowercase,
    * collapse whitespace runs to single spaces, trim. Two byte sequences
    * that a reader sees as the same text hash/join/dedup identically
    * afterwards — apply BEFORE paragraph hashing, exact dedup, or any
    * text-keyed join.
    *
    * All codegen'd scalar ops ([[graft.expressions.NormalizeUnicode]] +
    * built-in regexps): stays inside whole-stage codegen, no shuffle
    * implications. Matches DuckDB's
    * `lower(strip_accents(nfc_normalize(x)))` + whitespace collapse for
    * the differential oracle. Needs `GraftExtensions.register(spark)`
    * (or the extensions conf) in the analyzing session. */
  def normalizeText(c: Column): Column = {
    def norm(x: Column, form: String) =
      call_function("unicode_normalize", x, lit(form))
    // accent strip = decompose, drop combining marks, recompose
    val deaccented = norm(regexp_replace(norm(c, "NFD"),
      lit("\\p{M}"), lit("")), "NFC")
    trim(regexp_replace(lower(deaccented), lit("\\s+"), lit(" ")))
  }
}
