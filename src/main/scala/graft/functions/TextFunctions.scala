package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the LLM-data-pipeline surface
  * (SURVEY §7.7): tokenization, shingling, language-ID heuristics, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything is built from codegen'd higher-order array functions — no
  * UDFs, no explode unless an operator genuinely needs row expansion — so
  * the expressions stay inside whole-stage codegen and scale linearly with
  * document count.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Overlapping word n-gram shingles; empty array when the doc is shorter
    * than n words.
    *
    * Implementation note: built by zip_with-ing n shifted `slice`s of the
    * token array rather than `element_at(words, i+k)` inside a `transform`
    * lambda. Higher-order-function lambdas are interpreted (not codegen'd)
    * and re-evaluate any non-bound expression per ELEMENT — with an inline
    * tokenizer expression that meant re-tokenizing the document ~3n times.
    * The slice inputs are evaluated once per row, and the lambda only
    * concatenates its bound variables. */
  def wordShingles(words: Column, n: Int): Column = {
    require(n >= 2, "shingle size must be >= 2")
    val m = size(words) - (n - 1) // number of shingles
    val shifted = (0 until n).map(k => slice(words, lit(k + 1), m))
    val zipped = shifted.reduce((acc, next) =>
      zip_with(acc, next, (a, b) => concat(a, lit(" "), b)))
    when(size(words) >= n, zipped).otherwise(array().cast("array<string>"))
  }

  /** Language-marker stopword lists (tiny n-gram heuristic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"))

  /** Marker-hit count for one language. */
  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** English-ish stopword ratio (quality signal). */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  def stopwordRatio(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double") /
      nullif(size(toks), lit(0)).cast("double")

  /** Non-blank sentence segments (split on ./!/? runs). */
  def sentences(text: Column): Column =
    filter(split(text, "[.!?]+"), s => length(trim(s)) > 0)

  /** Heuristic syllable count for one word: vowel-group runs (the
    * standard dictionary-free approximation; y counts as a vowel). */
  def syllablesPerWord(word: Column): Column =
    size(regexp_extract_all(lower(word), lit("[aeiouy]+"), lit(0)))

  /** Total heuristic syllables over a token array — an exact integer
    * fold, so cross-engine safe. */
  def syllableCount(toks: Column): Column =
    aggregate(transform(toks, w => syllablesPerWord(w)),
      lit(0), (acc, v) => acc + v)

  /** BPE-ish token count: alpha runs, digit runs, single other non-space. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** Winnowing-lite fingerprint: lexicographic min of md5 over word 5-gram
    * shingles (falls back to md5 of the whole text for short docs). Robust
    * to local edits anywhere except around the minimal shingle. */
  def fingerprint(text: Column, shingleN: Int = 5): Column = {
    val toks = tokens(text)
    when(size(toks) >= shingleN,
      array_min(transform(wordShingles(toks, shingleN), s => md5(s))))
      .otherwise(md5(text))
  }
}
