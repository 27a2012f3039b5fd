package graft.nlp

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** N1/N2 Arabic text normalization (reference cleaner_v6.py:156-171,
  * 210-221), implemented twice with identical semantics:
  *
  *  - `normalize(s: String)`: pure Scala/JVM — used by the Cleaner UDFs and
  *    unit-testable without a SparkSession;
  *  - `normalizeCol(c: Column)`: a chain of built-in, codegen'd expressions
  *    (lower/regexp_replace/split/filter/array_join) — used by the
  *    relational resolution path so normalization runs inside whole-stage
  *    codegen with no UDF serialization cost.
  *
  * `(?U)` makes Java's \w/\b Unicode-aware, matching Python `re` semantics
  * on Arabic word characters.
  *
  * Steps, in reference order: trim+lower; Alef variants أإآٱ→ا; strip
  * Tatweel ـ; ى→ي; word-final ه→ة; strip diacritics; lam-alef ligatures→لا;
  * drop embedded EN stopwords; squeeze 3+ repeated chars→2; collapse
  * whitespace.
  */
object Normalize {

  val enStopwords: Set[String] = Set(
    "and", "or", "the", "to", "from", "at", "in", "of", "for",
    "a", "an", "by", "with", "via")

  private val pAlef      = Pattern.compile("[أإآٱ]")
  private val pTatweel   = Pattern.compile("ـ")
  private val pAlefMaqsura = Pattern.compile("ى")
  private val pFinalHa   = Pattern.compile("ه\\b", Pattern.UNICODE_CHARACTER_CLASS)
  private val pDiacritics = Pattern.compile("[\u064B-\u065F\u0670]")
  private val pLigatures = Pattern.compile("[\uFEF5-\uFEFC]")
  private val pSqueeze   = Pattern.compile("(.)\\1{2,}")
  private val pWs        = Pattern.compile("\\s+")

  /** N1 — full normalization, reference step order. */
  def normalize(text: String): String = {
    if (text == null) return ""
    // Locale.ROOT: default-locale lowercasing diverges under tr-TR
    // ("HILTON" → "hılton") from normalizeCol's locale-independent
    // Spark lower() and the reference's str.lower() — the tier-1
    // variant lookup would silently miss on such a JVM
    var t = text.trim.toLowerCase(java.util.Locale.ROOT)
    t = pAlef.matcher(t).replaceAll("ا")
    t = pTatweel.matcher(t).replaceAll("")
    t = pAlefMaqsura.matcher(t).replaceAll("ي")
    t = pFinalHa.matcher(t).replaceAll("ة")
    t = pDiacritics.matcher(t).replaceAll("")
    t = pLigatures.matcher(t).replaceAll("لا")
    t = t.split("\\s+").iterator
      .filter(w => w.nonEmpty && !enStopwords.contains(w))
      .mkString(" ")
    t = pSqueeze.matcher(t).replaceAll("$1$1")
    t = pWs.matcher(t).replaceAll(" ").trim
    t
  }

  /** N1 as built-in Column expressions (codegen'd; no UDF). */
  def normalizeCol(c: Column): Column = {
    var t: Column = lower(trim(c))
    t = regexp_replace(t, "[أإآٱ]", "ا")
    t = regexp_replace(t, "ـ", "")
    t = regexp_replace(t, "ى", "ي")
    t = regexp_replace(t, "(?U)ه\\b", "ة")
    t = regexp_replace(t, "[\u064B-\u065F\u0670]", "")
    t = regexp_replace(t, "[\uFEF5-\uFEFC]", "لا")
    val words = filter(
      split(t, "\\s+"),
      w => w =!= "" && !w.isInCollection(enStopwords))
    t = array_join(words, " ")
    t = regexp_replace(t, "(.)\\1{2,}", "$1$1")
    t = trim(regexp_replace(t, "\\s+", " "))
    t
  }

  private val pAlef2 = Pattern.compile("[أإآ]")
  private val pDiacritics2 = Pattern.compile("[\u064B-\u065F]")
  private val pPunct = Pattern.compile("[،؛,;:]")
  private val pBrackets = Pattern.compile("[\\(\\)\\[\\]{}]")

  /** N2 — lighter clean_text (cleaner_v6.py:210-221). */
  def cleanText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    var t = text.trim
    t = pAlef2.matcher(t).replaceAll("ا")
    t = pAlefMaqsura.matcher(t).replaceAll("ي")
    t = pDiacritics2.matcher(t).replaceAll("")
    t = pPunct.matcher(t).replaceAll(" ")
    t = pBrackets.matcher(t).replaceAll("")
    t = pWs.matcher(t).replaceAll(" ")
    t.trim
  }

  /** N2 as built-in Column expressions. */
  def cleanTextCol(c: Column): Column = {
    var t: Column = trim(c)
    t = regexp_replace(t, "[أإآ]", "ا")
    t = regexp_replace(t, "ى", "ي")
    t = regexp_replace(t, "[\u064B-\u065F]", "")
    t = regexp_replace(t, "[،؛,;:]", " ")
    t = regexp_replace(t, "[\\(\\)\\[\\]{}]", "")
    t = regexp_replace(t, "\\s+", " ")
    when(c.isNull, lit("")).otherwise(trim(t))
  }
}
