package graft.nlp

import com.fasterxml.jackson.databind.ObjectMapper
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Location dictionary: canonical name → spelling variants, plus the
  * derived lookup structures the cleaner needs.
  *
  * Mirrors the reference dictionary shape (reference locations.json:1-27,
  * loader cleaner_v6.py:50-73). Order sensitivity is semantic and must be
  * preserved (SURVEY §7.4 risk 4):
  *   - the variant→canonical index is insertion-ordered with first-wins on
  *     normalized-key collisions (cleaner_v6.py:149-154);
  *   - the combined alternation regex lists variants longest-first so the
  *     longest alternative wins at a given position (cleaner_v6.py:98-103).
  *
  * At cluster scale this is a classic broadcast dimension: ~bytes of data
  * consulted by every row. We expose it both as a driver-side map (turned
  * into literal expressions / UDF closure state — free to ship, no shuffle)
  * and as a small DataFrame for the broadcast-join formulation.
  */
object Locations {

  /** S6 dictionary source — parse a locations JSON (same shape as the
    * reference file) using Jackson (already on the Spark classpath). */
  def parseJson(jsonText: String): ListMap[String, Seq[String]] = {
    val mapper = new ObjectMapper()
    val node = mapper.readTree(jsonText)
    var m = ListMap.empty[String, Seq[String]]
    node.properties().asScala.foreach { e =>
      m = m.updated(e.getKey, e.getValue.elements().asScala.map(_.asText()).toSeq)
    }
    m
  }

  /** The bundled dictionary (src/main/resources/locations.json). */
  lazy val master: ListMap[String, Seq[String]] = {
    val in = getClass.getResourceAsStream("/locations.json")
    require(in != null, "locations.json missing from classpath")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    parseJson(text)
  }

  /** N13 variant-index build: normalized variant → canonical, insertion
    * order, first-wins on collisions. */
  lazy val variantIndex: ListMap[String, String] = {
    var idx = ListMap.empty[String, String]
    for ((canonical, variants) <- master; v <- variants) {
      val norm = Normalize.normalize(v)
      if (!idx.contains(norm)) idx = idx.updated(norm, canonical)
    }
    idx
  }

  /** N7 combined alternation, variants sorted by length desc, with
    * Arabic/word boundary lookarounds ((?U) makes \w Unicode-aware like
    * Python's re). */
  lazy val combinedPattern: String = {
    val sorted = variantIndex.keys.toSeq.sortBy(-_.length)
    "(?U)(?<![ا-ي\\w])(" +
      sorted.map(java.util.regex.Pattern.quote).mkString("|") +
      ")(?![ا-ي\\w])"
  }

  /** N4 operational-prefix pattern (cleaner semantics: repeated leading
    * transport-operation terms are stripped before lookup). */
  val opPrefixPattern: String =
    "^(" +
      "تشغيل[هة]?\\s*|عملية\\s*|رحلة\\s*|" +
      "يومي[هة]\\s*|يومية\\s*|" +
      "نص\\s+يوم\\s*|نصف\\s+يوم\\s*|" +
      "يوم\\s+كامل\\s*|" +
      "\\d+\\s*ساع[هة]?\\s*|ساعتين\\s*|" +
      "ايجار\\s*|جولة\\s*|توصيلة\\s*" +
      ")+"

  /** N5 round-trip patterns (scrubbed to a space before tokenizing). */
  val roundTripPattern: String = Seq(
    "ذهاب\\s*[\\+و]\\s*عود[هة]",
    "ذ\\s*[\\+و]\\s*ع\\b",
    "\\+\\s*عود[هة]",
    "عود[هة]\\s*\\+",
    "\\bعود[هة]\\b",
    "\\bوعود[هة]\\b",
    "والعود[هة]",
  ).mkString("(?U)(?:", "|", ")")

  /** N12 admin/management markers. */
  val adminPattern: String =
    "ادار[هة]|الادار[هة]|تحصيل|فاتور[هة]|" +
      "خدم[هة]\\s*عملاء|عمليات|صيانة|" +
      "استاذ|مستر|دكتور|مهندس"

  /** N12 airport markers (case-insensitive). */
  val airportPattern: String =
    "(?iU)مطار|مطاار|airport|terminal|flight|استقبال|توصيل\\s*مطار"

  /** N12 operations-only matcher (whole-string). */
  val opOnlyPattern: String =
    "(?U)^(تشغيل[هة]?|يومي[هة]|يوم\\s*كامل|نص\\s*يوم|" +
      "ايجار|سيدان|فان|باص|تفويل|غسيل|صيانة|\\d+\\s*ساع)[\\s\\d\\+،,]*$"

  /** N3 tokenizer split pattern (delimiters or standalone Arabic "و"). */
  val tokenSplitPattern: String = "(?U)[+؛،,;]+|\\bو\\b"

  /** The dictionary as (variant_norm, canonical) rows for broadcast-join
    * formulations of tier-1 lookup. */
  def variantRows: Seq[(String, String)] = variantIndex.toSeq
}
