package graft.nlp

import java.util.regex.Pattern

/** N8-N12 — the location cleaner: tiered lookup (exact → combined-regex →
  * fuzzy), location extraction and trip-type classification. Pure Scala /
  * JVM-only so it is unit-testable without a SparkSession and cheap to ship
  * in a UDF closure (reference cleaner_v6.py:78-320).
  *
  * Fuzzy tier reproduces rapidfuzz `token_sort_ratio` semantics: sort the
  * whitespace tokens of both strings, join with single spaces, then the
  * normalized indel similarity 100·(1 − dist/(len_a+len_b)) where dist is
  * the insert/delete edit distance (substitution = 2). Cutoff 82, strings
  * shorter than 3 skip fuzzy, first-wins on score ties, insertion order of
  * the variant index preserved (cleaner_v6.py:35-36,198-208).
  *
  * Scale note: callers should deduplicate before invoking these functions
  * (distinct location strings → resolve → broadcast-join back); the
  * per-executor memo cache below only smooths over residual repetition
  * inside a partition.
  */
object Cleaner {

  val FuzzyScoreCutoff = 82.0
  val FuzzyMinLen = 3

  private val pCombined = Pattern.compile(Locations.combinedPattern)
  private val pOpPrefix = Pattern.compile("(?U)" + Locations.opPrefixPattern)
  private val pRoundTrip = Pattern.compile(Locations.roundTripPattern)
  private val pAdmin = Pattern.compile("(?U)" + Locations.adminPattern)
  private val pAirport = Pattern.compile(Locations.airportPattern)
  private val pOpOnly = Pattern.compile(Locations.opOnlyPattern)
  private val pTokenSplit = Pattern.compile(Locations.tokenSplitPattern)
  private val pAllDigits = Pattern.compile("^\\d+$")

  private val variantKeys: Array[String] = Locations.variantIndex.keys.toArray

  /** Bounded per-JVM memo cache (reference uses lru_cache(8192)). */
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Option[String]](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[String]]): Boolean =
        size() > 8192
    })

  /** Indel (insert/delete only) edit distance — LCS-based. */
  def indelDistance(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val prev = new Array[Int](lb + 1)
    val cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      cur(0) = i
      val ca = a.charAt(i - 1)
      j = 1
      while (j <= lb) {
        cur(j) =
          if (ca == b.charAt(j - 1)) prev(j - 1)
          else 1 + math.min(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, lb + 1)
      i += 1
    }
    prev(lb)
  }

  /** rapidfuzz fuzz.token_sort_ratio (0..100). */
  def tokenSortRatio(s1: String, s2: String): Double = {
    val a = s1.split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    val b = s2.split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    val total = a.length + b.length
    if (total == 0) 100.0
    else 100.0 * (1.0 - indelDistance(a, b).toDouble / total)
  }

  /** N8 — fuzzy tier: best variant by token_sort_ratio ≥ cutoff. */
  def fuzzyLookup(norm: String): Option[String] = {
    var best: String = null
    var bestScore = 0.0
    var i = 0
    while (i < variantKeys.length) {
      val s = tokenSortRatio(norm, variantKeys(i))
      if (s >= FuzzyScoreCutoff && (best == null || s > bestScore)) {
        best = variantKeys(i); bestScore = s
      }
      i += 1
    }
    Option(best).map(Locations.variantIndex)
  }

  /** N9 — tiered lookup: exact → combined regex → fuzzy, memoized. */
  def lookupLocation(text: String): Option[String] = {
    if (text == null || text.isEmpty) return None
    val cached = memo.get(text)
    if (cached != null) return cached
    val norm = Normalize.normalize(text)
    val result: Option[String] =
      Locations.variantIndex.get(norm).orElse {
        val m = pCombined.matcher(norm)
        if (m.find()) Locations.variantIndex.get(m.group(1))
        else if (norm.length >= FuzzyMinLen) fuzzyLookup(norm)
        else None
      }
    memo.put(text, result)
    result
  }

  /** N4 — strip operational prefixes. */
  def stripOpPrefix(text: String): String =
    pOpPrefix.matcher(text).replaceAll("").trim

  /** N5 — scrub round-trip markers to a space. */
  def scrubRoundTrip(text: String): String =
    pRoundTrip.matcher(text).replaceAll(" ")

  /** N3 — tokenize on delimiters / standalone Arabic و. */
  def tokenize(text: String): Seq[String] =
    pTokenSplit.split(text).iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Python str.title() on the first two whitespace tokens. */
  private def titleFirstTwo(raw: String): String = {
    val words = raw.split("\\s+").filter(_.nonEmpty).take(2)
    if (words.isEmpty) return "Undefined"
    words.map { w =>
      val sb = new StringBuilder
      var prevAlpha = false
      w.foreach { ch =>
        val isAlpha = Character.isLetter(ch)
        sb.append(
          if (isAlpha && !prevAlpha) Character.toUpperCase(ch)
          else if (isAlpha) Character.toLowerCase(ch)
          else ch)
        prevAlpha = isAlpha
      }
      sb.toString
    }.mkString(" ")
  }

  /** N10 — main location: first token (±op-prefix) that resolves; fallback
    * Title-Cased first two words. */
  def extractMainLocation(text: String): String = {
    if (text == null || text.trim.isEmpty) return "Undefined"
    val raw = text.trim
    if (pAllDigits.matcher(raw).matches() || raw.length < 2) return "Unknown"
    val parts = tokenize(scrubRoundTrip(raw))
    for (part <- parts) {
      lookupLocation(part) match {
        case Some(loc) => return loc
        case None =>
          val stripped = stripOpPrefix(part)
          if (stripped.nonEmpty && stripped != part) {
            lookupLocation(stripped) match {
              case Some(loc) => return loc
              case None      =>
            }
          }
      }
    }
    titleFirstTwo(raw)
  }

  /** N11 — all locations, order-preserving dedup. */
  def extractAllLocations(text: String): Seq[String] = {
    if (text == null || text.trim.isEmpty) return Seq.empty
    val raw = text.trim
    val parts = tokenize(scrubRoundTrip(raw))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (part <- parts) {
      val loc = lookupLocation(part).orElse {
        val stripped = stripOpPrefix(part)
        if (stripped.nonEmpty) lookupLocation(stripped) else None
      }
      loc.foreach { l => if (!out.contains(l)) out += l }
    }
    out.toSeq
  }

  /** N12 — priority trip-type classifier. Preserves the reference's
    * observed behavior that any airport-regex match ⇒ "Airport Transfer"
    * (the Admin/Management branch under it is unreachable —
    * cleaner_v6.py:283-288, SURVEY §2.3 quirk note). */
  def categorizeTripType(text: String, detected: Seq[String]): String = {
    if (text == null || text.trim.isEmpty) return "Undefined"
    val raw = text.trim
    val rawLower = Normalize.normalize(raw)
    val det = if (detected == null) Seq.empty else detected

    if (det.contains("Invalid Data")) return "Invalid Data"
    if (pAirport.matcher(rawLower).find()) return "Airport Transfer"
    if (det.contains("Admin/Management")) return "Admin/Management"
    if (pAdmin.matcher(rawLower).find()) return "Admin/Management"
    if (det.contains("Airport")) return "Airport Transfer"
    if (pRoundTrip.matcher(raw).find()) return "Round Trip"
    if (det.contains("Nile Cruise")) return "Nile Cruise"
    if (Seq("كروز", "رحلة نيلية", "مركب").exists(rawLower.contains)) return "Nile Cruise"
    if (det.contains("Special Operations")) return "Special Operations"
    if (pOpOnly.matcher(rawLower).matches() ||
        pOpPrefix.matcher(rawLower).lookingAt()) return "Special Operations"
    if (det.size >= 2) return "Multi-Destination"
    "Standard Transfer"
  }
}
