package graft.api

import graft.nlp.Cleaner

/** §2.7 — the reference's FastAPI service surface (api.py:210-311) as a
  * pure-Scala core: `clean` is POST /clean's _clean_one, `cleanBatch` is
  * POST /clean/batch. The batch DataFrame form of the same computation is
  * the registered n10_nlp_columns query; this module exists so a caller
  * can embed the cleaner without a SparkSession (the reference's n=1
  * interactive path needs no cluster).
  */
object CleanApi {

  case class CleanResult(
      mainLocation: String,
      allLocations: Seq[String],
      tripType: String,
      processingMs: Double)

  /** POST /clean — one messy trip string → structured result. */
  def clean(text: String): CleanResult = {
    val t0 = System.nanoTime()
    val detected = Cleaner.extractAllLocations(text)
    val main =
      if (detected.nonEmpty) detected.head
      else Cleaner.extractMainLocation(text)
    val tripType = Cleaner.categorizeTripType(text, detected)
    CleanResult(main, detected, tripType, (System.nanoTime() - t0) / 1e6)
  }

  /** POST /clean/batch — sequential map (Spark form: n10_nlp_columns). */
  def cleanBatch(texts: Seq[String]): Seq[CleanResult] = texts.map(clean)

  private def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** CLI analog of the endpoint: `runMain graft.api.CleanApi <text…>`
    * prints one JSON result per argument. */
  def main(args: Array[String]): Unit = {
    args.foreach { text =>
      val r = clean(text)
      println(s"""{"main_location": ${js(r.mainLocation)}, """ +
        s""""all_locations": [${r.allLocations.map(js).mkString(", ")}], """ +
        s""""trip_type": ${js(r.tripType)}, """ +
        f""""processing_ms": ${r.processingMs}%.3f}""")
    }
  }
}
