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

  val Version = "0.2"

  /** GET /health (api.py:251-261) — readiness: the location dictionary is
    * loaded and the cleaner answers a smoke call. */
  def health(): Map[String, String] = {
    val dictLoaded = graft.nlp.Locations.variantRows.nonEmpty
    val cleanerOk =
      try { clean("مطار"); true } catch { case _: Throwable => false }
    Map(
      "status" -> (if (dictLoaded && cleanerOk) "healthy" else "degraded"),
      "version" -> Version,
      "dictionary_loaded" -> dictLoaded.toString,
      "cleaner_ok" -> cleanerOk.toString)
  }

  case class RunStats(records: Long, queriesOk: Int, queriesFailed: Int,
      status: String, finishedAtMs: Long, durationMs: Long)

  /** The reference's `_last_stats` global (api.py:354-359): the run-cycle
    * driver (graft.Verify) records its outcome here; /stats reads it. */
  private val lastRun =
    new java.util.concurrent.atomic.AtomicReference[Option[RunStats]](None)

  def recordRun(r: RunStats): Unit = lastRun.set(Some(r))

  /** Test hook: lastRun is process-global mutable state (the reference's
    * `_last_stats`), so a spec asserting the pristine "no_runs_yet"
    * response must reset it first — otherwise the test is order- and
    * rerun-dependent (it would fail after any suite that runs Verify in
    * the same JVM). */
  private[graft] def resetStatsForTest(): Unit = lastRun.set(None)

  /** GET /stats (api.py:370-382) — last run-cycle record count + status. */
  def stats(): Map[String, String] = lastRun.get() match {
    case None => Map("status" -> "no_runs_yet")
    case Some(r) => Map(
      "status" -> r.status,
      "records" -> r.records.toString,
      "queries_ok" -> r.queriesOk.toString,
      "queries_failed" -> r.queriesFailed.toString,
      "finished_at_ms" -> r.finishedAtMs.toString,
      "duration_ms" -> r.durationMs.toString)
  }

  private def js(s: String): String = graft.Fs.jsonQuote(s)

  /** CLI analog of the endpoint: `runMain graft.api.CleanApi <text…>`
    * prints one JSON result per argument. */
  def main(args: Array[String]): Unit = {
    args.foreach { text =>
      val r = clean(text)
      // Locale.ROOT: a default-locale format renders comma decimals on
      // e.g. de_DE JVMs — invalid JSON (the Bench record's lesson)
      val ms = String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(r.processingMs))
      println(s"""{"main_location": ${js(r.mainLocation)}, """ +
        s""""all_locations": [${r.allLocations.map(js).mkString(", ")}], """ +
        s""""trip_type": ${js(r.tripType)}, """ +
        s""""processing_ms": $ms}""")
    }
  }
}
