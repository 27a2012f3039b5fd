package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nlp.{Cleaner, Goldens}

/** Q4 — the master transform (reference Main.py:362-439): P1-P10 coercions
  * and scalar transforms plus the N10-N12 NLP columns, in the reference's
  * column order.
  *
  * Scale design: the NLP functions are row-wise UDFs in the reference
  * (pandas .apply — its bottleneck). Here they run once per DISTINCT
  * end_location string (dedup-before-UDF, SURVEY §4), and the tiny
  * resolved dimension is joined back (AQE broadcasts it). NLP cost is
  * O(|distinct strings|), not O(rows) — at 100 TB the distinct location
  * strings are bounded by vocabulary, not data volume. Everything else is
  * built-in, codegen'd expressions.
  */
object Transform {

  private val fillStr: Column => Column = c =>
    when(c.isNull || c === "nan", "").otherwise(c)

  /** pandas to_numeric(errors='coerce').fillna(0): unparseable → 0, not
    * null (SURVEY §7.4 risk 2). */
  private def coerceLong(colName: String): Column =
    coalesce(expr(s"try_cast($colName as bigint)"), lit(0L))

  /** Attach _locs / _main / _ttype via distinct-string NLP resolution. */
  def withResolvedLocations(trips: DataFrame): DataFrame = {
    val spark = trips.sparkSession
    import spark.implicits._
    val extractAllUdf = udf((s: String) => Cleaner.extractAllLocations(s))
    val extractMainUdf = udf((s: String) => Cleaner.extractMainLocation(s))
    val tripTypeUdf =
      udf((s: String, d: Seq[String]) => Cleaner.categorizeTripType(s, d))

    val base = trips.withColumn("_el", fillStr($"end_location"))
    val resolved = base.select($"_el").distinct()
      .withColumn("_locs", extractAllUdf($"_el"))
      .withColumn("_main",
        when(size($"_locs") > 0, element_at($"_locs", 1))
          .otherwise(extractMainUdf($"_el")))
      .withColumn("_ttype", tripTypeUdf($"_el", $"_locs"))
    // explicit hint: the distinct-strings dim is vocabulary-bounded and
    // must broadcast even when the fact side's source reports no
    // statistics (the DSv2 paged source in q5; parquet would broadcast
    // statically anyway)
    base.join(broadcast(resolved), "_el")
  }

  /** Memoized master per (session, sfDir): Q1-Q4 all consume it, so it is
    * built and persisted once (the reference materializes the same frame
    * to CSV before its analytics — this is the in-memory equivalent).
    * Cleared/unpersisted via [[graft.Caches]] at the end of a run. */
  def master(spark: SparkSession, sfDir: String): DataFrame =
    graft.Caches.memo(spark, s"master:$sfDir")(buildMaster(spark, sfDir))

  /** The full master transform from the raw trips frame. */
  private def buildMaster(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val trips = Trips.raw(spark, sfDir).filter($"confirm_status" === true) // P1
    val withNlp = withResolvedLocations(trips)

    val ts = try_to_timestamp($"date_str")

    withNlp
      .withColumn("km_start", coerceLong("km_start_str"))                // P3
      .withColumn("km_return", coerceLong("km_return_str"))
      .withColumn("entry_number", coerceLong("entry_number_str"))
      .withColumn("sale_price", coalesce($"sale_price_raw", lit(0.0)))
      .withColumn("date",                                                // P4+P9
        when(ts.isNull, "").otherwise(date_format(ts, "M/d/yyyy")))
      .withColumn("currency", fillStr($"currency"))                      // P5
      .withColumn("customer_name", fillStr($"customer_name"))
      .withColumn("driver_name", fillStr($"driver_name"))
      .withColumn("start_location", fillStr($"start_location"))
      .withColumn("reference_id", fillStr($"reference_id"))
      .withColumn("station", fillStr($"station"))
      .withColumn("receiver_name", fillStr($"receiver_name"))
      .withColumn("car_number", fillStr($"car_number"))
      .withColumn("Total_KM",                                            // P7
        when($"km_start" > 0 && $"km_return" > $"km_start",
          $"km_return" - $"km_start").otherwise(0L))
      .withColumn("Car_Num", {                                           // P8
        val digits = regexp_replace($"car_number", "[^\\p{Nd}]", "")
        val noZeros = ltrim(digits, "0")
        when(noZeros === "", "No Plate").otherwise(noZeros)
      })
      .withColumn("num_locations", size($"_locs").cast("long"))          // A1
      .withColumn("Location_1", try_element_at($"_locs", lit(1)))        // A2
      .withColumn("Location_2", try_element_at($"_locs", lit(2)))
      .withColumn("Location_3", try_element_at($"_locs", lit(3)))
      .withColumn("Location_4", try_element_at($"_locs", lit(4)))
      .withColumn("Location_5", try_element_at($"_locs", lit(5)))
      .withColumn("end_location_original", $"_el")
      .withColumn("end_location", $"_main")
      .withColumn("Trip_Type", $"_ttype")
      // P6: drop sensitive/unused (guest_name, payment_type) + internals
      .select($"trip_key", $"vid", $"trip_key".cast("string").as("#"),
        $"customer_name", $"date", $"sale_price", $"currency",
        $"driver_name", $"entry_number", $"start_location",
        $"end_location", $"reference_id", $"km_start", $"km_return",
        $"Total_KM", $"station", $"receiver_name", $"car_number",
        $"Car_Num", $"Trip_Type", $"num_locations", $"Location_1",
        $"Location_2", $"Location_3", $"Location_4", $"Location_5",
        $"end_location_original")
  }

  /** Q4 as a registered query: the 25 reference columns, ordered. */
  def q4Master(spark: SparkSession, sfDir: String): DataFrame =
    master(spark, sfDir).orderBy(col("trip_key")).drop("trip_key", "vid")

  /** The non-NLP half of the run-cycle record transform: P-op coercions
    * and the final projection over a frame that already carries the
    * resolved `_el`/`_locs`/`_main`/`_ttype` columns. Shared verbatim by
    * the batch q5 plan and the streaming tripCycle plan — only the NLP
    * ATTACHMENT differs between them. */
  private def tripRecordSelect(withNlp: DataFrame): DataFrame = {
    val ts = try_to_timestamp(col("date"))
    val kmS = coalesce(expr("try_cast(km_start as bigint)"), lit(0L))
    val kmR = coalesce(expr("try_cast(km_return as bigint)"), lit(0L))
    val digits = regexp_replace(fillStr(col("car_number")), "[^\\p{Nd}]", "")
    val noZeros = ltrim(digits, "0")
    withNlp.select(
      col("serialId"),
      when(ts.isNull, "").otherwise(date_format(ts, "M/d/yyyy")).as("date"),
      coalesce(col("sale_price"), lit(0.0)).as("sale_price"),
      col("entry.number").as("entry_number"),                         // P2
      kmS.as("km_start"), kmR.as("km_return"),
      when(kmS > 0 && kmR > kmS, kmR - kmS).otherwise(0L).as("Total_KM"),
      when(noZeros === "", "No Plate").otherwise(noZeros).as("Car_Num"),
      col("_main").as("end_location"),                                // N10
      col("_ttype").as("Trip_Type"),                                  // N12
      size(col("_locs")).cast("long").as("num_locations"))
  }

  /** Streaming form of the run-cycle record transform: NLP as per-row
    * UDFs, because a streaming plan can't run the batch distinct-strings
    * resolution (a blocking distinct+join per micro-batch defeats the
    * point; the dictionary is a closure constant either way and the
    * per-executor LRU in Cleaner bounds repeat work within a batch). */
  def tripRecordTransform(pages: DataFrame): DataFrame = {
    val extractAll = udf((s: String) => Cleaner.extractAllLocations(s))
    val extractMain = udf((s: String) => Cleaner.extractMainLocation(s))
    val tripType = udf((s: String, d: Seq[String]) =>
      Cleaner.categorizeTripType(s, d))
    tripRecordSelect(pages
      .filter(col("confirm_status") === true)                         // P1
      .withColumn("_el", fillStr(col("end_location")))                // P5
      .withColumn("_locs", extractAll(col("_el")))                    // N11
      .withColumn("_main",
        when(size(col("_locs")) > 0, element_at(col("_locs"), 1))
          .otherwise(extractMain(col("_el"))))
      .withColumn("_ttype", tripType(col("_el"), col("_locs"))))
  }

  /** q5 — the full reference cycle END TO END in batch: landed pages →
    * DSv2 paged source → record transform → ordered output, gated by the
    * DuckDB oracle (the streaming≡batch equivalence lives in
    * PagedSourceSpec). The batch form attaches the NLP columns with the
    * same dedup-before-UDF resolution as the q4 master — the UDF chain
    * runs once per DISTINCT end_location string and broadcasts back, so
    * at 100 TB the landed rows never enter a UDF. */
  def q5TripCycle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = graft.sources.PagedLanding.ensureLanded(spark, sfDir)
    val pages = spark.read.format("graft.sources.PagedJsonSource")
      .option("limit", graft.sources.PagedLanding.PageSize.toString)
      .load(dir)
    tripRecordSelect(
      withResolvedLocations(pages.filter($"confirm_status" === true)))
      .orderBy(col("serialId"))
  }

  /** Oracle: rebuild the landed fields from orders (same derivations as
    * the landing writer), NLP columns as golden CASE-by-vid lookups. */
  val q5TripCycleSql: String = {
    val g = Goldens
    val tsExpr = "TRY_CAST(date_str AS TIMESTAMP)"
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT
       |  trip_key AS serialId,
       |  CASE WHEN $tsExpr IS NULL THEN ''
       |       ELSE CAST(MONTH($tsExpr) AS VARCHAR) || '/' ||
       |            CAST(DAY($tsExpr) AS VARCHAR) || '/' ||
       |            CAST(YEAR($tsExpr) AS VARCHAR) END AS date,
       |  COALESCE(sale_price_raw, 0.0) AS sale_price,
       |  CAST(CASE WHEN trip_key % 19 = 18 THEN NULL
       |       ELSE (trip_key * 3) % 10000 END AS BIGINT) AS entry_number,
       |  COALESCE(TRY_CAST(km_start_str AS BIGINT), 0) AS km_start,
       |  COALESCE(TRY_CAST(km_return_str AS BIGINT), 0) AS km_return,
       |  CASE WHEN COALESCE(TRY_CAST(km_start_str AS BIGINT), 0) > 0
       |        AND COALESCE(TRY_CAST(km_return_str AS BIGINT), 0) >
       |            COALESCE(TRY_CAST(km_start_str AS BIGINT), 0)
       |       THEN COALESCE(TRY_CAST(km_return_str AS BIGINT), 0) -
       |            COALESCE(TRY_CAST(km_start_str AS BIGINT), 0)
       |       ELSE 0 END AS Total_KM,
       |  CASE WHEN NULLIF(LTRIM(REGEXP_REPLACE(COALESCE(car_number, ''), '[^\\p{Nd}]', '', 'g'), '0'), '') IS NULL
       |       THEN 'No Plate'
       |       ELSE LTRIM(REGEXP_REPLACE(COALESCE(car_number, ''), '[^\\p{Nd}]', '', 'g'), '0') END AS Car_Num,
       |  ${Trips.caseByVid(g.mainLocation)} AS end_location,
       |  ${Trips.caseByVid(g.tripType)} AS Trip_Type,
       |  CAST(${Trips.caseByVidInt(g.allLocations.map(_.size))} AS BIGINT) AS num_locations
       |FROM trips WHERE confirm_status ORDER BY serialId""".stripMargin
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB CTEs: trips AS (...), master AS (...) — NLP columns are golden
    * CASE-by-vid lookups (computed from the reference implementation by
    * scripts/goldens.py), everything else is equivalent SQL. */
  val masterSqlCtes: String = {
    val g = Goldens
    def locCaseN(i: Int): String = {
      val entries = g.allLocations.zipWithIndex.collect {
        case (ls, vid) if ls.size >= i => s"WHEN $vid THEN ${Trips.sq(ls(i - 1))}"
      }
      if (entries.isEmpty) "CAST(NULL AS VARCHAR)"
      else "CASE CAST(vid AS INT) " + entries.mkString(" ") +
        " ELSE CAST(NULL AS VARCHAR) END"
    }
    val tsExpr = "TRY_CAST(date_str AS TIMESTAMP)"
    s"""trips AS (
       |${Trips.rawSql}
       |), master AS (
       |SELECT
       |  trip_key, vid,
       |  CAST(trip_key AS VARCHAR) AS "#",
       |  customer_name,
       |  CASE WHEN $tsExpr IS NULL THEN ''
       |       ELSE CAST(MONTH($tsExpr) AS VARCHAR) || '/' ||
       |            CAST(DAY($tsExpr) AS VARCHAR) || '/' ||
       |            CAST(YEAR($tsExpr) AS VARCHAR) END AS date,
       |  COALESCE(sale_price_raw, 0.0) AS sale_price,
       |  CASE WHEN currency IS NULL OR currency = 'nan' THEN '' ELSE currency END AS currency,
       |  driver_name,
       |  COALESCE(TRY_CAST(entry_number_str AS BIGINT), 0) AS entry_number,
       |  COALESCE(start_location, '') AS start_location,
       |  ${Trips.caseByVid(g.mainLocation)} AS end_location,
       |  reference_id,
       |  COALESCE(TRY_CAST(km_start_str AS BIGINT), 0) AS km_start,
       |  COALESCE(TRY_CAST(km_return_str AS BIGINT), 0) AS km_return,
       |  CASE WHEN COALESCE(TRY_CAST(km_start_str AS BIGINT), 0) > 0
       |        AND COALESCE(TRY_CAST(km_return_str AS BIGINT), 0) >
       |            COALESCE(TRY_CAST(km_start_str AS BIGINT), 0)
       |       THEN COALESCE(TRY_CAST(km_return_str AS BIGINT), 0) -
       |            COALESCE(TRY_CAST(km_start_str AS BIGINT), 0)
       |       ELSE 0 END AS Total_KM,
       |  COALESCE(station, '') AS station,
       |  CASE WHEN receiver_name IS NULL OR receiver_name = 'nan' THEN '' ELSE receiver_name END AS receiver_name,
       |  COALESCE(car_number, '') AS car_number,
       |  CASE WHEN NULLIF(LTRIM(REGEXP_REPLACE(COALESCE(car_number, ''), '[^\\p{Nd}]', '', 'g'), '0'), '') IS NULL
       |       THEN 'No Plate'
       |       ELSE LTRIM(REGEXP_REPLACE(COALESCE(car_number, ''), '[^\\p{Nd}]', '', 'g'), '0') END AS Car_Num,
       |  ${Trips.caseByVid(g.tripType)} AS Trip_Type,
       |  CAST(${Trips.caseByVidInt(g.allLocations.map(_.size))} AS BIGINT) AS num_locations,
       |  ${locCaseN(1)} AS Location_1,
       |  ${locCaseN(2)} AS Location_2,
       |  ${locCaseN(3)} AS Location_3,
       |  ${locCaseN(4)} AS Location_4,
       |  ${locCaseN(5)} AS Location_5,
       |  COALESCE(end_location, '') AS end_location_original
       |FROM trips WHERE confirm_status
       |)""".stripMargin
  }

  val q4MasterSql: String =
    s"""WITH $masterSqlCtes
       |SELECT "#", customer_name, date, sale_price, currency, driver_name,
       |  entry_number, start_location, end_location, reference_id, km_start,
       |  km_return, Total_KM, station, receiver_name, car_number, Car_Num,
       |  Trip_Type, num_locations, Location_1, Location_2, Location_3,
       |  Location_4, Location_5, end_location_original
       |FROM master ORDER BY trip_key""".stripMargin
}
