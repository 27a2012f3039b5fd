package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nlp.Goldens

/** Q1-Q3 — the reference's analytics queries over the master table
  * (Main.py:221-310), as composed DataFrame programs.
  *
  * Determinism: the reference sorts on a single key with unstable ties
  * (pandas sort_values); we pin full tiebreakers on both sides.
  */
object Analytics {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** 2-decimal rounding spelled as floor(x·100 + 0.5)/100 on doubles —
    * every step is an exactly-rounded IEEE op, so Spark and DuckDB
    * produce the SAME BITS at every input. The engines' native
    * `round(x, 2)` differ at representation boundaries: Spark rounds
    * the double's shortest decimal string HALF_UP while DuckDB rounds
    * in binary, so e.g. a true quotient of 2.675 (stored as 2.67499…)
    * hashes 2.68 vs 2.67 across the two. Mirrored in the q1/q2 SQL. */
  private def round2(c: Column): Column = floor(c * 100 + 0.5) / 100

  private val round2Sql: String => String =
    e => s"FLOOR(($e) * 100 + 0.5) / 100"

  private def locArray: Column = array(
    col("Location_1"), col("Location_2"), col("Location_3"),
    col("Location_4"), col("Location_5"))

  /** Q1 — location-pairs analysis (A3 pair generator + G1 agg + G2
    * percent-of-total + G5 sort). Pairs are generated with array
    * higher-order functions (no UDTF, no driver loop): sorted valid
    * locations → all (i<j) combinations via transform+slice+flatten. */
  def q1LocationPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val multi = Transform.master(spark, sfDir).filter($"num_locations" >= 2) // A7
    val valid = array_sort(filter(locArray,
      x => x.isNotNull && trim(x) =!= "" && x =!= "Undefined"))
    val pairs = multi
      .withColumn("_locs_valid", valid)
      .filter(size($"_locs_valid") >= 2)
      .withColumn("_pairs", expr(
        """flatten(transform(_locs_valid, (x, i) ->
          |  transform(slice(_locs_valid, i + 2, size(_locs_valid) - i - 1),
          |            y -> struct(x AS a, y AS b))))""".stripMargin))
      .select($"sale_price", explode($"_pairs").as("p"))
      .select($"p.a".as("Location_A"), $"p.b".as("Location_B"), $"sale_price")
    val totalMulti = multi.agg(count(lit(1)).as("_total"))
    pairs
      .groupBy($"Location_A", $"Location_B")
      .agg(count(lit(1)).as("Frequency"), dsum($"sale_price").as("Total_Revenue"))
      .crossJoin(totalMulti)
      .withColumn("Percentage", round2($"Frequency" * 100.0 / $"_total"))
      .drop("_total")
      .orderBy($"Frequency".desc, $"Location_A", $"Location_B")
  }

  /** Q2 — location statistics (A4 unpivot + A5 filter + G3/G4 aggs). */
  def q2LocationStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val master = Transform.master(spark, sfDir)
    val melted = master
      .unpivot(
        Array(col("#"), col("sale_price"), col("Trip_Type"), col("date")),
        Array(col("Location_1"), col("Location_2"), col("Location_3"),
          col("Location_4"), col("Location_5")),
        "_loc_rank", "Location")                                         // A4
      .filter($"Location".isNotNull &&
        trim($"Location") =!= "" && $"Location" =!= "Undefined")         // A5
      .withColumn("Is_Primary", $"_loc_rank" === "Location_1")
    val totalRows = master.agg(count(lit(1)).as("_total"))
    melted
      .groupBy($"Location")
      .agg(
        count(lit(1)).as("Total_Visits"),                                // G3
        dsum($"sale_price").as("Total_Revenue"),
        sum(when($"Is_Primary", 1L).otherwise(0L)).as("Primary_Destination_Count"))
      .crossJoin(totalRows)
      .withColumn("Avg_Revenue_Per_Visit",
        round2($"Total_Revenue" / $"Total_Visits"))                      // G4
      .withColumn("Visit_Percentage",
        round2($"Total_Visits" * 100.0 / $"_total"))
      .drop("_total")
      .orderBy($"Total_Visits".desc, $"Location")                        // G5
  }

  /** Q3 — multi-location trip details (A6 route string + projection). */
  def q3MultiDetails(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Transform.master(spark, sfDir)
      .filter($"num_locations" >= 2)                                     // A7
      .withColumn("Trip_Route", concat_ws(" → ",
        col("Location_1"), col("Location_2"), col("Location_3"),
        col("Location_4"), col("Location_5")))                           // A6
      .orderBy($"trip_key")
      .select(col("#"), col("customer_name"), col("date"), col("sale_price"),
        col("num_locations"), col("Trip_Route"), col("Trip_Type"),
        col("Location_1"), col("Location_2"), col("Location_3"),
        col("Location_4"), col("Location_5"))
  }

  // ---------------------------------------------------------------- oracle

  private def longFormSql(from: String): String =
    (1 to 5).map { i =>
      s"""SELECT trip_key, sale_price, 'Location_$i' AS _loc_rank, Location_$i AS Location
         |FROM $from WHERE Location_$i IS NOT NULL AND TRIM(Location_$i) <> ''
         |  AND Location_$i <> 'Undefined'""".stripMargin
    }.mkString("\nUNION ALL\n")

  val q1Sql: String =
    s"""WITH ${Transform.masterSqlCtes},
       |multi AS (SELECT * FROM master WHERE num_locations >= 2),
       |longf AS (${longFormSql("multi")}),
       |pairs AS (
       |  SELECT a.trip_key, a.Location AS Location_A, b.Location AS Location_B,
       |         a.sale_price
       |  FROM longf a JOIN longf b
       |    ON a.trip_key = b.trip_key AND a.Location < b.Location)
       |SELECT Location_A, Location_B, COUNT(*) AS Frequency,
       |  CAST(SUM(CAST(sale_price AS DECIMAL(18,2))) AS DOUBLE) AS Total_Revenue,
       |  ${round2Sql("COUNT(*) * 100.0 / (SELECT COUNT(*) FROM multi)")} AS Percentage
       |FROM pairs GROUP BY Location_A, Location_B
       |ORDER BY Frequency DESC, Location_A, Location_B""".stripMargin

  val q2Sql: String =
    s"""WITH ${Transform.masterSqlCtes},
       |longf AS (${longFormSql("master")})
       |SELECT Location, COUNT(*) AS Total_Visits,
       |  CAST(SUM(CAST(sale_price AS DECIMAL(18,2))) AS DOUBLE) AS Total_Revenue,
       |  CAST(SUM(CASE WHEN _loc_rank = 'Location_1' THEN 1 ELSE 0 END) AS BIGINT) AS Primary_Destination_Count,
       |  ${round2Sql("CAST(SUM(CAST(sale_price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)")} AS Avg_Revenue_Per_Visit,
       |  ${round2Sql("COUNT(*) * 100.0 / (SELECT COUNT(*) FROM master)")} AS Visit_Percentage
       |FROM longf GROUP BY Location
       |ORDER BY Total_Visits DESC, Location""".stripMargin

  val q3Sql: String =
    s"""WITH ${Transform.masterSqlCtes}
       |SELECT "#", customer_name, date, sale_price, num_locations,
       |  CONCAT_WS(' → ', Location_1, Location_2, Location_3, Location_4,
       |            Location_5) AS Trip_Route,
       |  Trip_Type, Location_1, Location_2, Location_3, Location_4, Location_5
       |FROM master WHERE num_locations >= 2 ORDER BY trip_key""".stripMargin

  // ------------------------------------------- standalone NLP op queries

  /** n10/n11/n12 — per-trip NLP columns (UDF path, dedup-before-UDF). */
  def nlpColumns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val trips = Trips.raw(spark, sfDir)
    Transform.withResolvedLocations(trips)
      .select($"trip_key", $"vid",
        $"_main".as("main_location"),
        array_join($"_locs", "|").as("all_locations"),
        size($"_locs").cast("long").as("num_locations"),
        $"_ttype".as("trip_type"))
      .orderBy($"trip_key")
  }

  val nlpColumnsSql: String =
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT trip_key, vid,
       |  ${Trips.caseByVid(Goldens.mainLocation)} AS main_location,
       |  ${Trips.caseByVid(Goldens.allLocations.map(_.mkString("|")))} AS all_locations,
       |  CAST(${Trips.caseByVidInt(Goldens.allLocations.map(_.size))} AS BIGINT) AS num_locations,
       |  ${Trips.caseByVid(Goldens.tripType)} AS trip_type
       |FROM trips ORDER BY trip_key""".stripMargin

  /** N8-adjacent — built-in levenshtein (the edit-distance primitive the
    * fuzzy tier builds on). Oracle-checked on ASCII columns only: Spark
    * counts code points while DuckDB counts BYTES on multibyte UTF-8, so
    * Arabic comparisons are engine-specific (the Arabic fuzzy path is
    * golden-gated through the cleaner instead). */
  def levenshteinQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Trips.raw(spark, sfDir)
      .select($"trip_key", $"vid",
        levenshtein(coalesce($"station", lit("")),
          coalesce($"receiver_name", lit(""))).cast("long").as("edit_dist"))
      .orderBy($"trip_key")
  }

  val levenshteinSql: String =
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT trip_key, vid,
       |  CAST(levenshtein(COALESCE(station, ''),
       |                   COALESCE(receiver_name, '')) AS BIGINT) AS edit_dist
       |FROM trips ORDER BY trip_key""".stripMargin

  /** A3 via a native Generator (UDTF): the pair explosion as a custom
    * CollectionGenerator expression instead of the HOF formulation —
    * same semantics, one Generate node in the plan. */
  def pairsViaGenerator(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.CustomExprs.register(spark)
    val valid = array_sort(filter(locArray,
      x => x.isNotNull && trim(x) =!= "" && x =!= "Undefined"))
    Transform.master(spark, sfDir)
      .filter($"num_locations" >= 2)
      .withColumn("_locs_valid", valid)
      .filter(size($"_locs_valid") >= 2)
      .select($"trip_key",
        call_function("array_combinations2", $"_locs_valid"))
      .select($"trip_key", $"a".as("Location_A"), $"b".as("Location_B"))
      .orderBy($"trip_key", $"Location_A", $"Location_B")
  }

  val pairsViaGeneratorSql: String =
    s"""WITH ${Transform.masterSqlCtes},
       |multi AS (SELECT * FROM master WHERE num_locations >= 2),
       |longf AS (${longFormSql("multi")})
       |SELECT a.trip_key AS trip_key, a.Location AS Location_A,
       |  b.Location AS Location_B
       |FROM longf a JOIN longf b
       |  ON a.trip_key = b.trip_key AND a.Location < b.Location
       |ORDER BY a.trip_key, Location_A, Location_B""".stripMargin

  /** n01/n02 — normalization chains as built-in expressions. */
  def normalizeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Trips.raw(spark, sfDir)
      .select($"trip_key", $"vid",
        graft.nlp.Normalize.normalizeCol(coalesce($"end_location", lit(""))).as("normalized"),
        graft.nlp.Normalize.cleanTextCol($"end_location").as("cleaned"))
      .orderBy($"trip_key")
  }

  val normalizeSql: String =
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT trip_key, vid,
       |  ${Trips.caseByVid(Goldens.normalized)} AS normalized,
       |  ${Trips.caseByVid(Goldens.cleanText)} AS cleaned
       |FROM trips ORDER BY trip_key""".stripMargin

  /** n03 — round-trip scrub + tokenize via built-in split/filter. */
  def tokenizeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scrubbed = regexp_replace(trim(coalesce($"end_location", lit(""))),
      graft.nlp.Locations.roundTripPattern, " ")
    val toks = filter(
      transform(split(scrubbed, graft.nlp.Locations.tokenSplitPattern), trim(_)),
      t => t =!= "")
    Trips.raw(spark, sfDir)
      .select($"trip_key", $"vid",
        array_join(toks, "|").as("tokens"),
        size(toks).cast("long").as("n_tokens"))
      .orderBy($"trip_key")
  }

  val tokenizeSql: String =
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT trip_key, vid,
       |  ${Trips.caseByVid(Goldens.tokens.map(_.mkString("|")))} AS tokens,
       |  CAST(${Trips.caseByVidInt(Goldens.tokens.map(_.size))} AS BIGINT) AS n_tokens
       |FROM trips ORDER BY trip_key""".stripMargin
}
