package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nlp.{Goldens, Locations, Normalize}

/** N6/N7 — tier-1 (exact) and tier-2 (combined regex) location resolution
  * as a PURE-relational pipeline: no UDFs anywhere, every step a built-in
  * codegen'd expression, the dictionary folded in as a literal map
  * (equivalent to a broadcast dim, but free — it lives in the plan).
  *
  * Pipeline per token: scrub round-trip markers → split/trim/filter →
  * posexplode → normalize (regexp chain) → exact map hit, else regex
  * capture + map hit, else retry both on the op-prefix-stripped token →
  * regroup ordered by token position with order-preserving dedup.
  *
  * This is the extract_all_locations dataflow with the fuzzy tier turned
  * off (the fuzzy tier is inherently procedural; Transform keeps it in a
  * UDF applied after tiers 1-2 miss). At 100 TB the regex/dict chain runs
  * once per DISTINCT location string (dedup-before-NLP, same design as
  * the master transform: the distinct strings are bounded by vocabulary,
  * not data volume) and the resolved dimension broadcasts back onto the
  * fact rows — trip rows never enter the token explode.
  */
object LocationResolve {

  /** The variant→canonical dictionary as a map literal Column. */
  private def dictMap = {
    val entries = Locations.variantRows.flatMap { case (v, c) => Seq(lit(v), lit(c)) }
    map(entries: _*)
  }

  def tier12Locations(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val trips = Trips.raw(spark, sfDir)
    val el = when($"end_location".isNull || $"end_location" === "nan", "")
      .otherwise($"end_location")
    val withEl = trips.withColumn("_el", el)

    // the whole regex/dict chain runs on the distinct strings only
    val scrubbed = regexp_replace(trim($"_el"), Locations.roundTripPattern, " ")
    val toks = filter(
      transform(split(scrubbed, Locations.tokenSplitPattern), trim(_)),
      t => t =!= "")
    val exploded = withEl.select($"_el").distinct()
      .select($"_el", posexplode_outer(toks).as(Seq("pos", "tok")))
      .withColumn("norm", Normalize.normalizeCol($"tok"))
      .withColumn("stripped",
        trim(regexp_replace($"tok", "(?U)" + Locations.opPrefixPattern, "")))
      .withColumn("strippedNorm", Normalize.normalizeCol($"stripped"))

    def resolve(norm: org.apache.spark.sql.Column) = coalesce(
      try_element_at(dictMap, norm),                                    // N6
      try_element_at(dictMap,
        nullif(regexp_extract(norm, Locations.combinedPattern, 1), lit("")))) // N7

    val resolved = exploded.withColumn("loc",
      coalesce(
        resolve($"norm"),
        when($"stripped" =!= "", resolve($"strippedNorm"))))

    val dim = resolved
      .filter($"loc".isNotNull)
      .groupBy($"_el")
      .agg(array_distinct(transform(
        array_sort(collect_list(struct($"pos", $"loc"))),
        s => s.getField("loc"))).as("locs"))

    withEl.select($"trip_key", $"vid", $"_el")
      .join(broadcast(dim), Seq("_el"), "left")
      .select($"trip_key", $"vid",
        coalesce(array_join($"locs", "|"), lit("")).as("locations"),
        coalesce(size($"locs"), lit(0)).cast("long").as("n_locations"))
      .orderBy($"trip_key")
  }

  val tier12Sql: String =
    s"""WITH trips AS (
       |${Trips.rawSql}
       |)
       |SELECT trip_key, vid,
       |  ${Trips.caseByVid(Goldens.tier12Locations.map(_.mkString("|")))} AS locations,
       |  CAST(${Trips.caseByVidInt(Goldens.tier12Locations.map(_.size))} AS BIGINT) AS n_locations
       |FROM trips ORDER BY trip_key""".stripMargin
}
