package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core over the star schema: aggregations, joins, windows,
  * set ops, top-k, rollup (SURVEY.md §2.5, §2.6).
  *
  * Determinism rules (oracle hash-parity, SURVEY §7.4):
  *  - every money/quantity SUM casts elements to decimal(18,2) first, so the
  *    sum is exact and order-independent, then the result is cast back to
  *    double (same nearest-double in Spark and DuckDB);
  *  - every output has a total ORDER BY with tiebreakers;
  *  - nullable sort keys pin NULLS FIRST on both sides (Spark asc default).
  *
  * Scale notes: aggregations are partial (map-side combine) by construction;
  * dimension joins (region/nation/supplier) are explicit `broadcast`; the
  * orders↔customer join is left to AQE (broadcastable at test SF, shuffle
  * hash/sort-merge on a cluster).
  */
object Relational {

  /** Exact, order-independent sum of a 2-decimal double column. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** G1/G5 + P3 shape — TPC-H Q1-style pricing summary (hash agg, map-side
    * partials, single shuffle on the two group keys). */
  def g01AggPricing(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1) - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** §2.6 equi-joins — revenue per region: orders→customer (AQE-picked)
    * →nation→region (explicit broadcast: dims are tiny at any scale). */
  def j01RegionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val n = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_regionkey")
    val r = Tables.region(spark, sfDir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name")
      .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"r_name")
  }

  /** §2.6 semi-join — customers that placed an urgent order, counted per
    * market segment (left_semi keeps the build side un-materialized). */
  def j02SemiUrgent(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val urgent = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** §2.6 anti-join — customers with no order after 2000-12-31, per nation. */
  def j03AntiRecent(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val recent = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" > lit("2000-12-31").cast("timestamp"))
      .select($"o_custkey")
    c.join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_inactive"))
      .orderBy($"c_nationkey")
  }

  /** §2.6 window functions — top-3 orders per customer by price
    * (row_number with full tiebreaker; single shuffle on o_custkey). */
  def w01TopPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** §2.6 window frame — per-customer running revenue ordered by date
    * (sum over rowsBetween unboundedPreceding..current; decimal for exact
    * prefix sums). */
  def w02RunningRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .withColumn("running_spend",
        sum($"o_totalprice".cast("decimal(18,2)")).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"running_spend")
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** §2.6 lag/lead — days since the customer's previous order. */
  def w03LagDays(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(spark, sfDir)
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .withColumn("days_since_prev",
        datediff($"o_orderdate", $"prev_date").cast("long"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"days_since_prev")
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** §2.6 set ops — custkeys active in 1995 but not in 1996 (EXCEPT). */
  def s01ExceptActive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    def activeIn(y: Int): DataFrame =
      o.filter(year($"o_orderdate") === y).select($"o_custkey").distinct()
    activeIn(1995).except(activeIn(1996)).orderBy($"o_custkey")
  }

  /** §2.6 set ops — custkeys active in both 1995 and 1996 (INTERSECT). */
  def s02IntersectActive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    def activeIn(y: Int): DataFrame =
      o.filter(year($"o_orderdate") === y).select($"o_custkey").distinct()
    activeIn(1995).intersect(activeIn(1996)).orderBy($"o_custkey")
  }

  /** P11 — global top-k: Spark plans TakeOrderedAndProject (no full sort). */
  def t01Top30Orders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(30)
  }

  /** §2.6 distinct — dropDuplicates on the two flag columns. */
  def d01DistinctFlags(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_linestatus")
      .dropDuplicates()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** §2.6 rollup — order counts by (status, priority) with subtotals.
    * grouping_id disambiguates real NULLs from rollup NULLs. */
  def r01RollupStatus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
        grouping_id().cast("long").as("gid"))
      .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
        $"o_orderpriority".asc_nulls_first)
  }

  /** §2.6 grouping sets via cube — counts over all subsets of
    * (returnflag, linestatus). */
  def r02CubeFlags(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
      .orderBy($"gid", $"l_returnflag".asc_nulls_first,
        $"l_linestatus".asc_nulls_first)
  }

  /** §2.6 exact count-distinct (HLL sibling x01 is rows-only checked). */
  def g02CountDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"))
      .orderBy($"l_returnflag")
  }

  /** §2.6 approx_count_distinct (HLL++) — rows-only check: HLL estimates
    * are implementation-specific, no DuckDB hash parity by design. */
  def x01ApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.01).as("approx_orders"))
      .orderBy($"l_returnflag")
  }

  /** §2.6 range/theta join — lineitems priced inside a per-part band
    * around retail price (non-equi conjunct on top of the equi key keeps
    * this a hash join with post-filter, not a nested loop). */
  def j04RangeBand(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir).select($"p_partkey", $"p_retailprice")
    l.join(broadcast(p),
        l("l_partkey") === p("p_partkey") &&
        l("l_extendedprice") >= p("p_retailprice") * 0.5 &&
        l("l_extendedprice") <= p("p_retailprice") * 20.0)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_in_band"))
      .orderBy($"l_returnflag")
  }

  /** §2.6-adjacent pivot — revenue matrix (orderstatus × priority tier):
    * groupBy().pivot() with explicit pivot values (never discovery at
    * scale — discovery is an extra job over all data). */
  def r03PivotRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .withColumn("prio", substring($"o_orderpriority", 1, 1))
      .groupBy($"o_orderstatus")
      .pivot("prio", Seq("1", "2", "3", "4", "5"))
      .agg(dsum($"o_totalprice"))
      .na.fill(0.0)
      .orderBy($"o_orderstatus")
  }

  val r03PivotRevenueSql: String = {
    val cols = (1 to 5).map(p =>
      s"""CAST(COALESCE(SUM(CAST(CASE WHEN SUBSTRING(o_orderpriority, 1, 1) = '$p'
         |  THEN o_totalprice END AS DECIMAL(18,2))), 0) AS DOUBLE) AS "$p"""".stripMargin)
      .mkString(",\n  ")
    s"""SELECT o_orderstatus,
       |  $cols
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  /** §2.6 exact order statistics — median / p25 / p90 via Spark's exact
    * percentile (sort-based), matching DuckDB's percentile_cont linear
    * interpolation. */
  def g03Percentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.25)").as("p25_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  val g03PercentilesSql: String =
    """SELECT o_orderstatus,
      |  percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
      |  percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25_price,
      |  percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_price,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** §2.6 window range frame — rolling 30-day spend per customer,
    * authored via spark.sql (interval RANGE frames are SQL-only in the
    * DataFrame API). RANGE includes date peers, so ties are deterministic. */
  def w04Range30d(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS spend_30d
        |FROM orders_v
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
  }

  val w04Range30dSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS spend_30d
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** §2.6 explicit GROUPING SETS (beyond rollup/cube). */
  def r04GroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  val r04GroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** §2.6 union — all (key, price) pairs from two years stacked. */
  def s03UnionYears(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    def yr(y: Int): DataFrame = o
      .filter(year($"o_orderdate") === y)
      .select($"o_orderkey", $"o_totalprice", lit(y).cast("long").as("yr"))
    yr(1995).unionByName(yr(1996))
      .orderBy($"yr", $"o_orderkey")
  }

  /** One-time bucketed-table setup per (session, sfDir): both join sides
    * written `bucketBy(4, orderkey)` + sorted, so repeated fact↔fact joins
    * read co-located buckets with NO exchange under the join. This is the
    * pre-shuffle-once, join-many-times answer for 100 TB fact joins; at
    * deployment the bucket count tracks cluster parallelism. */
  private def ensureBucketed(spark: SparkSession, sfDir: String): String = {
    // the raw-path hash keeps DISTINCT sfDirs on distinct table names:
    // a sanitizer alone collapses "/x/sf0.001" and "/x/sf0_001" onto
    // one suffix, and with the memo keyed by the raw path the second
    // dataset's write would silently hijack the first's tables
    val suffix = sfDir.replaceAll("[^a-zA-Z0-9]", "_") +
      "_" + java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(sfDir) & 0xffffffffL)
    // memoValue, not a bare TrieMap: it serializes concurrent builders
    // under a per-key lock, so two parallel j05 calls can't race the
    // drop/saveAsTable sequence on the same table names
    graft.Caches.memoValue(spark, s"bucketed:$sfDir") {
      // bucket count sized to the session's parallelism so the
      // co-located SMJ keeps every core busy (the original fixed 4
      // serialized the 100×-probe's 60M-row join onto 4 tasks). A real
      // deployment sizes buckets to data volume / target file size;
      // the no-shuffle plan property is count-independent as long as
      // BOTH sides share it, which this single site guarantees.
      val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
      Seq(s"b_orders$suffix", s"b_lineitem$suffix").foreach(dropStale(spark, _))
      Tables.orders(spark, sfDir)
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"b_orders$suffix")
      Tables.lineitem(spark, sfDir)
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"b_lineitem$suffix")
    }
    suffix
  }

  /** A managed table's warehouse directory can outlive the in-memory
    * catalog (fresh JVM, same working dir) — `saveAsTable` then fails
    * with LOCATION_ALREADY_EXISTS. Drop both the catalog entry and any
    * orphaned location before writing. */
  private def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath =
      if (wh.startsWith("file:")) java.nio.file.Paths.get(java.net.URI.create(wh))
      else java.nio.file.Paths.get(wh)
    graft.Fs.deleteRecursively(
      whPath.resolve(table.toLowerCase(java.util.Locale.ROOT)))
  }

  /** j05 — co-located bucketed join: lineitem⋈orders on the bucket key,
    * aggregated per priority. BucketedJoinSpec asserts the 0-exchange
    * plan; this registered query gates the result against the DuckDB
    * oracle on the same parquet. */
  def j05BucketedColocated(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val suffix = ensureBucketed(spark, sfDir)
    spark.table(s"b_lineitem$suffix")
      .join(spark.table(s"b_orders$suffix"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  val j05BucketedColocatedSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** g05 — salted two-phase skew aggregation: ~90% of lineitems collapse
    * onto one synthetic HOT key; a 16-way salt spreads the hot key's
    * partial aggregation across tasks before the final combine (the
    * manual fallback when AQE skew handling doesn't apply — custom sinks
    * or partitioners). SaltedAggSpec asserts salted ≡ direct; this query
    * gates the result against DuckDB's direct aggregation. */
  def g05SaltedSkewAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .withColumn("k",
        when($"l_orderkey" % 10 =!= 0, "HOT")
          .otherwise(concat(lit("c"), $"l_orderkey" % 97)))
      .withColumn("salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(16)))
      .groupBy($"k", $"salt")
      .agg(count(lit(1)).as("pn"),
        sum($"l_quantity".cast("decimal(18,2)")).as("pq"))
      .groupBy($"k")
      .agg(sum($"pn").as("n"), sum($"pq").cast("double").as("total_qty"))
      .orderBy($"k")
  }

  val g05SaltedSkewAggSql: String =
    """SELECT k, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM (SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 'HOT'
      |             ELSE 'c' || CAST(l_orderkey % 97 AS VARCHAR) END AS k,
      |             l_quantity
      |      FROM lineitem) t
      |GROUP BY k ORDER BY k""".stripMargin
}
