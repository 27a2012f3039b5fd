package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md).
  *
  * Every query takes `(SparkSession, sfDir)` and reads only the tables it
  * needs, so Catalyst can push filters/projections into the parquet scan.
  * At cluster scale these would be catalog tables; the parquet-dir layout
  * is the harness contract.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Widen a narrow scan before CPU-heavy per-row work. Small test files
    * arrive as 1-2 parquet splits, which would serialize pair-generation
    * and HOF math on one core; at cluster scale the scan is already wider
    * than the core count and this is a no-op (no shuffle inserted).
    * The `df.rdd` partition probe forces RDD plan materialization, so its
    * result is memoized per (session, canonicalized plan) — the full
    * canonical form, not just its hash, so a 32-bit collision can never
    * reuse the wrong partition count. */
  private val spreadProbe =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Int]
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spreadProbe.keys.filter(_._1.sparkContext.isStopped)
      .foreach(spreadProbe.remove)
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val n = spreadProbe.getOrElseUpdate(
      (spark, df.queryExecution.analyzed.canonicalized.toString),
      df.rdd.getNumPartitions)
    if (n < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others —
    * the generator's writer version decides. Adapt to what the footer
    * actually says instead of assuming one: nanos read as long (the
    * vectorized reader rejects NANOS) and truncate to µs, exactly what
    * DuckDB's µs-native timestamps do on the same file; µs-NTZ cast to
    * the session-zone instant (sessions here pin UTC, so the wall clock
    * is preserved and matches DuckDB's naive read). The public column is
    * always TimestampType either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      // contract is nanos-as-long or µs-NTZ only; a silent pass-through
      // here would mask a fixture/reader-config drift (e.g. NTZ inference
      // disabled yielding TimestampType with a zone already applied) and
      // shift every e-query window downstream. Fail loudly instead.
      case other => sys.error(
        s"events.ts: unexpected physical type $other (expected LongType " +
          "nanos or TimestampNTZType micros — fixture or reader-config drift)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
