package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface — the engine's answer to the reference's
  * periodic 6-hour fetch loop with checkpoint resume (Main.py:103,
  * 109-163, 466-518): `readStream → transforms → writeStream` with
  * watermarks, windowed/session aggregations, stateful processing and
  * built-in checkpointing. Each streaming plan is the SAME logical shape
  * as its batch sibling in ops.Events; StreamingSpec asserts equality of
  * results when the parquet fixture is replayed as a stream.
  */
object Streaming {

  /** events schema as stored (ts = parquet TIMESTAMP(NANOS) read as long
    * via nanosAsLong, converted to microsecond timestamps downstream). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** S3-equivalent source: replay the events parquet as a file stream.
    * The file-stream source requires a directory, and the fixture is a
    * single file — stage it into a temp dir via symlink (what a real
    * deployment's landing directory is). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.createSymbolicLink(dir.resolve("events.parquet"), src)
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(dir.toString)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** e01 streaming sibling: watermarked tumbling-window aggregation. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"),
        col("total_value"))

  /** e02 streaming sibling: watermarked session windows per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming dedup with bounded state (first event per user+type). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  case class UserStat(userId: Long, nEvents: Long, totalValue: Double,
      lastTs: java.sql.Timestamp)
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Custom per-key state (KeyValueGroupedDataset.flatMapGroupsWithState):
    * running per-user counters — the primitive behind bespoke sessionization
    * / enrichment the built-in windows can't express. */
  def userStats(events: DataFrame): Dataset[UserStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select($"user_id", $"ts", $"value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserStat]) => {
          var (n, tot, last) = state.getOption
            .map(s => (s.nEvents, s.totalValue, s.lastTs))
            .getOrElse((0L, 0.0, new java.sql.Timestamp(0)))
          evs.foreach { e =>
            n += 1; tot += e.value
            if (e.ts.after(last)) last = e.ts
          }
          val s = UserStat(uid, n, tot, last)
          state.update(s)
          Iterator.single(s)
        })
  }

  /** Run a streaming DataFrame to completion over the finite fixture
    * (Trigger.AvailableNow + memory sink + checkpoint dir) and return the
    * materialized result. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_ckpt_$name").toString
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
