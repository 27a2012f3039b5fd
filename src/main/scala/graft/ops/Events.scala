package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream operators in their batch form (the streaming execution of
  * the same plans lives in graft.streaming; batch window()/session_window()
  * are oracle-checkable, the streaming run is asserted equal in
  * StreamingSpec).
  */
object Events {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** e01 — tumbling 1-hour windows per event type. */
  def windowAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select($"w.start".as("ws"), $"event_type", $"n", $"total_value")
      .orderBy($"ws", $"event_type")
  }

  val windowAggSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin

  /** e02 — session windows (30-minute gap) per user. Spark's
    * session_window end = last event + gap; the oracle reproduces that via
    * gaps-and-islands (new session when ts − prev ≥ gap, matching the
    * exclusive window end). */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
      .select($"user_id", $"w.start".as("session_start"),
        $"w.end".as("session_end"), $"n_events", $"total_value")
      .orderBy($"user_id", $"session_start")
  }

  val sessionizeSql: String =
    """WITH m AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |           OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              >= INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |), g AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m
      |)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL '30 minutes' AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** e03 — semi-structured props: schema'd from_json in Spark (regex
    * extraction in the oracle — no JSON-extension dependency). */
  def jsonProps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("k",
        from_json($"props", lit("k INT")).getField("k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val jsonPropsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS min_k,
      |  MAX(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** e05 — as-of enrichment: each event carries the timestamp and value
    * of the user's most recent signup at or before it. Spark has no
    * native as-of join; the scalable formulation is a single per-user
    * sort + running last(ignoreNulls) window — no join, no O(n²), state
    * is one row per partition key (this is also exactly how the
    * streaming flatMapGroupsWithState version would carry it). */
  def asofEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("last_signup_ts",
        last(when($"event_type" === "signup", $"ts"), ignoreNulls = true).over(w))
      .withColumn("last_signup_value",
        last(when($"event_type" === "signup", $"value"), ignoreNulls = true).over(w))
      .select($"event_id", $"user_id", $"ts", $"event_type",
        $"last_signup_ts", $"last_signup_value")
      .orderBy($"user_id", $"ts", $"event_id")
  }

  val asofEnrichSql: String =
    """SELECT event_id, user_id, ts, event_type,
      |  LAST_VALUE(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts,
      |  LAST_VALUE(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_value
      |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  /** e06 — sliding (hopping) windows: 1-hour windows every 30 minutes;
    * each event lands in two windows. */
  def slidingWindowAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select($"w.start".as("ws"), $"event_type", $"n", $"total_value")
      .orderBy($"ws", $"event_type")
  }

  val slidingWindowAggSql: String =
    """WITH cand AS (
      |  SELECT *, time_bucket(INTERVAL '30 minutes', ts) AS b FROM events
      |), placed AS (
      |  SELECT event_id, event_type, value, ts, b AS ws FROM cand
      |  UNION ALL
      |  SELECT event_id, event_type, value, ts,
      |         b - INTERVAL '30 minutes' AS ws FROM cand
      |)
      |SELECT ws, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM placed
      |WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
      |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin

  /** e07 — interval (stream-stream) join in batch form: each click joined
    * to the same user's purchases within 10 minutes after it. Plan shape:
    * equi join on user_id with the time band as a join-side predicate —
    * one shuffle per side on the user key; the streaming sibling
    * ([[graft.streaming.Streaming.intervalJoin]]) is the identical plan
    * with watermarks bounding both join states. */
  def intervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"))
    clicks.join(purchases,
        $"user_id" === $"p_user_id" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 10 MINUTES"))
      .select($"user_id", $"click_id", $"purchase_id",
        $"click_ts", $"purchase_ts")
      .orderBy($"user_id", $"click_id", $"purchase_id")
  }

  val intervalJoinSql: String =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  c.ts AS click_ts, p.ts AS purchase_ts
      |FROM events c JOIN events p ON c.user_id = p.user_id
      |  AND c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
      |ORDER BY c.user_id, click_id, purchase_id""".stripMargin

  /** e04 — event-stream dedup: first occurrence per (user_id, event_type)
    * by time (dropDuplicatesWithinWatermark's batch analog). */
  def firstEventPerUserType(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"ts")
      .orderBy($"user_id", $"event_type")
  }

  val firstEventPerUserTypeSql: String =
    """SELECT user_id, event_type, event_id, ts FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin
}
