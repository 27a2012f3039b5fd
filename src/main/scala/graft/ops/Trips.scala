package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.nlp.Goldens

/** Synthetic "trips" table — the reference's input record shape
  * (Main.py:442-463) derived deterministically from `orders` so that the
  * DuckDB oracle can reconstruct the identical frame (SURVEY §7.2 step 5).
  *
  * Every column is a pure function of o_orderkey/o_custkey/o_orderdate/
  * o_totalprice; `vid = o_orderkey % 21` selects one of the 21 NLP fixture
  * strings (Goldens.raw; vid 20 is the NULL row). String columns carry
  * deliberate garbage ('abc', '', 'nan', NULL) to exercise the reference's
  * coerce-to-0 / fill-'' semantics (Main.py:362-439).
  */
object Trips {

  /** SQL single-quoted literal. */
  def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private def sqlList(xs: Seq[String]): String =
    xs.map(sq).mkString("[", ", ", "]")

  /** CASE over vid (0..20) with per-vid string values. */
  def caseByVid(values: Seq[String]): String =
    "CASE CAST(vid AS INT) " +
      values.zipWithIndex.map { case (v, i) => s"WHEN $i THEN ${sq(v)}" }
        .mkString(" ") + " ELSE NULL END"

  /** CASE over vid with integer values. */
  def caseByVidInt(values: Seq[Int]): String =
    "CASE CAST(vid AS INT) " +
      values.zipWithIndex.map { case (v, i) => s"WHEN $i THEN $v" }
        .mkString(" ") + " ELSE NULL END"

  val endLocations: Seq[String] = Goldens.raw.flatten // 20; vid 20 → NULL
  val startLocations: Seq[String] = Seq("المكتب", "فندق هيلتون", "وسط البلد", "")

  def raw(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val endArr = array(endLocations.map(lit): _*)
    val startArr = array(startLocations.map(lit): _*)
    val k = $"o_orderkey"
    Tables.spread(Tables.orders(spark, sfDir)).select(
      k.as("trip_key"),
      (k % 21).as("vid"),
      ((k % 11) =!= 0).as("confirm_status"),
      concat(lit("Customer#"), $"o_custkey").as("customer_name"),
      concat(lit("G"), k).as("guest_name"),
      when(k % 9 === 8, "not-a-date")
        .otherwise(date_format($"o_orderdate", "yyyy-MM-dd")).as("date_str"),
      when(k % 23 === 22, lit(null).cast("double"))
        .otherwise($"o_totalprice").as("sale_price_raw"),
      when(k % 13 === 12, lit(null).cast("string"))
        .when(k % 13 === 11, "nan").otherwise("EGP").as("currency"),
      concat(lit("Driver "), k % 37).as("driver_name"),
      when(k % 19 === 18, "oops")
        .otherwise(((k * 3) % 10000).cast("string")).as("entry_number_str"),
      element_at(startArr, (k % 4).cast("int") + 1).as("start_location"),
      try_element_at(endArr, (k % 21).cast("int") + 1).as("end_location"),
      when(k % 7 === 0, "0").when(k % 7 === 1, "100").when(k % 7 === 2, "50")
        .when(k % 7 === 3, "abc").when(k % 7 === 4, "").when(k % 7 === 5, "200")
        .otherwise(lit(null).cast("string")).as("km_start_str"),
      when(k % 5 === 0, "150").when(k % 5 === 1, "90").when(k % 5 === 2, "")
        .when(k % 5 === 3, "xyz").otherwise("250").as("km_return_str"),
      concat(lit("REF-"), k).as("reference_id"),
      when(k % 3 === 0, "Station A").when(k % 3 === 1, "Station B")
        .otherwise(lit(null).cast("string")).as("station"),
      when(k % 17 === 16, "nan")
        .otherwise(concat(lit("Recv "), k % 10)).as("receiver_name"),
      when(k % 2 === 0, "cash").otherwise("card").as("payment_type"),
      when(k % 6 === 0, "ق ن ص 0042").when(k % 6 === 1, "أ ب ج")
        .when(k % 6 === 2, "ABC-123").when(k % 6 === 3, "0000")
        .when(k % 6 === 4, "  7 7 ")
        .otherwise(lit(null).cast("string")).as("car_number"),
    )
  }

  /** DuckDB CTE body producing the identical frame from `orders`. */
  val rawSql: String = {
    s"""SELECT
       |  o_orderkey AS trip_key,
       |  o_orderkey % 21 AS vid,
       |  (o_orderkey % 11) <> 0 AS confirm_status,
       |  'Customer#' || o_custkey AS customer_name,
       |  'G' || o_orderkey AS guest_name,
       |  CASE WHEN o_orderkey % 9 = 8 THEN 'not-a-date'
       |       ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_str,
       |  CASE WHEN o_orderkey % 23 = 22 THEN NULL ELSE o_totalprice END AS sale_price_raw,
       |  CASE WHEN o_orderkey % 13 = 12 THEN NULL
       |       WHEN o_orderkey % 13 = 11 THEN 'nan' ELSE 'EGP' END AS currency,
       |  'Driver ' || (o_orderkey % 37) AS driver_name,
       |  CASE WHEN o_orderkey % 19 = 18 THEN 'oops'
       |       ELSE CAST((o_orderkey * 3) % 10000 AS VARCHAR) END AS entry_number_str,
       |  (${sqlList(startLocations)})[CAST(o_orderkey % 4 AS INT) + 1] AS start_location,
       |  (${sqlList(endLocations)})[CAST(o_orderkey % 21 AS INT) + 1] AS end_location,
       |  CASE CAST(o_orderkey % 7 AS INT) WHEN 0 THEN '0' WHEN 1 THEN '100'
       |       WHEN 2 THEN '50' WHEN 3 THEN 'abc' WHEN 4 THEN '' WHEN 5 THEN '200'
       |       ELSE NULL END AS km_start_str,
       |  CASE CAST(o_orderkey % 5 AS INT) WHEN 0 THEN '150' WHEN 1 THEN '90'
       |       WHEN 2 THEN '' WHEN 3 THEN 'xyz' ELSE '250' END AS km_return_str,
       |  'REF-' || o_orderkey AS reference_id,
       |  CASE CAST(o_orderkey % 3 AS INT) WHEN 0 THEN 'Station A'
       |       WHEN 1 THEN 'Station B' ELSE NULL END AS station,
       |  CASE WHEN o_orderkey % 17 = 16 THEN 'nan'
       |       ELSE 'Recv ' || (o_orderkey % 10) END AS receiver_name,
       |  CASE WHEN o_orderkey % 2 = 0 THEN 'cash' ELSE 'card' END AS payment_type,
       |  CASE CAST(o_orderkey % 6 AS INT) WHEN 0 THEN ${sq("ق ن ص 0042")}
       |       WHEN 1 THEN ${sq("أ ب ج")} WHEN 2 THEN 'ABC-123' WHEN 3 THEN '0000'
       |       WHEN 4 THEN '  7 7 ' ELSE NULL END AS car_number
       |FROM orders""".stripMargin
  }
}
