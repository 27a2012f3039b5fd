package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset surface: case-class Encoders + a custom typed
  * Aggregator — the compile-time-checked flavor of the aggregation ops
  * (used where field-level type safety matters more than Row generics;
  * the Aggregator also covers the custom-aggregate tier of the SURVEY §4
  * inventory). The Aggregator keeps sums in cents (long) so the result
  * is exact and order-independent like the decimal-cast SQL form.
  */
object TypedOps {

  case class LineQty(l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double)

  /** Exact mean of a 2-decimal double field via integer cents. */
  class CentsAvg(get: LineQty => Double)
      extends Aggregator[LineQty, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: LineQty): (Long, Long) =
      (b._1 + math.round(get(a) * 100), b._2 + 1)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else (BigDecimal(r._1) / 100 / r._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** g04 — typed groupByKey + custom Aggregators over Dataset[LineQty]. */
  def g04TypedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[LineQty]
    ds.filter(_.l_quantity > 10.0)
      .groupByKey(_.l_returnflag)
      .agg(
        new CentsAvg(_.l_quantity).toColumn.name("avg_qty"),
        new CentsAvg(_.l_extendedprice).toColumn.name("avg_price"))
      .toDF("l_returnflag", "avg_qty", "avg_price")
      .orderBy($"l_returnflag")
  }

  /** Oracle reproduces the cents-exact mean: sums are integer cents, the
    * mean is rounded half-up at 6 decimals. */
  val g04TypedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(ROUND(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DECIMAL(38,10))
      |    / 100 / COUNT(*), 6) AS DOUBLE) AS avg_qty,
      |  CAST(ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DECIMAL(38,10))
      |    / 100 / COUNT(*), 6) AS DOUBLE) AS avg_price
      |FROM lineitem WHERE l_quantity > 10.0
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
