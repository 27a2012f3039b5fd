package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** Skew mitigation (SURVEY §2.6 / PLANS.md): the SHIPPED registered query
  * `g05_salted_skew_agg` (two-phase salted aggregation over a frame with
  * ~90% of rows on one key) must equal a directly-computed aggregation —
  * the manual fallback when AQE skew handling isn't applicable. */
class SaltedAggSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("g05 salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    val salted = Relational.g05SaltedSkewAgg(spark, sf)
      .collect().map(_.toSeq).toSeq

    // independent direct formulation (no salt) over the same skewed key
    val direct = Tables.lineitem(spark, sf)
      .withColumn("k",
        when($"l_orderkey" % 10 =!= 0, "HOT")
          .otherwise(concat(lit("c"), $"l_orderkey" % 97)))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("total_qty"))
      .orderBy($"k")
      .collect().map(_.toSeq).toSeq

    assert(salted == direct)
    assert(salted.exists(r => r.head == "HOT"))
  }
}
