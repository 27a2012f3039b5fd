package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §2.6 / PLANS.md): two-phase salted
  * aggregation must equal the direct aggregation — the manual fallback
  * when AQE skew handling isn't applicable (e.g. pre-3.0 sinks, custom
  * partitioners). The skewed frame puts ~90% of rows on one key. */
class SaltedAggSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("salted two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    // heavily skewed key: 90% of lineitems collapse to key "HOT"
    val skewed = Tables.lineitem(spark, sf)
      .withColumn("k",
        when($"l_orderkey" % 10 =!= 0, "HOT")
          .otherwise(concat(lit("c"), $"l_orderkey" % 97)))

    val direct = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).as("q"))

    val salted = skewed
      .withColumn("salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(16)))
      .groupBy($"k", $"salt")
      .agg(count(lit(1)).as("pn"),
        sum($"l_quantity".cast("decimal(18,2)")).as("pq"))
      .groupBy($"k")
      .agg(sum($"pn").as("n"), sum($"pq").as("q"))

    val a = direct.orderBy($"k").collect().map(_.toSeq).toSeq
    val b = salted.orderBy($"k").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.exists(r => r.head == "HOT"))
  }
}
