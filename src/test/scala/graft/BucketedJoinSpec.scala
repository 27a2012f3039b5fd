package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** §2.6 co-located joins: bucketing both sides on the join key removes
  * the shuffle entirely — the physical plan for the bucketed join must
  * contain no Exchange below the join, while the unbucketed plan does.
  * This is the 100 TB answer for repeated fact↔fact joins. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("bucketed join plans without a shuffle; results match unbucketed") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a real shuffle-eligible join so bucketing is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      Tables.orders(spark, sf)
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf)
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      def agg(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))

      val bucketed = agg(spark.table("b_lineitem"), spark.table("b_orders"))
      val unbucketed = agg(Tables.lineitem(spark, sf), Tables.orders(spark, sf))

      def joinShuffles(df: org.apache.spark.sql.DataFrame): Int = {
        val plan = df.queryExecution.executedPlan.toString
        val join = plan.substring(plan.indexOf("Join"))
        "Exchange hashpartitioning".r.findAllIn(join).length
      }
      assert(joinShuffles(bucketed) == 0,
        s"bucketed join still shuffles:\n${bucketed.queryExecution.executedPlan}")
      assert(joinShuffles(unbucketed) >= 2) // both sides shuffle

      val a = bucketed.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
      val b = unbucketed.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
