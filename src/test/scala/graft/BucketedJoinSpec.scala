package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** §2.6 co-located joins: the SHIPPED registered query
  * `j05_bucketed_colocated` joins two tables bucketed on the join key —
  * its physical plan must contain no Exchange below the join (the
  * 100 TB answer for repeated fact↔fact joins), and its result must
  * match the same aggregate computed from the raw parquet. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("j05 plans without a join shuffle; results match unbucketed") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a real shuffle-eligible join so bucketing is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val bucketed = Relational.j05BucketedColocated(spark, sf)
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), s"no Join node in bucketed plan:\n$plan")
      val join = plan.substring(plan.indexOf("Join"))
      assert("Exchange hashpartitioning".r.findAllIn(join).isEmpty,
        s"bucketed join still shuffles:\n$plan")

      val unbucketed = {
        import spark.implicits._
        Tables.lineitem(spark, sf)
          .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum($"l_extendedprice".cast("decimal(18,2)")).cast("double")
              .as("revenue"))
          .orderBy($"o_orderpriority")
      }
      val a = bucketed.collect().map(_.toSeq).toSeq
      val b = unbucketed.collect().map(_.toSeq).toSeq
      assert(a == b)
      assert(a.nonEmpty)

      // and the unbucketed formulation genuinely shuffles both sides,
      // proving the 0-exchange plan above is bucketing at work
      val uplan = unbucketed.queryExecution.executedPlan.toString
      assert(uplan.contains("Join"), s"no Join node in unbucketed plan:\n$uplan")
      val ujoin = uplan.substring(uplan.indexOf("Join"))
      assert("Exchange hashpartitioning".r.findAllIn(ujoin).length >= 2)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
