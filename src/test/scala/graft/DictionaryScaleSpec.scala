package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.LocationResolve

/** The claimed at-scale dictionary behavior, exercised at size: the n07
  * broadcast lookup must stay a flat broadcast-join plan (no plan-literal
  * blow-up) and resolve correctly against a 100k-variant dimension —
  * the regime where n06's constant-folded map form stops being viable. */
class DictionaryScaleSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("100k-variant dictionary: flat BHJ plan, correct resolution") {
    import spark.implicits._
    val n = 100000
    // synthetic normalized variants; ~100 variants per canonical city
    val dim = spark.range(n)
      .select(concat(lit("variant"), $"id").as("vkey"),
        concat(lit("City"), $"id" % 1000).as("canon"))
    // token frame in the explodedTokens shape: half hits, half misses
    val tokens = spark.range(2000).select(
      $"id".as("tok_id"),
      when($"id" % 2 === 0, concat(lit("variant"), $"id" * 37 % n))
        .otherwise(concat(lit("unknown"), $"id")).as("norm"))
      .withColumn("stripped", lit(""))
      .withColumn("strippedNorm", $"norm")

    val resolved = LocationResolve.resolveTokensBroadcast(tokens, dim)
    val plan = resolved.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4, plan.take(1500))
    // the dictionary must be join data, not a 100k-entry plan literal
    assert(plan.length < 100000, s"plan size ${plan.length} suggests inlining")

    val out = resolved.select($"tok_id", $"norm", $"loc").collect()
    assert(out.length == 2000)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0)
        assert(r.getString(2) == "City" + (id * 37 % n % 1000),
          s"tok $id resolved to ${r.getString(2)}")
      else assert(r.isNullAt(2), s"tok $id should miss")
    }
  }
}
