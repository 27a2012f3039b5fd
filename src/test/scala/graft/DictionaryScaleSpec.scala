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
    // token frame in the explodedTokens shape: a third exact hits, a
    // third embedded hits (tier-2 regex capture), a third misses
    val tokens = spark.range(3000).select(
      $"id".as("tok_id"),
      when($"id" % 3 === 0, concat(lit("variant"), $"id" * 37 % n))
        .when($"id" % 3 === 1,
          concat(lit("go to variant"), $"id" * 37 % n, lit(" now")))
        .otherwise(concat(lit("unknown"), $"id")).as("norm"))
      // non-constant, else Catalyst (correctly) constant-folds the two
      // stripped-tier joins out of the plan and the 4-join gate can't hold
      .withColumn("stripped",
        when($"tok_id" % 5 === 0, lit("op")).otherwise(lit("")))
      .withColumn("strippedNorm", $"norm")
    // tier-2 pattern derived from THIS dim's key shape (the helper's
    // contract: pattern and dim must come from the same variant set)
    val pattern = "(?U)(?<![\\w])(variant[0-9]+)(?![\\w])"

    val resolved = LocationResolve.resolveTokensBroadcast(tokens, dim, pattern)
    val plan = resolved.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // FormattedMode prints each operator twice (tree + details): 4
    // lookup joins must yield 8 mentions — >= 8 so a tier regressing to
    // a shuffle join fails the gate
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 8, plan.take(1500))
    // the dictionary must be join data, not a 100k-entry plan literal
    assert(plan.length < 100000, s"plan size ${plan.length} suggests inlining")

    val out = resolved.select($"tok_id", $"norm", $"loc").collect()
    assert(out.length == 3000)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 <= 1)
        assert(r.getString(2) == "City" + (id * 37 % n % 1000),
          s"tok $id (${if (id % 3 == 0) "exact" else "embedded"}) " +
            s"resolved to ${r.getString(2)}")
      else assert(r.isNullAt(2), s"tok $id should miss")
    }
  }
}
