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

  test("n11 blocked fuzzy ≡ exhaustive token_sort_ratio argmax") {
    import spark.implicits._
    graft.functions.CustomExprs.register(spark)
    val sfDir = "/root/testdata/sf0.001"
    val part = graft.Tables.part(spark, sfDir)

    // the exhaustive oracle: crossJoin every probe against the FULL
    // n09 dim, same scorer / cutoff / tie-break — O(|probes|·|dict|),
    // viable only at fixture scale, which is exactly why n11 exists
    val probes = LocationResolve.fuzzyProbes(part)
    val dim = LocationResolve.scaleDim(part)
    val exhaustive = probes.crossJoin(dim)
      .withColumn("score",
        graft.functions.CustomExprs.token_sort_ratio($"norm", $"vkey"))
      .where($"score" >= graft.nlp.Cleaner.FuzzyScoreCutoff)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"tok_id").orderBy($"score".desc, $"vkey".asc)))
      .where($"rn" === 1)
      .select($"tok_id", $"canon".as("eloc"), $"score".as("escore"))
    val expected = probes.join(exhaustive, Seq("tok_id"), "left")
      .select($"tok_id", $"eloc", $"escore")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .toMap

    val got = LocationResolve.fuzzyDictScale(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
      .toMap

    assert(got.keySet == expected.keySet)
    // recall gate: the blocked candidate generator must reproduce the
    // exhaustive argmax EXACTLY — the token-pair keys make recall
    // structural (a single-token edit leaves ≥1 of the 3 pair keys
    // intact), so anything less than 1.0 is a blocking bug, not noise
    val diverging = got.keySet.filter(k => got(k) != expected(k))
    assert(diverging.isEmpty,
      s"${diverging.size}/${got.size} probes diverge from the " +
        s"exhaustive argmax, e.g. ${diverging.take(3).map(k =>
          s"tok $k got ${got(k)} want ${expected(k)}").mkString("; ")}")
    // the probe construction itself must exercise both outcomes
    val hits = got.values.count(_._1.isDefined)
    assert(hits > 0 && hits < got.size,
      s"degenerate probe set: $hits/${got.size} hits")
  }

  test("n12 composed resolver: forced-blocked ≡ forced-exhaustive on the " +
      "n09 dim; the size switch picks each branch where designed") {
    import spark.implicits._
    graft.functions.CustomExprs.register(spark)
    val part = graft.Tables.part(spark, "/root/testdata/sf0.001")
    // the n11 probe family (single-token edits — the blocked form's
    // structural-recall class) as the distinct fuzzy-probe dim the
    // composed resolver feeds fuzzyResolveDim
    val probes = LocationResolve.fuzzyProbes(part)
      .select($"norm".as("fnorm")).distinct()
    val dim = LocationResolve.scaleDim(part)
      .withColumn("vorder", org.apache.spark.sql.functions.lit(0L))
    def resolved(blocked: Boolean): Map[String, String] =
      LocationResolve.fuzzyResolveDim(probes, dim, Some(blocked))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val (b, e) = (resolved(blocked = true), resolved(blocked = false))
    assert(b == e, {
      val diff = (b.keySet ++ e.keySet).filter(k => b.get(k) != e.get(k))
      s"${diff.size} diverging probes, e.g. ${diff.take(3).map(k =>
        s"'$k' blocked=${b.get(k)} exhaustive=${e.get(k)}").mkString("; ")}"
    })
    assert(b.nonEmpty, "degenerate: no probe resolved on either branch")
    // the switch itself: the 100k-regime dim must pick the blocked
    // branch (no BroadcastNestedLoopJoin from a dim crossJoin), the
    // bundled-size dim the exhaustive one (its deliberate dim-sized
    // crossJoin IS a BNLJ)
    def planOf(d: org.apache.spark.sql.DataFrame) = LocationResolve
      .fuzzyResolveDim(probes, d).queryExecution.executedPlan.toString
    assert(!planOf(dim).contains("BroadcastNestedLoopJoin"),
      "large dim routed through the exhaustive crossJoin")
    val tiny = dim.limit(100)
    assert(planOf(tiny).contains("BroadcastNestedLoopJoin"),
      "small dim did not take the exhaustive-argmax branch")
  }

  test("length band derives from the cutoff: len-diff > 8 hits survive") {
    import spark.implicits._
    graft.functions.CustomExprs.register(spark)
    // The r12 fixed half-width of 8 was lossy: at la+lb ≥ ~50, score
    // ≥ 82 admits indel distance up to 0.18·(la+lb) > 8. Pin the exact
    // counterexample family — la=50, lb=60, pure 10-char append ⇒
    // d=10, score 100·(1−10/110)=90.9 ≥ 82, len diff 10 — and one
    // provably-impossible pair the derived band must still drop.
    val a = "x" * 50
    val rows = Seq(
      (a, a + ("y" * 10)),   // above cutoff, len diff 10: MUST survive
      ("z" * 10, "z" * 30)). // max score 50 < 82: MUST be dropped
      toDF("p", "d")
      .withColumn("score",
        graft.functions.CustomExprs.token_sort_ratio($"p", $"d"))
      .withColumn("band", LocationResolve.fuzzyLenBandPred(
        length($"p"), length($"d"), graft.nlp.Cleaner.FuzzyScoreCutoff))
      .collect().map(r => (r.getDouble(2), r.getBoolean(3)))
    assert(rows(0)._1 >= graft.nlp.Cleaner.FuzzyScoreCutoff,
      s"fixture drifted: append-10 pair scores ${rows(0)._1} < cutoff")
    assert(rows(0)._2, "derived band dropped an above-cutoff candidate " +
      s"(score ${rows(0)._1}, len diff 10) — the r12 lossy-band bug")
    assert(!rows(1)._2,
      "derived band kept a pair that cannot clear the cutoff")
  }
}
