package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** A session built withExtensions gets the custom functions in SQL and
  * the self-comparison fold rule in the optimizer. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val shared = SparkSuite.spark // ensure the context exists
    // force a NEW SparkSession (same context) so withExtensions applies
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    s
  }

  test("injected functions resolve in SQL") {
    val r = spark.sql(
      "SELECT token_sort_ratio('b a', 'a b') AS r, fnv1a64('a') AS h, " +
        "vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "simhash64('a b a') AS s, simhash64(CAST(NULL AS STRING)) AS sn")
      .collect()(0)
    assert(r.getDouble(0) == 100.0)
    assert(r.getLong(1) == 0xaf63dc4c8601ec8cL)
    assert(r.getDouble(2) == 11.0)
    // majority word 'a': simhash equals fnv1a64('a') exactly (the word
    // hash family is FNV-1a so the x12 oracle can replay it in DuckDB)
    assert(r.getLong(3) == r.getLong(1))
    assert(r.isNullAt(4))
  }

  test("optimizer rule folds token_sort_ratio(x, x) to a literal") {
    val df = spark.read
      .parquet(s"${SparkSuite.sf}/documents.parquet")
      .selectExpr("token_sort_ratio(concat(text, 'x'), concat(text, 'x')) AS r")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("100.0"), optimized)
    assert(!optimized.toLowerCase.contains("tokensortratio"), optimized)
    assert(df.collect()(0).getDouble(0) == 100.0)
  }
}
