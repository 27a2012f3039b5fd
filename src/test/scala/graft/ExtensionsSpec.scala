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
    // restore BOTH session slots: getOrCreate set this new session as
    // default AND active, and suites run sequentially in one forked
    // JVM — a leaked active session would make every later suite
    // resolve through the extensions session, masking
    // missing-registration bugs in the plain register(spark) path
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  test("injected functions resolve in SQL") {
    val r = spark.sql(
      "SELECT token_sort_ratio('b a', 'a b') AS r, fnv1a64('a') AS h, " +
        "vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "simhash64('a b a') AS s, simhash64(CAST(NULL AS STRING)) AS sn, " +
        "byte_sum(CAST('ab' AS BINARY)) AS bs, " +
        // might_contain requires its sketch as a constant or scalar
        // subquery (Spark's own BLOOM_FILTER_BINARY_OP_WRONG_TYPE rule)
        "might_contain((SELECT bloom_agg(xxhash64(v), 100L, 1000L) " +
        "FROM (SELECT explode(array('a', 'b')) AS v)), xxhash64('a')) AS mc")
      .collect()(0)
    assert(r.getDouble(0) == 100.0)
    assert(r.getLong(1) == 0xaf63dc4c8601ec8cL)
    assert(r.getDouble(2) == 11.0)
    // majority word 'a': simhash equals fnv1a64('a') exactly (the word
    // hash family is FNV-1a so the x12 oracle can replay it in DuckDB)
    assert(r.getLong(3) == r.getLong(1))
    assert(r.isNullAt(4))
    assert(r.getLong(5) == 'a'.toLong + 'b'.toLong)
    assert(r.getBoolean(6))
    // the pair Generator can't nest inside scalar expressions — resolve
    // it through the extensions path in generator position
    val pairs = spark.sql(
      "SELECT pa, pb FROM (SELECT array('x', 'y', 'z') AS arr) " +
        "LATERAL VIEW array_combinations2(arr) t AS pa, pb")
      .collect().map(row => (row.getString(0), row.getString(1)))
    assert(pairs.toSeq == Seq(("x", "y"), ("x", "z"), ("y", "z")))
  }

  test("might_contain over a scalar-subquery sketch is interpreter-only " +
      "(pinned); the literal-sketch form compiles") {
    // The subquery form above evaluates CORRECTLY but through Spark's
    // interpreted-projection fallback: janino rejects the generated
    // scalar-subquery reference ("java.lang.Long is not an rvalue") and
    // the projection factory falls back with a WARN. That is accepted
    // for the SQL-surface convenience form — the engine never uses it
    // (x27 probes a plan-LITERAL sketch; PlanAuditSpec gates that shape
    // compiles). Pin both facts so a Spark upgrade that fixes the
    // codegen shows up as a failing pin to delete, not silent drift.
    val saved = Seq("spark.sql.codegen.factoryMode",
      "spark.sql.codegen.fallback").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val subquery = intercept[Exception](spark.sql(
        "SELECT might_contain((SELECT bloom_agg(xxhash64(v), 100L, 1000L) " +
          "FROM (SELECT explode(array('a', 'b')) AS v)), xxhash64('a'))")
        .collect())
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(subquery).exists(m => m.contains("rvalue") ||
          m.toLowerCase.contains("compil")),
        "scalar-subquery might_contain now COMPILES under CODEGEN_ONLY — " +
          "Spark fixed the janino shape; delete this pin and the " +
          s"fallback note. Got: ${subquery}")
      // the literal form (the engine's x27 shape) must compile
      val sketch = spark.sql(
        "SELECT bloom_agg(xxhash64(v), 100L, 1000L) " +
          "FROM (SELECT explode(array('a', 'b')) AS v)")
        .collect()(0).getAs[Array[Byte]](0)
      import org.apache.spark.sql.functions._
      val ok = spark.range(1)
        .select(call_function("might_contain",
          lit(sketch), xxhash64(lit("a"))).as("mc"))
        .collect()(0).getBoolean(0)
      assert(ok, "literal-sketch might_contain returned wrong answer")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("wrong arity fails with the function name, not an index error") {
    val e = intercept[Exception](spark.sql("SELECT token_sort_ratio('a')"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("token_sort_ratio expects 2")),
      e.toString)
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
