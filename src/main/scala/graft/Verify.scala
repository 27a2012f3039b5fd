package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query subset — builder-side
    // spot checks of a changed oracle without the full 113-query dump
    // (the driver always runs the full form)
    val subset = if (args.length > 2) Some(args(2).split(",").toSet) else None
    // a typo'd or stale name must fail LOUDLY (the Bench canary rule) —
    // otherwise the spot check runs zero queries, writes nothing, and
    // exits 0, silently "validating" the very change it was meant to test
    subset.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in subset arg: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // survive contended-host GC stalls as SLOW, not exit-56 DEAD
      // (see Bench.scala — round-7's official bench record was a
      // heartbeat-failure crash on code that passed on a quiet slice)
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.currentTimeMillis()
    var ok = 0
    var failed = 0
    SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // forensics: if the JVM dies mid-run, stderr names the in-flight query
      System.err.println(s"[verify] start $name")
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        ok += 1
      }
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any stale output from a previous run — a leftover result
        // must not mask this run's failure in the oracle compare
        Fs.deleteRecursively(java.nio.file.Paths.get(s"$outDir/$name"))
      }
    }
    def q(s: String): String = Fs.jsonQuote(s)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => subset.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the /stats bookkeeping of the reference's run-cycle (api.py:354-359):
    // record count = the flagship master output — counted ONLY when this
    // invocation actually ran q4_master, or a subset spot check into a
    // dir holding an older full dump would report the stale file's rows
    // as this run's records
    val ranMaster = subset.forall(_.contains("q4_master"))
    val masterRows =
      if (!ranMaster) 0L
      else try spark.read.parquet(s"$outDir/q4_master").count()
      catch { case _: Throwable => 0L }
    val now = System.currentTimeMillis()
    graft.api.CleanApi.recordRun(graft.api.CleanApi.RunStats(
      records = masterRows, queriesOk = ok, queriesFailed = failed,
      status = if (failed == 0) "success" else "partial",
      finishedAtMs = now, durationMs = now - t0))
    System.err.println(s"[verify] stats: ${graft.api.CleanApi.stats()}")
    Caches.clear(spark)
    spark.stop()
  }
}
