package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side single-query timer: Bench's methodology (noop sink,
  * untimed warmup pass, min across passes) scoped to a comma list of
  * query names — the iteration loop for plan work on ONE query
  * without the full 126-query run.
  *   sbt "runMain graft.tools.TimeQuery <sfDir> <q1,q2> [passes=3]"
  * Prints per-query min seconds; optionally the formatted plan with
  * SPARK_GRAFT_EXPLAIN=1.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 3
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      once(n) // untimed warmup (codegen/scan)
      val ts = (1 to passes).map(_ => once(n))
      println(f"[time] $n min ${ts.min}%.2f s  samples ${
        ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
