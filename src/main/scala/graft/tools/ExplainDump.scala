package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for registered queries to one file per
  * query — the committed plan evidence for an optimization round.
  *   sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> [names|all] [suffix]"
  * Writes <outDir>/<name><suffix>.txt (suffix e.g. "_after").
  * Plans are built, not executed; with AQE the text is the initial
  * plan (isFinalPlan=false), which is what explain() shows pre-run.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val names =
      if (args.length < 3 || args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val suffix = if (args.length > 3) args(3) else ""
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val txt =
        try graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.write(outDir.resolve(s"$n$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain] $n -> ${outDir.resolve(s"$n$suffix.txt")}")
    }
    spark.stop()
  }
}
