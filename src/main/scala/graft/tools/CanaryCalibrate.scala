package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration main for [[graft.Bench.cpuCanaryOnce]]'s pinned
  * quiet-slice seconds. Runs the canary N times (default 10) after a
  * codegen warmup and prints each sample plus the min — the pin in
  * Bench is the rounded-up best-of-run taken on a quiet slice
  * (alongside a t01-style IO probe to prove the slice WAS quiet).
  * Re-run this whenever the canary workload constant changes:
  *   sbt "runMain graft.tools.CanaryCalibrate"
  */
object CanaryCalibrate {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.cpuCanaryOnce(spark) // untimed codegen warmup
    val samples = (1 to n).map { i =>
      val s = graft.Bench.cpuCanaryOnce(spark)
      println(f"[calibrate] sample $i%2d: $s%.3f s")
      s
    }
    println(f"[calibrate] min ${samples.min}%.3f s  " +
      f"median ${samples.sorted.apply(n / 2)}%.3f s  n=$n")
    // labeled machine-readable line (r18, ADVICE): watcher scripts
    // parsed the human line above with positional awk + a lookbehind
    // grep — any format drift made the fields silently empty and the
    // watcher burned its polls reporting "no clean window". Anchor on
    // key=value instead; keep the human line for eyes.
    println(String.format(java.util.Locale.ROOT,
      "CANARY min=%.3f median=%.3f n=%d",
      Double.box(samples.min),
      Double.box(samples.sorted.apply(n / 2)), Int.box(n)))
    spark.stop()
  }
}
