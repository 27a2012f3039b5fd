package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration main for the Bench canary pins. Runs BOTH canaries —
  * [[graft.Bench.cpuCanaryOnce]] (zero-IO sha2 hash loop) and
  * [[graft.Bench.ioCanaryOnce]] (the t01 parquet scan + top-k) — N
  * times (default 10) after a codegen/scan warmup and prints each
  * sample pair plus min/median per canary. Bench's clean gate is DUAL
  * (both probes on both sides of a segment < threshold × pin), so a
  * calibration or watcher that reads only the cpu canary can declare
  * clean a window Bench itself would reject — the r18 host carried a
  * persistent ~1.3× io-floor the cpu probe could not see (r18 ADVICE).
  * Re-run whenever a canary workload constant changes:
  *   sbt "runMain graft.tools.CanaryCalibrate [n] [sfDir]"
  */
object CanaryCalibrate {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmups: codegen for the hash loop, scan init for t01
    graft.Bench.cpuCanaryOnce(spark)
    graft.Bench.ioCanaryOnce(spark, sfDir)
    val samples = (1 to n).map { i =>
      val c = graft.Bench.cpuCanaryOnce(spark)
      val io = graft.Bench.ioCanaryOnce(spark, sfDir)
      println(f"[calibrate] sample $i%2d: cpu $c%.3f s  io $io%.3f s")
      (c, io)
    }
    val (cpus, ios) = (samples.map(_._1), samples.map(_._2))
    def median(xs: Seq[Double]) = xs.sorted.apply(n / 2)
    println(f"[calibrate] cpu min ${cpus.min}%.3f s median " +
      f"${median(cpus)}%.3f s  io min ${ios.min}%.3f s median " +
      f"${median(ios)}%.3f s  n=$n")
    // labeled machine-readable line (r18, ADVICE): watcher scripts
    // parsed the human line with positional awk — any format drift made
    // the fields silently empty. Anchor on key=value; the r18 fields
    // (min/median = the cpu canary) keep their names so an old parser
    // still reads them, the io pair is appended (r19, ADVICE: the
    // watcher must gate on BOTH pins, matching Bench's Bracket.clean).
    println(String.format(java.util.Locale.ROOT,
      "CANARY min=%.3f median=%.3f io_min=%.3f io_median=%.3f n=%d",
      Double.box(cpus.min), Double.box(median(cpus)),
      Double.box(ios.min), Double.box(median(ios)), Int.box(n)))
    spark.stop()
  }
}
