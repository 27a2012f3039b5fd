package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the char-gram blocked fuzzy join (the r14 family
  * behind n13): times `fuzzyResolveDim` forced-blocked over
  * range-generated single-token dictionaries at 1× and 10× on each
  * axis, because the sf-probe corpus cannot scale it (n13's input is
  * `part`, which scale_probe.py copies as-is — dictionaries grow with
  * vocabulary, not fact volume).
  *
  * Written cost model (PLANS.md r14): scored candidates ≈
  * |probes| · |dict| · P(two high-entropy tokens share ≥3 prefix
  * grams) — LINEAR on each axis with a small constant (~1e-3 at
  * 12-letter tokens), i.e. a ~1000× exact-recall reduction against
  * the |probes|·|dict| exhaustive argmax, NOT the ∝-near-matches
  * economics of multi-token word-pair keys. A sweep ratio materially
  * above linear on either axis is a bug.
  *
  * The `cross` family (n14: single-token probes against multi-token
  * variants; r16 keys both sides' grams on the spaced sorted-join)
  * gets the same sweep — same cost model on the joined lengths.
  *
  * Usage: runMain graft.tools.GramProbe [baseKeys=20000] [family=gram|cross|both]
  */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.flatMap(_.toIntOption).getOrElse(20000)
    val family = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the probe families pick their edit class by k % m — a sampling
    // stride sharing a factor with m collapses the class mix (stride
    // 30 on the m=5 cross families hits ONLY k≡0: every probe an
    // exact spaced hit and the gram path never exercised — the bug
    // the first cross sweep shipped with, caught because hits ==
    // probes was impossible for a mix containing misses). Round the
    // stride up to the next integer coprime with m so every config
    // samples the identical class composition.
    def coprimeStride(nKeys: Int, n: Int, m: Int): Int = {
      var s = math.max(1, nKeys / n)
      while (BigInt(s).gcd(BigInt(m)) != 1) s += 1
      s
    }
    def dimOf(nKeys: Int) = graft.ops.LocationResolve.gramScaleDim(
        spark.range(nKeys).select($"id".as("p_partkey")))
      .withColumn("vorder", lit(0L))
    def probesOf(nKeys: Int, n: Int) = {
      val stride = coprimeStride(nKeys, n, 8)
      graft.ops.LocationResolve.gramProbes(
        spark.range(0, nKeys.toLong, stride).select($"id".as("p_partkey")))
        .select($"norm".as("fnorm")).distinct()
    }
    def crossDimOf(nKeys: Int) = graft.ops.LocationResolve.crossScaleDim(
        spark.range(nKeys).select($"id".as("p_partkey")))
      .withColumn("vorder", lit(0L))
    def crossProbesOf(nKeys: Int, n: Int) = {
      val stride = coprimeStride(nKeys, n, 5)
      graft.ops.LocationResolve.crossProbes(
        spark.range(0, nKeys.toLong, stride).select($"id".as("p_partkey")))
        .select($"norm".as("fnorm")).distinct()
    }
    // (label, dictKeys, probeCount): 1×/10× on each axis
    // independently. The probe axis tops out at one probe per dict
    // key, so the BASE probe count is base/30 — small enough that
    // probes10x is a true 10× (the first cut asked for base·10/3
    // probes from base keys, silently capped at ~3×, and the sweep
    // mislabeled the axis)
    val configs = Seq(
      ("base",      base,      base / 30),
      ("dict10x",   base * 10, base / 30),
      ("probes10x", base,      base / 3))
    def sweep(fam: String, variantsPerKey: Long,
        mkDim: Int => org.apache.spark.sql.DataFrame,
        mkProbes: (Int, Int) => org.apache.spark.sql.DataFrame): Unit =
      configs.foreach { case (label, nKeys, nProbes) =>
        val dim = mkDim(nKeys)
        val probes = mkProbes(nKeys, nProbes)
        val nP = probes.count()
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val out = graft.ops.LocationResolve
            .fuzzyResolveDim(probes, dim, Some(true))
          val hits = out.count()
          ((System.nanoTime() - t0) / 1e9, hits)
        }
        once() // warm (codegen + scans)
        val (t1, h1) = once()
        val (t2, _) = once()
        println(s"""{"probe":"$fam","config":"$label","dict":${nKeys * variantsPerKey},""" +
          s""""probes":$nP,"hits":$h1,"sec":${math.min(t1, t2)}}""")
      }
    if (family != "cross") sweep("gram", 5L, dimOf, probesOf)
    if (family != "gram") sweep("cross", 1L, crossDimOf, crossProbesOf)
    spark.stop()
  }
}
