package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Builder-side read-bytes decomposer for the keep-best maintainer:
  * drives [[graft.streaming.Streaming.keepBestDeltaMaintain]] wave by
  * wave (the StreamProbe harness) and prints, PER WAVE, every Spark
  * job's input bytes with its call site — the tool that attributes a
  * wave_read_bytes growth slope to a specific read (tail delta slices
  * vs band-index history vs a bucketed-store probe) instead of
  * guessing from totals. StreamProbe gives the per-wave curve; this
  * gives its composition.
  *   sbt "runMain graft.tools.WaveReadTrace <probeDir> [waves=6]
  *        [compactEvery=4] [dim=keepbest|band]"
  */
object WaveReadTrace {
  def main(args: Array[String]): Unit = {
    val probeDir = args(0)
    val waves = if (args.length > 1) args(1).toInt else 6
    val compactEvery = if (args.length > 2) args(2).toInt else 4
    val dim = if (args.length > 3) args(3) else "keepbest"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, probeDir)
    def wave(w: Int): DataFrame =
      docs.filter(col("doc_id") >= w.toLong * graft.StreamProbe.ReplicaOffset &&
        col("doc_id") < (w + 1).toLong * graft.StreamProbe.ReplicaOffset)

    // per-stage input bytes keyed by the stage NAME (carries the
    // source call site, e.g. "parquet at Streaming.scala:1475") —
    // job-level callSite properties are absent for these driver-side
    // maintainer calls, stage names are not
    val stageName = scala.collection.concurrent.TrieMap.empty[Int, String]
    val stageBytes = scala.collection.concurrent.TrieMap.empty[Int, java.util.concurrent.atomic.AtomicLong]
    val stageJobs = scala.collection.concurrent.TrieMap.empty[Int, Set[Int]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        stageJobs.put(j.jobId, j.stageInfos.map(_.stageId).toSet)
        j.stageInfos.foreach { si =>
          // broadcast-exchange stages carry an anonymous lambda as
          // their name; the graft frame in the details stack is the
          // attribution that matters
          val name =
            if (si.name.contains("$anonfun")) si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("tools."))
              .map(_.trim).getOrElse(si.name)
            else si.name
          stageName.put(si.stageId, name)
          stageBytes.putIfAbsent(si.stageId,
            new java.util.concurrent.atomic.AtomicLong(0))
          ()
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) Option(stageBytes.get(e.stageId)).flatten
          .foreach { a => a.addAndGet(m.inputMetrics.bytesRead); () }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    })

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(s"graft_wrtrace_$p").toString
    val (d, p, sv) = (tmp("dim"), tmp("pairs"), tmp("surv"))
    val upd: (DataFrame, Long) => Unit = dim match {
      case "band" => graft.streaming.Streaming.bandIndexUpdate(d, p) _
      case "band_c" => graft.streaming.Streaming.bandIndexMaintain(
        d, p, compactEvery) _
      case _ => graft.streaming.Streaming.keepBestDeltaMaintain(
        d, p, sv, compactEvery) _
    }

    (0 until waves).foreach { w =>
      val before = stageBytes.keySet.toSet
      val beforeJobs = stageJobs.keySet.toSet
      upd(wave(w), w.toLong)
      // listener events post async; let the counters settle
      Thread.sleep(500)
      val newStages = (stageBytes.keySet.toSet -- before).toSeq.sorted
      val rows = newStages.map { s =>
        (s, stageBytes(s).get(), stageName.getOrElse(s, "?"))
      }.filter(_._2 > 0)
      val total = rows.map(_._2).sum
      println(s"== wave $w  stages=${newStages.size}  read_total=$total")
      // aggregate by call site: the growth attribution reads off the
      // per-site per-wave series directly
      rows.groupBy(_._3).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy(-_._2).foreach { case (site, b) =>
          println(f"   $b%12d  $site")
        }
      // per-JOB view: broadcast-exchange stages carry no graft frame
      // in their details, so the site aggregation above lumps them —
      // but jobs run in the wave's deterministic action order, so a
      // job-id timeline (each job named by its best-named stage)
      // pins WHICH action paid each read
      val newJobs = (stageJobs.keySet.toSet -- beforeJobs).toSeq.sorted
      newJobs.foreach { jid =>
        val ss = stageJobs(jid)
        val b = ss.map(s => stageBytes.get(s).map(_.get()).getOrElse(0L)).sum
        if (b > 0) {
          val nm = ss.toSeq.sorted.map(s => stageName.getOrElse(s, "?"))
            .find(n => !n.contains("$anonfun")).getOrElse("broadcast")
          println(f"   job $jid%4d  $b%12d  $nm")
        }
      }
    }
    spark.stop()
  }
}
