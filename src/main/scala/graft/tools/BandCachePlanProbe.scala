package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** One-shot diagnostic for the band-maintainer cache question raised
  * by the r19 WaveReadTrace job timeline (the batch corpus apparently
  * scanned 2-3x per wave despite the docs/bands persist marks):
  * rebuilds the exact wave-1 frames of
  * [[graft.streaming.Streaming.bandIndexUpdate]], prints each
  * consumer's EXECUTED plan, then runs the real action sequence with
  * per-command read bytes and block-store state.
  *
  * RESOLUTION (r19): the marks serve every consumer — each write
  * executes `WriteFiles +- InMemoryTableScan`, and the repeated
  * "batch-sized" job reads are Spark counting CACHED-BLOCK reads in
  * `inputMetrics.bytesRead` (the docs cache's memSize equals the
  * suspicious byte count exactly). wave_read_bytes curves therefore
  * measure storage reads PLUS in-memory cache traffic; the cache
  * component is ∝ batch and is not I/O. Growth-slope conclusions are
  * unaffected (slopes come from store/footer reads), but absolute
  * per-wave read levels must not be read as disk bytes.
  *   sbt "runMain graft.tools.BandCachePlanProbe <probeDir>"
  */
object BandCachePlanProbe {
  def main(args: Array[String]): Unit = {
    val probeDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsAll = graft.Tables.documents(spark, probeDir)
    def wave(w: Int): DataFrame =
      docsAll.filter(col("doc_id") >= w.toLong * graft.StreamProbe.ReplicaOffset &&
        col("doc_id") < (w + 1).toLong * graft.StreamProbe.ReplicaOffset)

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(s"graft_bcpp_$p").toString
    val (d, p) = (tmp("dim"), tmp("pairs"))
    // wave 0 commits v0 so wave 1 has history
    graft.streaming.Streaming.bandIndexUpdate(d, p)(wave(0), 0L)

    // wave-1 frames, exactly as bandIndexUpdate builds them
    val batch = wave(1)
    val docs = graft.ops.Dedup.shingledOf(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = graft.ops.Dedup.bandsOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.count()

    def report(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("InMemoryTableScan"))
      val parquets = plan.linesIterator.count(l =>
        l.contains("FileScan parquet") || l.contains("Scan parquet"))
      println(s"== $name: InMemoryTableScan=$scans parquetScan=$parquets")
      if (scans == 0) println(plan.linesIterator.take(25).mkString("\n"))
    }

    report("docs (dataset QE)", docs)
    report("bands (dataset QE)", bands)
    val histBands = spark.read.parquet(s"$d/v0/bands")
      .select(col("band"), col("bh"), col("doc_id"))
    val candLazy = bands.as("a").join(histBands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    report("candLazy (probe join)", candLazy)
    val hist = spark.read.parquet(s"$d/v0/docs")
    report("verify", graft.ops.Dedup.verifyJaccard(candLazy, docs, hist))

    // now the REAL wave-1 action sequence, with the command plans as
    // actually executed (QueryExecutionListener sees the write
    // commands' own QueryExecution, which a Dataset-side explain
    // cannot)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val plan = qe.executedPlan.toString
          val ims = plan.linesIterator.count(_.contains("InMemoryTableScan"))
          // a parquet scan line under an InMemoryTableScan is the
          // printed cached plan, not an executed scan — count only
          // lines at lower indent than the first cache scan
          println(s"## cmd $funcName: InMemoryTableScan=$ims " +
            s"plan_head=${plan.linesIterator.take(3).mkString(" | ")}")
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val readBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) { readBytes.addAndGet(m.inputMetrics.bytesRead); () }
        }
      })
    def bytesOf(tag: String)(body: => Unit): Unit = {
      val b0 = readBytes.get(); body; Thread.sleep(400)
      val rdds = spark.sparkContext.getRDDStorageInfo.map(i =>
        s"rdd${i.id} ${i.numCachedPartitions}/${i.numPartitions} " +
          s"mem=${i.memSize} disk=${i.diskSize}").mkString("; ")
      println(s"$$$$ $tag read=${readBytes.get() - b0} storage=[$rdds]")
    }
    val pairs = graft.ops.Dedup.verifyJaccard(candLazy, docs, hist)
      .select(col("id_a").as("inc_id"), col("id_b").as("hist_id"),
        col("jaccard"))
    bytesOf("pairs.write") {
      pairs.write.mode("overwrite").parquet(s"$p/b1") }
    bytesOf("docs.write") {
      docs.write.mode("overwrite").parquet(s"$d/v1/docs") }
    bytesOf("bands.write") {
      bands.write.mode("overwrite").parquet(s"$d/v1/bands") }
    Thread.sleep(1000)
    spark.stop()
  }
}
