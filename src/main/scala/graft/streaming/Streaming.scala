package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import scala.util.chaining._

/** Structured Streaming surface — the engine's answer to the reference's
  * periodic 6-hour fetch loop with checkpoint resume (Main.py:103,
  * 109-163, 466-518): `readStream → transforms → writeStream` with
  * watermarks, windowed/session aggregations, stateful processing and
  * built-in checkpointing. Each streaming plan is the SAME logical shape
  * as its batch sibling in ops.Events; StreamingSpec asserts equality of
  * results when the parquet fixture is replayed as a stream.
  */
object Streaming {

  /** events schema as stored, with `ts` typed to match the fixture
    * generation at hand (see [[graft.Tables.events]]): TIMESTAMP(NANOS)
    * fixtures read `ts` as a nanos long via nanosAsLong; TIMESTAMP(MICROS,
    * NTZ) fixtures read it as TimestampNTZ. The file stream source needs
    * the schema up front, so probe the footer once through the batch
    * reader (driver-side, metadata only — no data scan). */
  private def eventsRawSchema(spark: SparkSession, sfDir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType), // nanos-long or µs-NTZ, per fixture
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** Stage a single fixture file into a deterministic per-source /tmp
    * directory via symlink (the file-stream source requires a directory —
    * this is what a real deployment's landing directory is). The dir is
    * reused across calls: a fresh createTempDirectory per call leaked a
    * dir+symlink each invocation. */
  private def stagedStreamDir(prefix: String, sfDir: String,
      fileName: String): String = {
    val src = java.nio.file.Paths.get(s"$sfDir/$fileName")
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_${prefix}_stream_" + sfDir.replaceAll("[^a-zA-Z0-9.]", "_"))
    java.nio.file.Files.createDirectories(dir)
    val link = dir.resolve(fileName)
    if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      java.nio.file.Files.createSymbolicLink(link, src)
    dir.toString
  }

  /** S3-equivalent source: replay the events parquet as a file stream.
    * The `ts` normalization mirrors [[graft.Tables.events]] so the
    * streamed and batch frames are column-identical. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(eventsRawSchema(spark, sfDir))
      .parquet(stagedStreamDir("events", sfDir, "events.parquet"))
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", raw("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** e01 streaming sibling: watermarked tumbling-window aggregation. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"),
        col("total_value"))

  /** e02 streaming sibling: watermarked session windows per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming dedup with bounded state (first event per user+type). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  val documentsRawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The documents corpus replayed as a file stream (same landing-dir
    * staging as [[eventsStream]]). Documents carry no event time, so
    * arrival time is synthesized deterministically from doc_id — exactly
    * what an ingest pipeline's landing timestamp is. */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(documentsRawSchema)
      .parquet(stagedStreamDir("docs", sfDir, "documents.parquet"))
      // offset away from the epoch: a ts exactly AT the initial watermark
      // (doc_id 0 → 1970-01-01T00:00:00) is judged late and dropped
      .withColumn("ts", expr("timestamp_micros(doc_id + 86400000000)"))

  /** Streaming exact dedup over a document stream — the curation analog
    * of the reference's periodic re-run: each micro-batch keeps only
    * content hashes not already seen within the watermark, so the
    * batch-x10 exact dedup becomes continuous. State is the seen-hash
    * set BOUNDED by the watermark (hashes older than the horizon are
    * evicted — the requirement for an unbounded ingest stream; an
    * infinite-retention dedup would be `dropDuplicates`, whose state
    * only grows). Emits (doc_id, content_hash) of the kept docs.
    * StreamingSpec proves the kept hash set ≡ batch x10's hash set over
    * the finite replay. */
  def docDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("content_hash"))

  /** x52 streaming sibling: deterministic mixture admission over a
    * document stream. STATELESS by construction — admission is a pure
    * function of (doc_id, source) via the shared
    * [[graft.ops.Sampling.admitPermille]] hash and
    * [[graft.ops.Sampling.sourceWeight]] — so there is no state store,
    * no watermark, and replays/restarts admit the identical set the
    * batch x52 does (StreamingSpec proves set equality over the finite
    * replay). This is the property that makes hash admission (never
    * `rand()`) the right mixing primitive for a continuous-ingest
    * pipeline. */
  def mixtureAdmit(docs: DataFrame): DataFrame = {
    val w = graft.ops.Sampling.sourceWeight(col("source"))
    docs
      .filter(graft.ops.Sampling.admitPermille(col("doc_id")) < w)
      .select(col("doc_id"), col("source"),
        w.cast("long").as("weight_permille"))
  }

  /** x69 streaming sibling: model-based quality filtering AT INGEST —
    * the point a crawl pipeline actually runs its classifier, before
    * anything lands. STATELESS like [[mixtureAdmit]]: the score is a
    * pure function of the text and the FROZEN trained weights (the
    * batch-trained [[graft.ops.TextAnalysis.classifierWeights]] model,
    * shipped with the query as a constant array — exactly how a crawl
    * pipeline deploys an offline-trained classifier) via the shared
    * [[graft.ops.TextAnalysis.classifierScoreMicro]] path (hashed
    * bag-of-words, no vocabulary dim, no state store, no watermark), so
    * replays admit exactly the batch x69 kept set. */
  def classifierAdmit(docs: DataFrame, weights: Array[Long]): DataFrame = {
    graft.functions.CustomExprs.register(docs.sparkSession)
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("feat_sum_micro",
        graft.ops.TextAnalysis.classifierScoreMicro(col("w"), weights))
      .filter(col("feat_sum_micro") > 0)
      .select(col("doc_id"), col("lang"), col("feat_sum_micro"))
  }

  /** STREAM-STATIC enrichment — the standard slowly-changing-dimension
    * pattern of a streaming pipeline: each micro-batch of events joins
    * a static (batch) dimension, re-planned per batch so dim updates
    * between batches are picked up, with the dim broadcast (no stream
    * shuffle, no state store — stream-static joins need none). Left
    * join: an event never blocks on a missing dim row. StreamingSpec
    * proves the finite replay equals the batch join exactly. */
  def staticEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** x45 streaming sibling — the corpus-self-trained unigram LM
    * maintained INCREMENTALLY: foreachBatch merges each micro-batch's
    * word counts into a versioned parquet count dim (the x18
    * persisted-index pattern applied to the LM model — the reference's
    * 6-hour-cycle analog for the curation side). Count merge is
    * associative and commutative, so after any ingested prefix —
    * regardless of micro-batch boundaries or arrival order — the dim
    * equals the batch-trained model on that prefix, and end-of-stream
    * scoring with it reproduces batch x45 bit-exactly (StreamingSpec,
    * 2-batch replayed split).
    *
    * Exactly-once without a transactional store: batch b merges the
    * newest COMMITTED version with id < b (never the dir it is itself
    * writing), writes `v<b>` once, and readers pick the newest version
    * with a `_SUCCESS` marker. A replay of an already-committed batch
    * is a NO-OP (skip on the marker) rather than an idempotent
    * rewrite: mode-overwrite would delete the committed dir (marker
    * included) before rewriting it, and a concurrent [[unigramModel]]
    * reader that already resolved that version would read a
    * disappearing parquet dir — the torn-version hazard the other
    * updaters in this file document. The tokenizer and count shapes
    * are shared with batch x45 ([[graft.ops.TextAnalysis
    * .unigramWords]]/`unigramCounts`) so the two trainers cannot
    * drift. */
  def unigramModelUpdate(dimDir: String)(batch: DataFrame, batchId: Long): Unit = {
    if (new java.io.File(s"$dimDir/v$batchId/_SUCCESS").isFile) return
    val spark = batch.sparkSession
    val counts = graft.ops.TextAnalysis.unigramCounts(
      graft.ops.TextAnalysis.unigramWords(batch))
    val prior = modelVersions(dimDir).filter(_ < batchId)
    requirePredecessorState(dimDir, batchId, prior)
    val merged =
      if (prior.isEmpty) counts
      else spark.read.parquet(s"$dimDir/v${prior.max}")
        .union(counts).groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
    merged.write.mode("overwrite").parquet(s"$dimDir/v$batchId")
  }

  /** The fresh-DIM direction of the lifecycle guard: a resumed batch
    * (id ≥ 1) whose predecessor version is gone means the dim dir was
    * emptied or swapped mid-lineage — merging would silently serve a
    * "model"/blocklist containing only this batch's data. Batch-0
    * retries have no predecessor and pass (offsets are logged before
    * the batch function runs, so a crash mid-batch-0 legitimately
    * resumes onto an empty dim). [[requireSharedLifecycle]] catches the
    * fresh-CHECKPOINT direction at start-up. */
  private def requirePredecessorState(dimDir: String, batchId: Long,
      prior: Seq[Long]): Unit =
    require(batchId == 0 || prior.nonEmpty,
      s"batch $batchId resumed but $dimDir holds no prior committed " +
        "version — dim dir and checkpoint have diverged")

  /** A dim dir and its stream checkpoint share ONE lifecycle: version
    * ids are micro-batch ids, which restart at 0 under a fresh
    * checkpoint — resuming into a dimDir populated by a PREVIOUS
    * lineage would silently merge/serve the old run's state (its max
    * version can shadow the new run's). Refuse the mismatch up front. */
  private def requireSharedLifecycle(dimDir: String, ckptDir: String): Unit = {
    val freshCkpt = !java.nio.file.Files.exists(
      java.nio.file.Paths.get(ckptDir, "offsets"))
    require(!(freshCkpt && modelVersions(dimDir).nonEmpty),
      s"$dimDir already holds versions from another stream lineage but " +
        s"checkpoint $ckptDir is fresh — use a new dim dir (or the old " +
        "checkpoint) so batch ids and versions stay aligned")
  }

  /** The output-slice direction of the lifecycle guard — ONE
    * definition for every builder that emits per-batch `b<k>` slices
    * (band pairs, span rewrites, decontam rewrites, ledger rows):
    * batch ids restart at 0 under a fresh checkpoint, and a longer
    * dead lineage's extra `b<k>` slices would survive the new run's
    * overwrites and be silently unioned by the committed-slice
    * readers. Refuse the mismatch up front, like
    * [[requireSharedLifecycle]] does for the dim direction. */
  private def requireSliceLifecycle(sliceDir: String, ckptDir: String,
      what: String): Unit = {
    val freshCkpt = !java.nio.file.Files.exists(
      java.nio.file.Paths.get(ckptDir, "offsets"))
    val staleSlices = Option(new java.io.File(sliceDir).listFiles())
      .toSeq.flatten
      .exists(f => f.isDirectory && f.getName.matches("b\\d+"))
    require(!(freshCkpt && staleSlices),
      s"$sliceDir already holds $what slices from another stream " +
        s"lineage but checkpoint $ckptDir is fresh — use a new dir " +
        "(or the old checkpoint) so batch ids and slices stay aligned")
  }

  /** Union of every COMMITTED per-batch `b<k>` slice under
    * `slicesDir` — ONE definition of the reader gate all streamed-
    * output accessors share: a slice counts iff `markerFor(k)` exists
    * (the batch's single commit point; updaters write slices first,
    * marker last, so a crash in that window leaves the slice
    * invisible until the replay re-commits it), `empty` before any
    * commit. */
  private def committedSlices(spark: SparkSession, slicesDir: String,
      markerFor: String => java.nio.file.Path)(
      empty: => DataFrame): DataFrame = {
    val slices = Option(new java.io.File(slicesDir).listFiles())
      .toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches("b\\d+"))
      .filter(f => java.nio.file.Files.isRegularFile(
        markerFor(f.getName.drop(1))))
      .map(_.getPath)
    if (slices.isEmpty) empty else spark.read.parquet(slices: _*)
  }

  /** Committed model versions (dirs `v<batchId>` carrying `_SUCCESS`). */
  private def modelVersions(dimDir: String): Seq[Long] = {
    val d = new java.io.File(dimDir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getName.drop(1).toLong)
  }

  /** The newest committed incremental model, or None before batch 0. */
  def unigramModel(spark: SparkSession, dimDir: String): Option[DataFrame] =
    modelVersions(dimDir) match {
      case Seq() => None
      case vs    => Some(spark.read.parquet(s"$dimDir/v${vs.max}"))
    }

  /** Run the incremental trainer over a documents stream to completion
    * (AvailableNow over the staged landing dir). */
  def trainUnigramModel(docs: DataFrame, dimDir: String,
      ckptDir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    requireSharedLifecycle(dimDir, ckptDir)
    val q = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        unigramModelUpdate(dimDir)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** x27 streaming sibling — the decontamination BLOCKLIST maintained
    * incrementally: each micro-batch of newly-evaluated benchmark docs
    * bit-ORs its shingle sketch into the persisted Bloom blocklist
    * ("never train on anything we have EVER evaluated" needs exactly
    * this: the blocklist only grows, and the sketch stays a fixed
    * [[graft.ops.Dedup.BloomNumBits]] however many benchmarks
    * accumulate). Bloom insertion is an idempotent, commutative bitwise
    * OR, so the merged sketch is BYTE-IDENTICAL to the batch-built one
    * regardless of micro-batch boundaries, arrival order, or replays —
    * a stronger streaming ≡ batch claim than set equality, and
    * StreamingSpec asserts it at the byte level. Same versioned-dir
    * exactly-once shape as [[unigramModelUpdate]]. */
  def blocklistUpdate(dimDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val bytes = graft.ops.Dedup.bloomSketchOf(batch)
    val prior = modelVersions(dimDir).filter(_ < batchId)
    requirePredecessorState(dimDir, batchId, prior)
    // an empty micro-batch still COMMITS (an empty sketch / the carried
    // prior): every processed batch id must leave a version behind, or
    // the predecessor-state guard above couldn't tell "batch was empty"
    // from "accumulated state was lost"
    def emptySketch: Array[Byte] = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(
        graft.ops.Dedup.BloomExpectedItems, graft.ops.Dedup.BloomNumBits)
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    val merged = (Option(bytes), prior) match {
      case (None, Seq())   => emptySketch
      case (None, ps)      => Files.readAllBytes(
        Paths.get(s"$dimDir/v${ps.max}/sketch.bin"))
      case (Some(b), Seq()) => b
      case (Some(b), ps)   =>
        import org.apache.spark.util.sketch.BloomFilter
        val acc = BloomFilter.readFrom(new java.io.ByteArrayInputStream(
          Files.readAllBytes(Paths.get(s"$dimDir/v${ps.max}/sketch.bin"))))
        acc.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))
        val out = new java.io.ByteArrayOutputStream()
        acc.writeTo(out)
        out.toByteArray
    }
    val vdir = Paths.get(s"$dimDir/v$batchId")
    Files.createDirectories(vdir)
    // commit via temp + atomic rename: a retried already-committed batch
    // must never truncate-and-rewrite sketch.bin in place while the prior
    // _SUCCESS still stands — a concurrent blocklist() reader could
    // observe a half-written sketch. After the move, the committed bytes
    // are either the old complete sketch or the new identical one.
    val tmp = vdir.resolve("sketch.bin.tmp")
    Files.write(tmp, merged)
    Files.move(tmp, vdir.resolve("sketch.bin"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.write(vdir.resolve("_SUCCESS"), Array.emptyByteArray) // commit marker
  }

  /** The newest committed blocklist sketch, or None before batch 0. */
  def blocklist(dimDir: String): Option[Array[Byte]] =
    modelVersions(dimDir) match {
      case Seq() => None
      case vs    => Some(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dimDir/v${vs.max}/sketch.bin")))
    }

  /** Run the incremental blocklist builder over a benchmark-doc stream
    * to completion (AvailableNow). */
  def buildBlocklist(docs: DataFrame, dimDir: String, ckptDir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    requireSharedLifecycle(dimDir, ckptDir)
    val q = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        blocklistUpdate(dimDir)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** x18 streaming sibling — incremental NEAR-DUP dedup: the LSH band
    * index persisted per micro-batch and PROBED by every subsequent
    * batch, so continuous ingestion pays batch × matching-bucket cost
    * per arrival, never history × history. Each micro-batch:
    *
    *  1. probes the accumulated index — the union of all committed
    *     prior version slices — with its own band keys (the same
    *     (band, bh) equi join as batch x18),
    *  2. exact-verifies candidates from the stored shingle arrays at
    *     the same J ≥ 0.3 gate (emitted pairs are exact, as everywhere
    *     in the dedup family),
    *  3. writes its verified (inc_id, hist_id, jaccard) pairs to an
    *     idempotent per-batch output dir, and
    *  4. commits its OWN bands + shingles as version `v<batchId>`.
    *
    * Unlike the unigram/blocklist dims (merged state, rewritten per
    * batch), the band index is APPEND-ONLY: versions are disjoint batch
    * slices and the index is their union — per-batch write cost scales
    * with the batch, not the accumulated history, which is what makes
    * the pattern sustainable on an unbounded stream. The READ side is
    * bounded by [[compactBandIndex]] (r19): probes stand on the newest
    * compacted store + O(K) tail slices, and the shingle verify prunes
    * to the candidates' kb_bucket partitions.
    * Same versioned-dir exactly-once shape as [[unigramModelUpdate]]:
    * a retried batch recomputes byte-identical slices and pairs from
    * inputs a retry cannot have touched, and readers only see versions
    * with a `_SUCCESS` marker. StreamingSpec replays a 2-wave split
    * (history wave, then increment wave) and proves the streamed pair
    * set ≡ batch x18's on the same split. */
  def bandIndexUpdate(dimDir: String, pairsDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val spark = batch.sparkSession
    // replay of an ALREADY-COMMITTED batch (foreachBatch commits its
    // offsets before the epoch is logged, so a crash in that window
    // replays the batch): the marker is written last, so its presence
    // means docs, bands AND the pair slice are all fully on disk — and
    // a recompute is byte-identical by construction. Rewriting in
    // place would tear the version down under a concurrent reader
    // (mode overwrite deletes first), the exact half-committed-read
    // hazard blocklistUpdate avoids via atomic rename. Skip instead.
    if (Files.isRegularFile(Paths.get(s"$dimDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(dimDir).filter(_ < batchId)
    requirePredecessorState(dimDir, batchId, prior)
    val docs = graft.ops.Dedup.shingledOf(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted like docs: bands feeds the cross-history probe AND its
    // own slice write — separate actions, so without the persist the
    // 32-hash signature aggregation runs twice per micro-batch
    // (exchange reuse cannot span write jobs; same fix as
    // datasheetUpdate)
    val bands = graft.ops.Dedup.bandsOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs =
      if (prior.isEmpty)
        // batch 0 probes an empty index — commit an empty pair slice so
        // the pairs dir mirrors processed batches (same reasoning as the
        // blocklist's empty-batch commit)
        spark.emptyDataFrame
          .select(lit(0L).as("inc_id"), lit(0L).as("hist_id"),
            lit(0.0).as("jaccard")).limit(0)
      else {
        // history = newest compaction store + O(K) tail slices (r19):
        // pre-compaction, every wave re-opened ALL prior slices — at
        // 32 shuffle files per slice the per-wave footer/listing read
        // alone grew ∝ wave count (measured ~91 KB/wave on the r19
        // probe corpus, the dominant residual slope after the
        // keep-best store bucketing). Falls back to the all-slices
        // scan when no compaction exists, correctness unchanged.
        val histBands = bandHistBands(spark, dimDir, prior)
        val candLazy = bands.as("a").join(histBands.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
        val (cand, hist) = bandVerifyInputs(spark, dimDir, prior, candLazy)
        graft.ops.Dedup.verifyJaccard(cand, docs, hist)
          .select(col("id_a").as("inc_id"), col("id_b").as("hist_id"),
            col("jaccard"))
      }
    pairs.write.mode("overwrite").parquet(s"$pairsDir/b$batchId")
    // commit this batch's index slice LAST, marker after both writes:
    // a crash between the slice writes leaves no _SUCCESS, so readers
    // and resumed lineages never see a half-committed version
    docs.write.mode("overwrite").parquet(s"$dimDir/v$batchId/docs")
    bands.write.mode("overwrite").parquet(s"$dimDir/v$batchId/bands")
    bands.unpersist(blocking = false)
    docs.unpersist(blocking = false)
    Files.write(Paths.get(s"$dimDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** x70 streaming sibling — incremental SUBSTRING dedup: the
    * frequent-span problem at ingest. Each arriving batch is rewritten
    * against the accumulated span index (every distinct 13-token span
    * of every prior batch, append-only version slices like
    * [[bandIndexUpdate]]'s): an occurrence is cut if its span was EVER
    * seen before (history wins — the already-emitted first occurrence
    * is immutable), or if it repeats across ≥2 distinct docs within
    * the batch and is not the batch's first (batch x70's rule applied
    * to the slice). Per-batch cost: batch grams × (index probe + one
    * batch-local aggregation) — never history × history, and the index
    * write is the batch's distinct spans only.
    *
    * Relation to batch x70, provable on doc_id-ordered waves: the
    * stream's cut set is a SUBSET of batch x70's (every streamed cut
    * has an earlier same-span occurrence, which batch flags too), with
    * equality unless a span repeats WITHIN an early doc and only later
    * crosses the doc boundary — the one case whose batch verdict
    * (`cut the early doc's internal repeat`) would require rewriting
    * already-emitted output, which streaming by definition cannot do.
    * StreamingSpec pins exact equality on the fixture's range-split
    * waves and the subset guarantee is structural. */
  def spanIndexUpdate(dimDir: String, outDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val spark = batch.sparkSession
    // committed replay is a no-op (same reasoning as bandIndexUpdate)
    if (Files.isRegularFile(Paths.get(s"$dimDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(dimDir).filter(_ < batchId)
    requirePredecessorState(dimDir, batchId, prior)
    val docs = batch.select(col("doc_id"), col("text"))
      .withColumn("w", split(col("text"), " "))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = graft.ops.Dedup.gramsOf(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val histHits =
      if (prior.isEmpty)
        g.select(col("doc_id"), col("pos")).limit(0)
      else {
        // history = tiered manifest stores + O(K) tail slices (r19):
        // the pre-compaction form re-opened every prior slice per wave
        val hist = spark.read.parquet(
          unionStorePaths(dimDir, prior, "spans"): _*)
        g.join(hist, Seq("ng"), "left_semi").select(col("doc_id"), col("pos"))
      }
    val key = graft.ops.Dedup.occKeyOf(col("doc_id"), col("pos"))
    val batchStats = g.groupBy(col("ng"))
      .agg(countDistinct(col("doc_id")).as("nd"), min(key).as("first_key"))
      .filter(col("nd") >= 2)
    val batchCuts = g.join(batchStats, "ng")
      .filter(key =!= col("first_key"))
      .select(col("doc_id"), col("pos"))
    val flagged = histHits.union(batchCuts).distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("fs"))
    graft.ops.Dedup.rewriteFromFlags(docs, flagged)
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
    // commit the span slice LAST, marker after both writes — readers
    // gate output slices on the version marker (streamedRewrites)
    g.select(col("ng")).distinct()
      .write.mode("overwrite").parquet(s"$dimDir/v$batchId/spans")
    g.unpersist(blocking = false)
    docs.unpersist(blocking = false)
    Files.write(Paths.get(s"$dimDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** Compact a span-index lineage at its newest committed version —
    * [[compactUnionStore]] on the span direction (the probe is a
    * left_semi on uniform span hashes, so arrival-range buckets
    * cannot prune it; the wins are the deduplicated size-tiered
    * stores and O(log W + K) dirs per probe instead of O(waves)).
    * Idempotent; torn dirs invisible without the manifest marker. */
  def compactSpanIndex(spark: SparkSession, dimDir: String): Unit =
    compactUnionStore(spark, dimDir, "spans", Seq("ng"),
      distinctStore = true)

  /** One maintained span-index wave WITH the compaction cadence —
    * [[bandIndexMaintain]] on the substring direction.
    * `compactEvery <= 0` disables. */
  private[graft] def spanIndexMaintain(dimDir: String, outDir: String,
      compactEvery: Int)(batch: DataFrame, batchId: Long): Unit = {
    spanIndexUpdate(dimDir, outDir)(batch, batchId)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactSpanIndex(batch.sparkSession, dimDir)
  }

  /** Every committed batch's rewritten documents (the stream's output
    * corpus so far). Slices gate on the `v<k>/_SUCCESS` marker exactly
    * like [[streamedNearDupPairs]] — an output slice whose batch never
    * committed is invisible. */
  def streamedRewrites(spark: SparkSession, dimDir: String,
      outDir: String): DataFrame =
    committedSlices(spark, outDir,
        k => java.nio.file.Paths.get(s"$dimDir/v$k/_SUCCESS")) {
      spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("n_words"),
          lit(0L).as("n_dup_occurrences"), lit(0L).as("n_removed"),
          lit("").as("clean_text")).limit(0)
    }

  /** x76 streaming sibling — incremental DECONTAMINATION REWRITE over a
    * train-documents stream against a STATIC benchmark span dim.
    *
    * The structural difference from the x70 sibling above: benchmarks
    * are a fixed artifact, so the dim never grows and each micro-batch
    * depends ONLY on its own docs plus the dim — probe (left-semi on
    * the exact span string, x47's no-hash-collision reasoning), flag
    * starts, rewrite (shared [[graft.ops.Dedup.rewriteFromFlags]]),
    * write the slice. Streamed output therefore equals batch x76
    * EXACTLY on ANY wave split (no keep-first cross-batch coupling),
    * and no version chain is needed: the parquet committer's _SUCCESS
    * inside each `b<k>` slice is the single commit point (x70's
    * separate `v<k>` marker exists only to make its TWO per-batch
    * artifacts atomic — here there is one), and a foreachBatch replay
    * of a torn slice overwrites it byte-identically.
    *
    * At 100 TB: per-batch cost is batch grams × one broadcast-dim
    * probe — the x18 band-index property (work ∝ increment, never ∝
    * history), with an even stronger guarantee because the dim is
    * constant. */
  def benchSpanDim(bench: DataFrame, dimDir: String): Unit =
    graft.ops.Dedup.gramsOf(
        bench.select(col("doc_id"), col("text"))
          .withColumn("w", split(col("text"), " ")))
      .select(col("ng")).distinct()
      .write.mode("overwrite").parquet(s"$dimDir/spans")

  /** One micro-batch of the decontamination rewrite (foreachBatch
    * body). Committed replay short-circuits on the slice's own
    * _SUCCESS. */
  def decontamRewriteUpdate(dimDir: String, outDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    if (Files.isRegularFile(Paths.get(s"$outDir/b$batchId/_SUCCESS"))) return
    val spark = batch.sparkSession
    // bench spans are tiny relative to any training corpus (x47's
    // broadcast reasoning, same as batch x76's core)
    val dim = broadcast(spark.read.parquet(s"$dimDir/spans"))
    val docs = batch.select(col("doc_id"), col("text"))
      .withColumn("w", split(col("text"), " "))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val flagged = graft.ops.Dedup.gramsOf(docs)
      .join(dim, Seq("ng"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("fs"))
    graft.ops.Dedup.rewriteFromFlags(docs, flagged)
      .select(col("doc_id"), col("n_words"),
        col("n_dup_occurrences").as("n_contam_occurrences"),
        col("n_removed"), col("clean_text"))
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
    docs.unpersist(blocking = false)
  }

  /** Run the incremental decontamination rewrite to completion
    * (AvailableNow). The bench dim must already exist ([[benchSpanDim]]
    * — it is lifecycle-independent precisely because it is static);
    * the fresh-checkpoint-vs-stale-slices guard mirrors
    * [[buildSpanIndex]]. */
  def buildDecontamRewrites(train: DataFrame, dimDir: String,
      outDir: String, ckptDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    require(Files.exists(Paths.get(s"$dimDir/spans")),
      s"bench span dim missing under $dimDir — run benchSpanDim first")
    Files.createDirectories(Paths.get(outDir))
    requireSliceLifecycle(outDir, ckptDir, "rewrite")
    val q = train.writeStream
      .foreachBatch(decontamRewriteUpdate(dimDir, outDir) _)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Every committed batch's decontaminated documents. A slice is
    * committed iff its own parquet _SUCCESS exists (see
    * [[decontamRewriteUpdate]] — the slice is this sibling's single
    * per-batch artifact). */
  def streamedDecontamRewrites(spark: SparkSession,
      outDir: String): DataFrame =
    committedSlices(spark, outDir,
        k => java.nio.file.Paths.get(s"$outDir/b$k/_SUCCESS")) {
      spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("n_words"),
          lit(0L).as("n_contam_occurrences"), lit(0L).as("n_removed"),
          lit("").as("clean_text")).limit(0)
    }

  /** x77 streaming sibling — incremental REJECTION LEDGER: verdicts
    * for each arriving micro-batch against the ACCUMULATED sha→keeper
    * dim, x18-band-index style (probe ∝ batch, never ∝ history):
    *
    *  - classifier verdicts are map-only on the batch (x69 scoring);
    *  - a batch doc whose sha is already committed is `exact_dup`
    *    against the HISTORICAL keeper (keep-first: history wins, the
    *    streaming analog of batch x77's min-id rule — coincides with
    *    batch exactly on doc_id-ordered waves, the x70 sibling's
    *    provability regime);
    *  - shas new to history take their batch-local min admitted id as
    *    keeper; that slice is appended to the dim.
    *
    * Two artifacts per batch (ledger slice + dim slice) → the x70
    * marker discipline: both writes, THEN the `v<k>/_SUCCESS` marker;
    * readers gate on the marker; committed replay is a no-op. */
  def ledgerUpdate(dimDir: String, outDir: String, weights: Array[Long])(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    if (Files.isRegularFile(Paths.get(s"$dimDir/v$batchId/_SUCCESS"))) return
    val spark = batch.sparkSession
    graft.functions.CustomExprs.register(spark)
    val prior = modelVersions(dimDir).filter(_ < batchId)
    requirePredecessorState(dimDir, batchId, prior)
    val scored = batch.select(col("doc_id"), col("text"))
      .withColumn("w0", split(col("text"), " "))
      .withColumn("feat_sum_micro",
        graft.ops.TextAnalysis.classifierScoreMicro(col("w0"), weights))
      .withColumn("h", sha2(col("text"), 256))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist =
      if (prior.isEmpty)
        scored.select(col("h"), col("doc_id").as("hist_keeper")).limit(0)
      else
        // history = tiered manifest stores + O(K) tail slices (r19):
        // the pre-compaction form re-opened every prior shas slice
        spark.read.parquet(unionStorePaths(dimDir, prior, "shas"): _*)
          // by NAME — the slice is written via groupBy/agg/join, whose
          // column order is an implementation detail a positional
          // rename would silently mislabel
          .select(col("h"), col("keeper").as("hist_keeper"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    val ledger = scored
      .withColumn("batch_keeper",
        min(when(col("feat_sum_micro") > 0, col("doc_id"))).over(w))
      .join(hist, Seq("h"), "left")
      .withColumn("keeper", coalesce(col("hist_keeper"), col("batch_keeper")))
      .select(col("doc_id"), col("feat_sum_micro"),
        when(col("feat_sum_micro") <= 0, lit("classifier"))
          .when(col("doc_id") =!= col("keeper"), lit("exact_dup"))
          .otherwise(lit("kept")).as("stage"),
        when(col("feat_sum_micro") <= 0, lit(null).cast("long"))
          .otherwise(col("keeper")).as("keeper_id"))
    ledger.write.mode("overwrite").parquet(s"$outDir/b$batchId")
    // dim slice: shas NEW to history, keyed by their batch keeper
    scored.filter(col("feat_sum_micro") > 0)
      .groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
      .join(hist, Seq("h"), "left_anti")
      .write.mode("overwrite").parquet(s"$dimDir/v$batchId/shas")
    scored.unpersist(blocking = false)
    Files.write(Paths.get(s"$dimDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** Every committed batch's ledger rows, gated on the version marker
    * like [[streamedRewrites]]. */
  def streamedLedger(spark: SparkSession, dimDir: String,
      outDir: String): DataFrame =
    committedSlices(spark, outDir,
        k => java.nio.file.Paths.get(s"$dimDir/v$k/_SUCCESS")) {
      spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("feat_sum_micro"),
          lit("").as("stage"), lit(0L).as("keeper_id")).limit(0)
    }

  /** Compact a ledger lineage at its newest committed version —
    * [[compactUnionStore]] on the sha direction. shas slices are
    * already DISJOINT (each is anti-joined against history at write
    * time), so merges union without a distinct pass and the tiered
    * stores partition the accumulated (h, keeper) set exactly. */
  def compactLedgerIndex(spark: SparkSession, dimDir: String): Unit =
    compactUnionStore(spark, dimDir, "shas", Seq("h", "keeper"),
      distinctStore = false)

  /** One maintained ledger wave WITH the compaction cadence —
    * [[spanIndexMaintain]] on the sha direction. */
  private[graft] def ledgerMaintain(dimDir: String, outDir: String,
      weights: Array[Long], compactEvery: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    ledgerUpdate(dimDir, outDir, weights)(batch, batchId)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactLedgerIndex(batch.sparkSession, dimDir)
  }

  /** Run the incremental ledger to completion (AvailableNow); same
    * lifecycle guards as [[buildSpanIndex]]. */
  def buildLedger(docs: DataFrame, dimDir: String, outDir: String,
      ckptDir: String, weights: Array[Long],
      compactEvery: Int = 8): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    requireSharedLifecycle(dimDir, ckptDir)
    requireSliceLifecycle(outDir, ckptDir, "ledger")
    val q = docs.writeStream
      .foreachBatch(ledgerMaintain(dimDir, outDir, weights,
        compactEvery) _)
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** x73/x74 streaming sibling — the corpus DATASHEET maintained
    * incrementally per micro-batch. Everything the report needs is
    * kept in MERGEABLE state, so after any ingested prefix the
    * composed datasheet equals batch x73 on that prefix EXACTLY —
    * counters, min/max, sources, dup counts, and the interpolated
    * median — on ANY wave split (no ordering regime):
    *
    *  - `hist`: per-(lang, n_tokens) doc counts — counts merge where
    *    running quantiles don't, and the reader recomputes the EXACT
    *    interpolated median from the merged histogram (its size is
    *    langs × distinct doc lengths — a dim, not a corpus, at any
    *    scale; x74's t-digest is the fallback if doc lengths were
    *    unbounded);
    *  - `src`: per-(lang, source) counts → exact `n_sources` (the
    *    rollup-exploding exact distinct x74 avoids is free here
    *    because the dim already holds the distinct pairs; HLL would
    *    drop the second grouping column at crawl-source cardinality);
    *  - `sh`+`bands`: append-only shingle + LSH band slices (exactly
    *    x18's index pattern). Batch x73's `n_dup_docs` comes from
    *    [[graft.ops.Dedup.ccLabels]] ← [[graft.ops.Dedup
    *    .minhashLshPairs]], i.e. the 8×4 banded MinHash index with
    *    exact-Jaccard verification — so the streamed sibling uses THE
    *    SAME engine: within-batch pairs from the band self-join,
    *    cross-history pairs from probing the accumulated band slices,
    *    both exact-verified from the stored shingle arrays via the
    *    shared [[graft.ops.Dedup.verifyJaccard]]. A doc's band keys
    *    depend only on its own shingles (deterministic xxhash64
    *    family, no stored coefficients), so a pair is a candidate
    *    independent of which wave each endpoint landed in: within ∪
    *    cross over all batches is batch `minhashLshPairs`' pair set on
    *    ANY corpus and ANY split. (An earlier form used the exact
    *    x13 inverted index here, which matches batch only where LSH
    *    recall is total, and whose per-batch df cap made the candidate
    *    set wave-dependent — StreamingSpec now plants a mid-band pair
    *    the banding provably misses to pin the engine choice);
    *  - `pairs`: per-batch discovered pair slices with BOTH endpoint
    *    langs embedded (inc from the batch, hist from the stored
    *    slice), so the reader never joins back to the corpus.
    *
    * Same versioned-dir exactly-once shape as [[unigramModelUpdate]]
    * (merged hist/src rewritten per version; sh/bands/pairs append-only
    * slices; `_SUCCESS` marker last; committed replay is a no-op). */
  def datasheetUpdate(dimDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    if (Files.isRegularFile(Paths.get(s"$dimDir/v$batchId/_SUCCESS"))) return
    val spark = batch.sparkSession
    graft.functions.CustomExprs.register(spark)
    val prior = modelVersions(dimDir).filter(_ < batchId)
    requirePredecessorState(dimDir, batchId, prior)
    val docs = batch.select(col("doc_id"), col("lang"), col("source"),
        col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def merged(name: String, batchCounts: DataFrame,
        keys: Seq[String]): DataFrame =
      if (prior.isEmpty) batchCounts
      else spark.read.parquet(s"$dimDir/v${prior.max}/$name")
        .unionByName(batchCounts)
        .groupBy(keys.map(col): _*).agg(sum(col("cnt")).as("cnt"))
    val hist = merged("hist",
      docs.select(col("lang"),
          call_function("word_count", col("text")).cast("long")
            .as("n_tokens"))
        .groupBy("lang", "n_tokens").agg(count(lit(1)).as("cnt")),
      Seq("lang", "n_tokens"))
    val src = merged("src",
      docs.groupBy("lang", "source").agg(count(lit(1)).as("cnt")),
      Seq("lang", "source"))
    // near-dup pairs: the SAME 8×4 banded index as batch x73's dup
    // counter (ccLabels ← minhashLshPairs) — within-batch band
    // self-join plus the cross-history band probe, both exact-verified
    // from the stored shingle arrays (see the scaladoc above for why
    // banding, not the exact inverted index, is the correct engine)
    val sh = graft.ops.Dedup.shingledOf(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted like sh: bands feeds the within self-join, the
    // cross-history probe, AND its own slice write — three separate
    // actions; without the persist the 32-hash signature aggregation
    // re-runs per action (exchange reuse cannot span write jobs)
    val bands = graft.ops.Dedup.bandsOf(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val langOf = docs.select(col("doc_id"), col("lang"))
    val within = graft.ops.Dedup.verifyJaccard(
        graft.ops.Dedup.bandSelfCandidates(bands), sh, sh)
      .join(langOf.select(col("doc_id").as("id_a"), col("lang").as("lang_a")),
        "id_a")
      .join(langOf.select(col("doc_id").as("id_b"), col("lang").as("lang_b")),
        "id_b")
      .select("id_a", "lang_a", "id_b", "lang_b")
    val pairs =
      if (prior.isEmpty) within
      else {
        // history = newest compaction + O(K) tail slices, the verify
        // pruned to the candidates' id_b buckets (r19) — the
        // bandIndexUpdate machinery, SHARED so the two dup engines
        // cannot drift. The pruned histSh also serves the lang_b
        // join-back: verified pairs are ⊆ candidates, whose buckets
        // the pruned frame includes by construction.
        val histBands = bandHistBands(spark, dimDir, prior)
        val candLazy = bands.as("a").join(histBands.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
        val (cand, histSh) = bandVerifyInputs(spark, dimDir, prior,
          candLazy, docsPart = "sh",
          docsCols = Seq("doc_id", "sh", "nsh", "lang"))
        val cross = graft.ops.Dedup.verifyJaccard(cand, sh, histSh)
          .join(langOf.select(col("doc_id").as("id_a"),
            col("lang").as("lang_a")), "id_a")
          .join(histSh.select(col("doc_id").as("id_b"),
            col("lang").as("lang_b")), "id_b")
          .select("id_a", "lang_a", "id_b", "lang_b")
        within.unionByName(cross)
      }
    // slices first, marker last (bandIndexUpdate's commit discipline)
    hist.write.mode("overwrite").parquet(s"$dimDir/v$batchId/hist")
    src.write.mode("overwrite").parquet(s"$dimDir/v$batchId/src")
    pairs.write.mode("overwrite").parquet(s"$dimDir/v$batchId/pairs")
    sh.write.mode("overwrite").parquet(s"$dimDir/v$batchId/sh")
    bands.write.mode("overwrite").parquet(s"$dimDir/v$batchId/bands")
    bands.unpersist(blocking = false)
    sh.unpersist(blocking = false)
    docs.unpersist(blocking = false)
    Files.write(Paths.get(s"$dimDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** The composed streamed datasheet — batch x73's exact report shape
    * ((lang | ALL) × counters × exact interpolated median) assembled
    * from the newest committed state: merged hist/src dims plus the
    * union of committed pair slices. Dim-sized work only — nothing
    * here touches the corpus. */
  def streamedDatasheet(spark: SparkSession, dimDir: String): DataFrame = {
    import spark.implicits._
    val vs = modelVersions(dimDir)
    require(vs.nonEmpty, s"no committed datasheet versions under $dimDir")
    val hist0 = spark.read.parquet(s"$dimDir/v${vs.max}/hist")
    val src0 = spark.read.parquet(s"$dimDir/v${vs.max}/src")
    val pairs = spark.read.parquet(vs.map(v => s"$dimDir/v$v/pairs"): _*)
    // per-lang rows ∪ the ALL rollup row, all from the same dims
    val hist = hist0.select($"lang".as("g"), $"n_tokens", $"cnt")
      .unionByName(hist0.groupBy($"n_tokens").agg(sum($"cnt").as("cnt"))
        .select(lit("ALL").as("g"), $"n_tokens", $"cnt"))
    val tot = hist.groupBy($"g").agg(
      sum($"cnt").as("n_docs"),
      sum($"cnt" * $"n_tokens").as("n_tokens"),
      min($"n_tokens").as("min_tokens"),
      max($"n_tokens").as("max_tokens"))
    // exact interpolated median from the histogram: 0-based order
    // statistics lo = (n-1)/2 and hi = n/2 (equal when n is odd),
    // p50 = their mean — `percentile(_, 0.5)` semantics exactly
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"n_tokens")
    val med = hist.withColumn("cum", sum($"cnt").over(wCum))
      .join(tot.select($"g", $"n_docs"), "g")
      .groupBy($"g").agg(
        // `div`, not `/`: Spark's / on longs is double division, and a
        // fractional rank threshold would shift the order statistic
        min(when($"cum" >= expr("(n_docs - 1) div 2 + 1"), $"n_tokens"))
          .as("vlo"),
        min(when($"cum" >= expr("n_docs div 2 + 1"), $"n_tokens"))
          .as("vhi"))
      .select($"g", (($"vlo" + $"vhi") / 2.0).as("p50_tokens"))
    val srcCnt = src0.groupBy($"lang".as("g"))
      .agg(countDistinct($"source").as("n_sources"))
      .unionByName(src0.agg(countDistinct($"source").as("n_sources"))
        .select(lit("ALL").as("g"), $"n_sources"))
    val members = pairs.select($"id_a".as("doc_id"), $"lang_a".as("lang"))
      .unionByName(pairs.select($"id_b".as("doc_id"), $"lang_b".as("lang")))
      .distinct()
    val dup = members.groupBy($"lang".as("g"))
      .agg(count(lit(1)).as("n_dup_docs"))
      .unionByName(members.agg(count(lit(1)).as("n_dup_docs"))
        .select(lit("ALL").as("g"), $"n_dup_docs"))
    tot.join(srcCnt, "g")
      .join(dup, Seq("g"), "left")
      .join(med, "g")
      .select($"g".as("lang"), $"n_docs", $"n_tokens", $"n_sources",
        coalesce($"n_dup_docs", lit(0L)).as("n_dup_docs"),
        $"min_tokens", $"max_tokens", $"p50_tokens")
      .orderBy($"lang")
  }

  /** Run the incremental datasheet over a documents stream to
    * completion (AvailableNow); same lifecycle guards as the other
    * versioned dims. */
  def buildDatasheet(docs: DataFrame, dimDir: String,
      ckptDir: String, compactEvery: Int = 8): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    requireSharedLifecycle(dimDir, ckptDir)
    val q = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        datasheetMaintain(dimDir, compactEvery)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One maintained datasheet wave WITH the compaction cadence on its
    * embedded dup engine's (sh, bands) slices — the same per-wave
    * ∝-history listing/footer growth [[compactBandIndex]] closes for
    * the standalone band index, measured at the same ~100 KB/wave on
    * the r19 probe corpus. The hist/src merged dims and the pairs
    * slices are untouched (newest-only reads / append-only).
    * `compactEvery <= 0` disables. */
  private[graft] def datasheetMaintain(dimDir: String, compactEvery: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    datasheetUpdate(dimDir)(batch, batchId)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactBandIndex(batch.sparkSession, dimDir, docsPart = "sh",
        docsCols = Seq("doc_id", "sh", "nsh", "lang"))
  }

  /** x26 streaming sibling — incremental maintenance of the
    * MATERIALIZED IVF-PQ index ([[graft.ops.Similarity
    * .materializeIvfPqIndex]]'s deployment table kept LIVE): the coarse
    * quantizer and PQ codebooks are FROZEN at index-build time (the
    * FAISS train-offline/add-online contract — retraining would shift
    * every stored code, invalidating the whole accumulated index), so
    * each arriving embedding micro-batch costs one MAP — normalize,
    * nearest-cell assign, 16-byte PQ encode, all one fused pass
    * ([[graft.ops.Similarity.ivfPqIndexOf]]) — plus one BATCH-sized
    * layout repartition (one file per cell, the batch materializer's
    * small-files discipline; never a shuffle of the accumulated
    * index), committed as its own cell-partitioned version slice.
    * Append-only like the x18 band
    * index: per-batch cost scales with the batch, never with the
    * accumulated index. A probe reads the UNION of committed slices,
    * each with the same pushed cell IN-list, so file-level pruning
    * survives incrementality (files touched = probed cells × committed
    * slices; at scale a compactor folds old slices back through
    * [[graft.ops.Similarity.materializeIvfPqIndex]]). Same
    * versioned-dir exactly-once shape as the other dims: a replayed
    * committed batch is a no-op, `_SUCCESS` marker last. */
  def ivfPqIndexUpdate(indexDir: String, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]])(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    if (Files.isRegularFile(Paths.get(s"$indexDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(indexDir).filter(_ < batchId)
    requirePredecessorState(indexDir, batchId, prior)
    val all = graft.ops.Similarity.corpusOf(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.Similarity.ivfPqIndexOf(all, cents, books)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/v$batchId/index")
    // the VECTOR STORE slice: the exact-rescore stage needs the full
    // vectors of every indexed id, and a vector that arrived only via
    // the stream exists nowhere else — without this, stream-only
    // candidates would silently vanish at the rescore join. Separate
    // subdir (not extra columns in the code slice) so the ADC scan's
    // 16-bytes-per-row claim stays a file-layout fact, not a
    // column-pruning hope.
    all.write.mode("overwrite").parquet(s"$indexDir/v$batchId/vecs")
    all.unpersist(blocking = false)
    Files.write(Paths.get(s"$indexDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  val embeddingsRawSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Run the incremental index maintainer over an embeddings stream to
    * completion (AvailableNow); same lifecycle guards as the other
    * versioned dims. The model is captured ONCE, before the stream
    * starts — never per batch. */
  def buildIvfPqIndexStream(embs: DataFrame, indexDir: String,
      ckptDir: String, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(indexDir))
    requireSharedLifecycle(indexDir, ckptDir)
    val q = embs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        ivfPqIndexUpdate(indexDir, cents, books)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** x26 top-k over the committed slices — SELF-CONTAINED: queries and
    * the exact-rescore vectors come from the accumulated slice VECTOR
    * STORES (so ids that arrived only via the stream are first-class
    * neighbors — spec plants one), and the frozen model arrives
    * explicitly, the same instance the maintainer encoded with (an
    * index must never be decoded with another corpus's codebooks).
    * Row-identical to in-session x26 when the stream replayed the
    * batch corpus under the batch model — also spec-pinned. */
  def streamedIvfPqTopK(spark: SparkSession, indexDir: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      nQueries: Int = 8, topK: Int = 5): DataFrame = {
    val vs = modelVersions(indexDir).sorted
    require(vs.nonEmpty, s"no committed index slices under $indexDir")
    val all = vs.map(v => spark.read.parquet(s"$indexDir/v$v/vecs"))
      .reduce(_ unionByName _)
    graft.ops.Similarity.ivfPqTopKMaterializedVia(all,
      vs.map(v => s"$indexDir/v$v/index"), cents, books, nQueries, topK,
      graft.ops.Similarity.IvfProbes)
  }

  // --------------------------- x79 streamed semantic decontamination

  /** The FROZEN benchmark cell store the streamed semantic
    * decontamination flag probes: the base corpus's benchmark slice
    * (vec_id % 17 == 0, the x19/x78/x79 convention) cell-assigned
    * under the frozen centroids, written ONCE partitioned by cell —
    * the model side of the stream, like the IVF-PQ codebooks: captured
    * before the stream starts, never per batch. At 100 TB the bench
    * side is n/17 (never broadcastable); partitioning by cell makes
    * each micro-batch's probe a cell-pruned equi join against it. */
  def buildBenchCellStore(baseEmbs: DataFrame, benchDir: String,
      cents: Array[Array[Double]]): Unit = {
    val bench = graft.ops.Similarity.corpusOf(baseEmbs)
      .filter(col("vec_id") % 17 === 0)
    graft.ops.Similarity
      .multiCellAssign(bench, cents,
        graft.ops.Similarity.SemDedupAssignProbes)
      .write.mode("overwrite").partitionBy("cell").parquet(benchDir)
  }

  /** Per-batch x79 flag: the micro-batch's training vectors are
    * cell-assigned under the SAME frozen centroids as the bench store,
    * unioned with it, and run through the SAME within-cell bipartite
    * flag code as batch x79 ([[graft.ops.Similarity.celledDecontFlagsOf]]
    * — one definition, so streamed and batch flags cannot diverge by
    * construction), then the batch's clean training rows land as an
    * append-only versioned slice. Cost ∝ batch (the bench store is
    * read-only state); replay-safe via the _SUCCESS marker like every
    * other versioned dim. */
  def semDecontUpdate(benchDir: String, outDir: String,
      cents: Array[Array[Double]])(batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    if (Files.isRegularFile(Paths.get(s"$outDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(outDir).filter(_ < batchId)
    requirePredecessorState(outDir, batchId, prior)
    val spark = batch.sparkSession
    val sim = graft.ops.Similarity
    val bench = spark.read.parquet(benchDir)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val train = sim.corpusOf(batch.select("vec_id", "embedding"))
      .filter(col("vec_id") % 17 =!= 0)
    val assigned = sim.multiCellAssign(train, cents, sim.SemDedupAssignProbes)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val flagged = sim.celledDecontFlagsOf(assigned.unionByName(bench),
      sim.SemDedupTauHigh)
    batch.filter(col("vec_id") % 17 =!= 0)
      .join(flagged.select(col("train_id").as("vec_id")),
        Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"))
      .write.mode("overwrite").parquet(s"$outDir/v$batchId/clean")
    Files.write(Paths.get(s"$outDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** Run the streamed decontamination to completion (AvailableNow);
    * model (centroids + bench store) captured before the stream. */
  def buildSemDecontStream(embs: DataFrame, benchDir: String,
      outDir: String, ckptDir: String,
      cents: Array[Array[Double]]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    requireSharedLifecycle(outDir, ckptDir)
    val q = embs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        semDecontUpdate(benchDir, outDir, cents)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The accumulated clean training slice across committed versions —
    * the streamed x79 output (streamed ≡ batch when the stream
    * replayed the batch corpus under the batch model; spec-pinned). */
  def streamedSemDecontClean(spark: SparkSession, outDir: String): DataFrame = {
    val vs = modelVersions(outDir).sorted
    require(vs.nonEmpty, s"no committed clean slices under $outDir")
    vs.map(v => spark.read.parquet(s"$outDir/v$v/clean"))
      .reduce(_ unionByName _)
      .orderBy(col("vec_id"))
  }

  // ------------------------- x82 streamed snapshot reconciliation

  /** The FROZEN old-snapshot hash store the streamed diff probes:
    * batch x82's OLD side ([[graft.ops.Pipeline.oldSnapshotHashes]] —
    * one definition, the snapshot semantics cannot diverge), written
    * once before the new crawl starts streaming. (doc_id, 64-byte
    * hash) only — at 100 TB this is the frame you bucket by doc_id so
    * every per-batch probe joins co-partitioned. */
  def buildOldSnapshotStore(docs: DataFrame, oldDir: String): Unit =
    graft.ops.Pipeline.oldSnapshotHashes(docs)
      .write.mode("overwrite").parquet(oldDir)

  /** Per-batch reconciliation: the micro-batch's slice of the NEW
    * crawl (same [[graft.ops.Pipeline.newSnapshotHashes]] derivation
    * as batch x82) LEFT-joins the frozen old store — `added` (no old
    * row) and `changed` (hash differs) rows land under
    * v&lt;batch&gt;/delta, and the batch's seen ids under
    * v&lt;batch&gt;/ids (the skinny frame the stream-close `removed`
    * pass anti-joins: absence is only knowable once the crawl
    * completes, so `removed` is deliberately NOT a per-batch output).
    * Cost ∝ batch; replay-safe via the _SUCCESS marker like every
    * versioned dim. */
  def snapshotDiffUpdate(oldDir: String, outDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    if (Files.isRegularFile(Paths.get(s"$outDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(outDir).filter(_ < batchId)
    requirePredecessorState(outDir, batchId, prior)
    val spark = batch.sparkSession
    val neu = graft.ops.Pipeline.newSnapshotHashes(batch)
      .select(col("doc_id"), col("h").as("n_h"))
    val old = spark.read.parquet(oldDir)
      .select(col("doc_id"), col("h").as("o_h"))
    neu.join(old, Seq("doc_id"), "left")
      .withColumn("status",
        when(col("o_h").isNull, lit("added")).otherwise(lit("changed")))
      .filter(col("o_h").isNull || !(col("o_h") <=> col("n_h")))
      .select(col("doc_id"), col("status"))
      .write.mode("overwrite").parquet(s"$outDir/v$batchId/delta")
    neu.select(col("doc_id"))
      .write.mode("overwrite").parquet(s"$outDir/v$batchId/ids")
    Files.write(Paths.get(s"$outDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** Run the streamed reconciliation to completion (AvailableNow);
    * the old store is the frozen model, captured before the stream. */
  def buildSnapshotDiffStream(docs: DataFrame, oldDir: String,
      outDir: String, ckptDir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    requireSharedLifecycle(outDir, ckptDir)
    val q = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        snapshotDiffUpdate(oldDir, outDir)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The complete reconciliation across committed versions: the
    * accumulated added/changed deltas plus the stream-close `removed`
    * pass (old store anti-join the union of seen ids). Streamed ≡
    * batch x82 when the stream replayed the full corpus —
    * spec-pinned. */
  def streamedSnapshotDiff(spark: SparkSession, oldDir: String,
      outDir: String): DataFrame = {
    val vs = modelVersions(outDir).sorted
    require(vs.nonEmpty, s"no committed delta slices under $outDir")
    val deltas = vs.map(v => spark.read.parquet(s"$outDir/v$v/delta"))
      .reduce(_ unionByName _)
    val seen = vs.map(v => spark.read.parquet(s"$outDir/v$v/ids"))
      .reduce(_ unionByName _)
    val removed = spark.read.parquet(oldDir)
      .join(seen, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("removed").as("status"))
    deltas.unionByName(removed).orderBy(col("doc_id"))
  }

  /** Run the incremental substring dedup over a documents stream to
    * completion (AvailableNow): maintains the span index under
    * `dimDir`, emits per-batch rewritten docs under `outDir`. Same
    * shared-lifecycle rule as [[buildBandIndex]]: a fresh checkpoint
    * over an outDir holding a dead lineage's slices is refused. */
  def buildSpanIndex(docs: DataFrame, dimDir: String, outDir: String,
      ckptDir: String, compactEvery: Int = 8): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    requireSharedLifecycle(dimDir, ckptDir)
    requireSliceLifecycle(outDir, ckptDir, "rewrite")
    val q = docs.writeStream
      .foreachBatch(spanIndexMaintain(dimDir, outDir, compactEvery) _)
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Run the incremental near-dup dedup over a documents stream to
    * completion (AvailableNow): maintains the band index under
    * `dimDir`, emits per-batch verified pair slices under `pairsDir`. */
  def buildBandIndex(docs: DataFrame, dimDir: String, pairsDir: String,
      ckptDir: String, compactEvery: Int = 8): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pairsDir))
    requireSharedLifecycle(dimDir, ckptDir)
    requireSliceLifecycle(pairsDir, ckptDir, "pair")
    val q = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        bandIndexMaintain(dimDir, pairsDir, compactEvery)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One maintained wave of the band index WITH the compaction
    * cadence — [[keepBestDeltaMaintain]]'s shape on the index
    * direction. Defaults ON at 8 wherever a stream drives it (the
    * r18 VERDICT #4 stance: the bounded-probe property must hold
    * without operator opt-in). `compactEvery <= 0` disables. */
  private[graft] def bandIndexMaintain(dimDir: String, pairsDir: String,
      compactEvery: Int)(batch: DataFrame, batchId: Long): Unit = {
    bandIndexUpdate(dimDir, pairsDir)(batch, batchId)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactBandIndex(batch.sparkSession, dimDir)
  }

  /** All near-dup pairs the stream has emitted so far (union of the
    * per-batch slices), or an empty frame before any batch. Only
    * slices whose batch COMMITTED are read: [[bandIndexUpdate]] writes
    * the pair slice before the version marker, so a crash in that
    * window leaves an uncommitted `b<k>` on disk — recovery replay
    * overwrites it byte-identically, but a reader between crash and
    * replay must not see it, so each slice is gated on the
    * `v<k>/_SUCCESS` marker in `dimDir` (the single commit point for
    * the batch). A slice at or below the newest [[compactBandIndex]]
    * base also counts as committed with its version dir gone (r19
    * janitor parity): the compaction reads only marker-committed
    * versions and [[requirePredecessorState]] enforces per-wave
    * contiguity, so every k ≤ base was committed before the base
    * could be. */
  def streamedNearDupPairs(spark: SparkSession, dimDir: String,
      pairsDir: String): DataFrame = {
    val base = bandCumulativeBase(dimDir, modelVersions(dimDir))
    committedSlices(spark, pairsDir,
        k => java.nio.file.Paths.get(
          if (base.exists(_ >= k.toLong)) s"$dimDir/v${base.get}/_SUCCESS"
          else s"$dimDir/v$k/_SUCCESS")) {
      spark.emptyDataFrame
        .select(lit(0L).as("inc_id"), lit(0L).as("hist_id"),
          lit(0.0).as("jaccard")).limit(0)
    }
  }

  /** x59 streaming sibling — incremental KEEP-BEST survivors: maintain
    * the per-cluster best-quality survivor dim continuously as
    * documents arrive, composed over the streamed band index
    * ([[bandIndexUpdate]]). Each micro-batch:
    *
    *  1. updates the band index and emits cross-batch verified pairs
    *     (delegated — idempotent, shared committed state),
    *  2. verifies its own INTRA-batch pairs from the just-committed
    *     band slice (the one pair family the cross-probe never sees:
    *     a pair is either within a batch or across batches, so the
    *     accumulated union is exactly the full-corpus LSH pair set),
    *  3. writes the batch's (doc_id, quality_score, lang) attribute
    *     slice — append-only, cost ∝ batch, the doc-level quality
    *     table a curation pipeline materializes anyway (x30),
    *  4. rewrites the MERGED survivor dim: CC labels over the
    *     accumulated pair graph (cost ∝ pair graph, which holds only
    *     verified near-dups — never corpus-sized), quality joined for
    *     cluster members only, per-cluster rank window. Labels +
    *     survivors are the versioned merged dim (the
    *     [[unigramModelUpdate]] pattern); docs + intra-pair slices are
    *     append-only (the band-index pattern).
    *
    * Same exactly-once discipline: recompute from committed inputs is
    * deterministic, the `_SUCCESS` marker is written last, and a replay
    * of a committed batch is a no-op. The singleton majority never
    * enters state — readers anti-join it at read time, like batch x59.
    * StreamingSpec replays a 2-wave split and proves the streamed
    * survivor set ≡ batch x59 on the full corpus. */
  def keepBestUpdate(dimDir: String, pairsDir: String, survDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val spark = batch.sparkSession
    // 1. band index + cross pairs (skips itself if already committed)
    bandIndexUpdate(dimDir, pairsDir)(batch, batchId)
    if (Files.isRegularFile(Paths.get(s"$survDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(survDir).filter(_ < batchId)
    requirePredecessorState(survDir, batchId, prior)
    // 2. intra-batch pairs from the committed band slice (same verify
    //    as the cross probe: equi join on (band, bh), exact jaccard)
    val docsSh = spark.read.parquet(s"$dimDir/v$batchId/docs")
    val bands = spark.read.parquet(s"$dimDir/v$batchId/bands")
    val intra = graft.ops.Dedup.verifyJaccard(
        graft.ops.Dedup.bandSelfCandidates(bands), docsSh, docsSh)
      .select(col("id_a"), col("id_b"))
    intra.write.mode("overwrite").parquet(s"$survDir/v$batchId/intra")
    // 3. the batch's doc-attribute slice (append-only)
    batch
      .select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("quality_score"),
        col("lang"))
      .write.mode("overwrite").parquet(s"$survDir/v$batchId/docs")
    // 4. merged survivor dim over the accumulated pair graph
    val versions = prior :+ batchId
    val cross = streamedNearDupPairs(spark, dimDir, pairsDir)
      .select(col("inc_id").as("id_a"), col("hist_id").as("id_b"))
    val intraAll = spark.read.parquet(
      versions.map(v => s"$survDir/v$v/intra"): _*)
    val pairs = cross.union(intraAll)
    val (labels, survivors) =
      if (pairs.isEmpty) {
        val l = spark.emptyDataFrame
          .select(lit(0L).as("id"), lit(0L).as("label")).limit(0)
        val s = spark.emptyDataFrame
          .select(lit(0L).as("doc_id"), lit(0L).as("cluster_id"),
            lit(0.0).as("quality_score"), lit("").as("lang")).limit(0)
        (l, s)
      } else {
        val (lbl, _) = graft.ops.Dedup.ccStars(pairs)
        val quality = spark.read.parquet(
          versions.map(v => s"$survDir/v$v/docs"): _*)
        val members = quality.join(
          lbl.select(col("id").as("doc_id"), col("label").as("cluster_id")),
          "doc_id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))
          .orderBy(col("quality_score").desc, col("doc_id").asc)
        val best = members
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("cluster_id"),
            col("quality_score"), col("lang"))
        (lbl, best)
      }
    labels.write.mode("overwrite").parquet(s"$survDir/v$batchId/labels")
    survivors.write.mode("overwrite").parquet(s"$survDir/v$batchId/survivors")
    labels.unpersist(blocking = false) // ccStars persists its result
    Files.write(Paths.get(s"$survDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** Run the incremental keep-best dedup over a documents stream to
    * completion (AvailableNow), maintaining band index, pair slices and
    * the survivor dim. */
  def buildKeepBest(docs: DataFrame, dimDir: String, pairsDir: String,
      survDir: String, ckptDir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pairsDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(survDir))
    requireSharedLifecycle(dimDir, ckptDir)
    requireSharedLifecycle(survDir, ckptDir)
    // the pairs dir is the same bandIndexUpdate state buildBandIndex
    // drives — both entry points must enforce the same slice guard
    requireSliceLifecycle(pairsDir, ckptDir, "pair")
    val q = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        keepBestUpdate(dimDir, pairsDir, survDir)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Survivor-set reader for the REBUILD-form maintainer: the latest
    * committed merged survivors plus the singleton majority (every
    * streamed doc not in any cluster), labeled as its own cluster —
    * the batch-x59 output shape. The delta form has its own reader
    * over the assembled delta lineage
    * ([[streamedKeepBestDeltaSurvivors]]); both are pinned ≡ batch
    * x59 by StreamingSpec, so the shapes cannot drift. `labelsIdCol`
    * names the id column of the labels slice (the rebuild form writes
    * ccStars' (id, label)). */
  private def keepBestSurvivorsFrom(spark: SparkSession, survDir: String,
      labelsIdCol: String): DataFrame = {
    val versions = modelVersions(survDir).sorted
    require(versions.nonEmpty, s"no committed survivor version in $survDir")
    val latest = versions.max
    val best = spark.read.parquet(s"$survDir/v$latest/survivors")
    val labeled = spark.read.parquet(s"$survDir/v$latest/labels")
      .select(col(labelsIdCol).as("doc_id"))
    val docs = spark.read.parquet(
      versions.map(v => s"$survDir/v$v/docs"): _*)
    val singletons = docs
      .join(labeled, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"),
        col("quality_score"), col("lang"))
    best.unionByName(singletons)
  }

  /** The full keep-best survivor set as of the latest committed
    * version — the rebuild maintainer's reader. */
  def streamedKeepBestSurvivors(spark: SparkSession,
      survDir: String): DataFrame =
    keepBestSurvivorsFrom(spark, survDir, labelsIdCol = "id")

  /** x59 delta sibling — incremental keep-best with DELTA-star label
    * maintenance: where [[keepBestUpdate]] re-runs connected components
    * over the FULL accumulated pair graph every micro-batch (per-wave
    * cost ∝ P(w) — the one maintainer the r14 StreamProbe measured
    * growing with history, by design), this maintainer merges each
    * wave's new pairs into the PERSISTED label dim so only components
    * TOUCHED by the wave recompute. Per batch:
    *
    *  1.–3. identical to [[keepBestUpdate]]: band-index update + cross
    *     pairs (delegated, idempotent), intra-batch pairs from the
    *     committed band slice, the batch's doc-attribute slice;
    *  4. delta-star merge: wave pairs P_w = cross(batch) ∪
    *     intra(batch); touched clusters = prior labels of P_w's
    *     endpoints; prior members of those clusters re-enter as
    *     (doc_id, cluster_id) STAR EDGES — sound because ccStars
    *     labels with the component-minimum id, so a label is itself a
    *     member node and a star edge is an ordinary graph edge
    *     carrying exactly the old component's connectivity. CC runs
    *     over P_w ∪ star edges: cost ∝ |wave pairs| + |touched
    *     members|, INDEPENDENT of the accumulated pair count.
    *     Label equality with the full rebuild is structural:
    *     components only ever change by MERGING, every merge contains
    *     a wave pair (so the merged component is fully present in the
    *     delta graph), and untouched components keep their min-id
    *     label verbatim;
    *  5. the label dim carries (doc_id, cluster_id, quality_score,
    *     lang) so survivor re-ranking never re-reads history; quality
    *     for FIRST-TIME historical nodes (a cross pair can touch an
    *     old doc that never paired before) is probed from the
    *     assembled attrs dim — per-wave `attrs_delta` slices (this
    *     batch's first-time doc_ids only) over the newest cumulative
    *     base;
    *  6. survivors: untouched clusters' rows carry over verbatim;
    *     touched clusters re-rank under the same quality-desc /
    *     doc-id-asc window — so the assembled dim stays ≡ the rebuild
    *     form ≡ batch x59 (StreamingSpec proves both).
    *
    * r17 (the write-side sibling of the r16 attrs read fix): the wave
    * no longer REWRITES the accumulated attrs/labels/survivors dims —
    * bytes written per wave were ∝ accumulated docs, the last
    * history-proportional term here. It writes DELTA slices instead:
    * `attrs_delta` (this batch's first-time attribute rows), `drops`
    * (the touched cluster ids, retiring every older row of those
    * clusters), `labels_delta` / `survivors_delta` (the re-labeled
    * members / re-ranked best of the touched clusters). Readers
    * assemble the current dims from the newest CUMULATIVE base (a
    * [[compactKeepBest]] artifact, or a pre-r17 whole-rewrite
    * version) plus the delta slices after it, under the gram index's
    * latest-wins algebra ([[assembledKeepBestDims]]); the compaction
    * cadence bounds the read listing at O(K) slices and makes
    * pre-compaction version dirs janitor-deletable. Per-wave bytes
    * written are now ∝ batch + touched clusters, never ∝ corpus
    * (StreamProbe's wave_bytes records it).
    *
    * r18 (the read-side sibling): the wave no longer materializes the
    * full assembled attrs dim per wave — the first-time anti-join
    * probes the doc_id-only membership ([[assembledKeepBestMembers]]:
    * the compaction's sorted `members` artifact + delta doc_id
    * columns), the corpus-sized `localCheckpoint` is gone (every
    * consumer is a column-pruned scan over committed parquet), and
    * the touched-size `newMembers` result is checkpointed instead so
    * the label/survivor writes stop double-scanning the corpus-sized
    * inputs. StreamProbe's wave_read_bytes records the per-wave read
    * profile; the residual ∝-corpus terms (membership doc_id column,
    * the touched-cluster label probe) are named in PLANS.md with
    * their warehouse forms (bucketed membership / cluster-keyed
    * label store).
    *
    * Same exactly-once discipline as every versioned dim: recompute
    * from committed inputs + the PRIOR versions' committed slices is
    * deterministic, `_SUCCESS` is written last, replay of a committed
    * batch is a no-op. */
  def keepBestDeltaUpdate(dimDir: String, pairsDir: String,
      survDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val spark = batch.sparkSession
    bandIndexUpdate(dimDir, pairsDir)(batch, batchId)
    if (Files.isRegularFile(Paths.get(s"$survDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(survDir).filter(_ < batchId)
    requirePredecessorState(survDir, batchId, prior)
    val docsSh = spark.read.parquet(s"$dimDir/v$batchId/docs")
    val bands = spark.read.parquet(s"$dimDir/v$batchId/bands")
    graft.ops.Dedup.verifyJaccard(
        graft.ops.Dedup.bandSelfCandidates(bands), docsSh, docsSh)
      .select(col("id_a"), col("id_b"))
      .write.mode("overwrite").parquet(s"$survDir/v$batchId/intra")
    batch
      .select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("quality_score"),
        col("lang"))
      .write.mode("overwrite").parquet(s"$survDir/v$batchId/docs")
    // a pre-r16 base (cumulative labels, NO attrs artifact) is
    // completed into the attrs-bearing form exactly once at upgrade:
    // the deterministic first-wins docs-slice backfill is PERSISTED
    // at the base version, so neither this wave nor any later read
    // pays the all-prior-slices scan again
    upgradePreAttrsBase(spark, survDir, prior)
    // attrs DELTA: this batch's first-time doc_ids only (first-wins
    // against the assembled prior attrs — a recurring doc_id keeps
    // its first wave's row). The anti-join probes the doc_id-only
    // MEMBERSHIP — since r19 (VERDICT #2) pruned to the batch's
    // kb_bucket partitions of the compaction's bucketed members store
    // (read ∝ touched buckets × target bucket rows, i.e. ∝ batch,
    // never ∝ corpus) plus the O(K) post-compaction delta doc_id
    // columns; the full prior attrs dim is no longer read at all.
    val batchAttrs = spark.read.parquet(s"$survDir/v$batchId/docs")
    val priorMembers = keepBestMembersProbe(spark, survDir, prior, batchAttrs)
    (if (prior.isEmpty) batchAttrs
     else batchAttrs.join(priorMembers, Seq("doc_id"), "left_anti"))
      .write.mode("overwrite").parquet(s"$survDir/v$batchId/attrs_delta")
    // THIS batch's pair delta only — never the accumulated union
    val wavePairs = spark.read.parquet(s"$pairsDir/b$batchId")
      .select(col("inc_id").as("id_a"), col("hist_id").as("id_b"))
      .union(spark.read.parquet(s"$survDir/v$batchId/intra"))
      .pipe(graft.Caches.pin)
    def emptyMerged = spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit(0L).as("cluster_id"),
        lit(0.0).as("quality_score"), lit("").as("lang")).limit(0)
    val cols = Seq("doc_id", "cluster_id", "quality_score", "lang")
    val (drops, labelsDelta, survDelta, ccHandle) =
      if (wavePairs.isEmpty)
        (emptyMerged.select(col("cluster_id")), emptyMerged, emptyMerged,
          Option.empty[DataFrame])
      else {
        val touchedIds = wavePairs.select(col("id_a").as("doc_id"))
          .union(wavePairs.select(col("id_b").as("doc_id"))).distinct()
          .pipe(graft.Caches.pin) // touched-size; probed for buckets + joined
        // touched-cluster discovery probes the labels store BY DOC —
        // since r19 (VERDICT #3) pruned to the probe's kb_bucket
        // partitions of the compaction's doc-keyed labels_by_doc copy
        // (plus O(K) delta slices) instead of scanning the corpus
        // labels dim per wave
        val touchedClusters =
          labelsProbe(spark, survDir, prior, "labels_by_doc", "doc_id",
              touchedIds)
            .join(touchedIds, Seq("doc_id"), "left_semi")
            .select(col("cluster_id")).distinct().pipe(graft.Caches.pin)
        // member expansion probes BY CLUSTER — the cluster-keyed copy,
        // pruned to the touched clusters' buckets
        val members =
          labelsProbe(spark, survDir, prior, "labels", "cluster_id",
              touchedClusters)
            .join(touchedClusters, Seq("cluster_id"), "left_semi")
        val starEdges = members
          .select(col("doc_id").as("id_a"), col("cluster_id").as("id_b"))
        val (lbl, _) = graft.ops.Dedup.ccStars(wavePairs.union(starEdges))
        val lblNodes = lbl
          .select(col("id").as("doc_id"), col("label").as("cluster_id"))
        // prior-label attributes: every labeled node of the delta graph
        // lies in a TOUCHED cluster — a wave-pair endpoint's cluster is
        // touched by construction (touchedClusters = clusters of all
        // labeled wave-pair endpoints), a star-edge member node is a
        // touched cluster's member, and a cluster id appearing as a
        // node is itself a member's doc_id under min-id labeling — so
        // the touched members ARE the complete attribute source and the
        // corpus-sized priorLabels projection is gone (r19, VERDICT #3;
        // the delta ≡ batch spec would surface any violation as
        // duplicate label rows)
        val known = members
          .select(col("doc_id"), col("quality_score"), col("lang"))
        // attributes for FIRST-TIME nodes (never labeled before): probe
        // the bucketed attrs store at their buckets + this batch's
        // just-written delta
        val firstTimers = lblNodes
          .join(known.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("doc_id")).pipe(graft.Caches.pin)
        val fetched =
          attrsProbe(spark, survDir, prior, firstTimers)
            .unionByName(
              spark.read.parquet(s"$survDir/v$batchId/attrs_delta"))
            .join(firstTimers, Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("quality_score"), col("lang"))
        // checkpoint the TOUCHED-SIZE result (∝ wave pairs + touched
        // members, never ∝ corpus — the opposite class from the
        // retired priorAttrs checkpoint): labels_delta and the
        // survivor re-rank both consume it, and without the pin each
        // would re-scan the corpus-sized priorLabels/priorAttrs inputs
        val newMembers = lblNodes
          .join(known.unionByName(fetched), Seq("doc_id"))
          .select(cols.map(col): _*)
          .pipe(graft.Caches.pin)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster_id"))
          .orderBy(col("quality_score").desc, col("doc_id").asc)
        val newBest = newMembers
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(cols.map(col): _*)
        (touchedClusters, newMembers, newBest, Some(lbl))
      }
    // delta slices only: drops retire every older row of the touched
    // clusters; the deltas carry their re-labeled members / re-ranked
    // best. Bytes ∝ touched clusters, never ∝ accumulated corpus.
    drops.write.mode("overwrite").parquet(s"$survDir/v$batchId/drops")
    labelsDelta.write.mode("overwrite")
      .parquet(s"$survDir/v$batchId/labels_delta")
    survDelta.write.mode("overwrite")
      .parquet(s"$survDir/v$batchId/survivors_delta")
    ccHandle.foreach(_.unpersist(blocking = false)) // ccStars persists it
    Files.write(Paths.get(s"$survDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** Deterministic first-wins attrs over the docs slices of the given
    * versions: tag each slice with its version and keep every row of
    * the FIRST version that introduced a doc_id — exactly the
    * incremental attrs dim's semantics (r17, ADVICE: bare
    * dropDuplicates kept a partition-order-dependent row, so a
    * backfilled resume could diverge from an always-incremental
    * lineage when a doc_id recurred with changed attributes). */
  private def backfillAttrs(spark: SparkSession, survDir: String,
      vs: Seq[Long]): DataFrame = {
    val tagged = vs.sorted.map(v =>
        spark.read.parquet(s"$survDir/v$v/docs")
          .withColumn("_bver", lit(v)))
      .reduce(_ unionByName _)
    tagged
      .withColumn("_minv", min(col("_bver")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))))
      .where(col("_bver") === col("_minv"))
      .drop("_bver", "_minv")
  }

  /** The attrs backfill and its readers gate completeness on the
    * parquet committer's IN-DIR `_SUCCESS` marker. A session with
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` (or a
    * committer that writes no marker) would treat EVERY committed
    * attrs dir as torn — a silent O(corpus) re-backfill on every wave
    * and every reader (r18 ADVICE). Assert the requirement up front
    * so a non-default committer degrades loudly instead. */
  private def requireSuccessMarkers(spark: SparkSession): Unit = {
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    require(spark.sparkContext.hadoopConfiguration.getBoolean(key, true),
      s"$key=false: keep-best attrs completeness is gated on the " +
        "committer's in-dir _SUCCESS marker — with markers disabled " +
        "every committed attrs dir reads as torn and the deterministic " +
        "backfill recomputes O(corpus) per wave and per reader; " +
        "re-enable the marker (the default) before driving this lineage")
  }

  /** Complete a pre-r16 cumulative base (labels/survivors written
    * whole, NO attrs artifact) into the attrs-bearing form: persist
    * the [[backfillAttrs]] result AT the base version, exactly once —
    * idempotent (deterministic recompute from committed inputs,
    * skipped when the artifact exists), so the all-prior-slices scan
    * is paid once at upgrade and never again by any reader. */
  private def upgradePreAttrsBase(spark: SparkSession, survDir: String,
      vs: Seq[Long]): Unit = {
    import java.nio.file.{Files, Paths}
    requireSuccessMarkers(spark)
    cumulativeBase(survDir, vs.sorted).foreach { b =>
      // gate on the parquet committer's IN-DIR _SUCCESS marker, not bare
      // directory existence (r18, ADVICE): this backfill writes into an
      // already-committed version, outside the version-level
      // written-last discipline — a crash mid-backfill leaves a partial
      // dir whose bare-existence check would pass forever, silently
      // serving an incomplete first-wins attrs dim. The marker is the
      // committer's own completion receipt; an unmarked dir is
      // recomputed (deterministic) and overwritten whole.
      // an r18 compaction carries its attrs under compact/ (marker-
      // gated) — no backfill owed there, and the docs slices a
      // backfill would scan may already be janitor-deleted
      val compacted =
        Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
          Files.exists(Paths.get(s"$survDir/v$b/compact/attrs"))
      if (!compacted &&
          !Files.isRegularFile(Paths.get(s"$survDir/v$b/attrs/_SUCCESS")))
        backfillAttrs(spark, survDir, vs.sorted.filter(_ <= b))
          .write.mode("overwrite").parquet(s"$survDir/v$b/attrs")
    }
  }

  /** The newest version of a delta keep-best lineage carrying a
    * CUMULATIVE artifact: a [[compactKeepBest]] compaction
    * (`_CUMULATIVE` marker, written last so a crashed compaction is
    * invisible — a version with both `labels` and `labels_delta` but
    * no marker is exactly that) or a pre-r17 whole-rewrite version
    * (cumulative `labels`, no delta slice). */
  private def cumulativeBase(survDir: String,
      vs: Seq[Long]): Option[Long] = {
    import java.nio.file.{Files, Paths}
    vs.filter { v =>
      Files.isRegularFile(Paths.get(s"$survDir/v$v/_CUMULATIVE")) ||
        (Files.exists(Paths.get(s"$survDir/v$v/labels")) &&
          !Files.exists(Paths.get(s"$survDir/v$v/labels_delta")))
    }.sorted.lastOption
  }

  /** Assembled (attrs, labels, survivors) over the committed versions
    * `vs0` of a delta keep-best lineage: rows from the newest
    * [[cumulativeBase]] plus the delta slices committed after it,
    * under [[liveGramSlices]]' latest-wins algebra on the CLUSTER
    * axis — a row from version u survives iff no version later than u
    * dropped its cluster (ties keep the delta: a wave's drop applies
    * to strictly older rows, its own delta re-labels the cluster).
    * Attrs are append-only first-wins deltas, no drops; a pre-r16
    * base without an attrs artifact falls back to the deterministic
    * docs-slice backfill (readers on a lineage no r17 wave has
    * touched yet — the maintainer persists the upgrade at its next
    * wave). The per-cluster drop dim broadcasts at a size bounded by
    * the clusters dropped SINCE the oldest manifest tier: the
    * compaction prunes cumulative entries no kept row can match
    * (r20, ADVICE — see [[compactKeepBest]]'s drops write), and the
    * bucket-dir tier-merge bound advances the oldest tier, so the
    * store cannot grow with every cluster ever dropped. */
  private[graft] def assembledKeepBestDims(spark: SparkSession,
      survDir: String,
      vs0: Seq[Long]): (DataFrame, DataFrame, DataFrame) = {
    import java.nio.file.{Files, Paths}
    requireSuccessMarkers(spark)
    def emptyMerged = spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit(0L).as("cluster_id"),
        lit(0.0).as("quality_score"), lit("").as("lang")).limit(0)
    def emptyAttrs =
      emptyMerged.select(col("doc_id"), col("quality_score"), col("lang"))
    val vs = vs0.sorted
    if (vs.isEmpty) return (emptyAttrs, emptyMerged, emptyMerged)
    val base = cumulativeBase(survDir, vs)
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs)
    val cols = Seq("doc_id", "cluster_id", "quality_score", "lang")
    def read(v: Long, part: String) =
      spark.read.parquet(s"$survDir/v$v/$part")
    // a base version's cumulative artifact lives under the tier roots
    // its `_CUMULATIVE` manifest lists (r19 tiering; a legacy empty
    // marker = the single root v$b/compact — r18 compactions, written
    // beside the reads, never over them) or at the version top level
    // (pre-r17 whole rewrites, no marker). compact/ roots are trusted
    // only under the marker (written last): a torn compaction leaves
    // compact/ without it and readers must keep ignoring it.
    val baseRoots: Seq[(Long, String)] = base.toSeq.flatMap { b =>
      if (Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
          Files.exists(Paths.get(s"$survDir/v$b/compact/attrs")))
        kbTierRoots(survDir, b)
      else Seq.empty
    }
    val baseAttrs: Seq[DataFrame] =
      if (baseRoots.nonEmpty)
        baseRoots.map { case (_, root) =>
          spark.read.parquet(s"$root/attrs") }
      else base.toSeq.map { b =>
        // in-dir _SUCCESS, not bare existence (r18, ADVICE): a torn
        // upgradePreAttrsBase backfill must fall back to the
        // deterministic docs-slice recompute, not get served partial
        if (Files.isRegularFile(Paths.get(s"$survDir/v$b/attrs/_SUCCESS")))
          read(b, "attrs")
        else backfillAttrs(spark, survDir, vs.filter(_ <= b))
      }
    // explicit projection: an r19 bucketed store carries the
    // kb_bucket partition column, which must not leak into the
    // unionByName with the delta slices
    val attrs = (baseAttrs
        .map(_.select(col("doc_id"), col("quality_score"), col("lang"))) ++
      tail.map(v => read(v, "attrs_delta")))
      .reduceOption(_ unionByName _).getOrElse(emptyAttrs)
    val cumDrops = kbCumulativeDrops(spark, survDir, base)
    def assemble(cumPart: String, deltaPart: String): DataFrame = {
      val baseRows: Seq[DataFrame] =
        if (baseRoots.nonEmpty)
          baseRoots.map { case (ver, root) =>
            spark.read.parquet(s"$root/$cumPart").select(cols.map(col): _*)
              .withColumn("_ver", lit(ver)) }
        else base.toSeq.map(b =>
          read(b, cumPart).select(cols.map(col): _*)
            .withColumn("_ver", lit(b)))
      val rows = (baseRows ++
        tail.map(v => read(v, deltaPart).select(cols.map(col): _*)
          .withColumn("_ver", lit(v))))
        .reduceOption(_ unionByName _)
      // drop algebra shared with the r19 bucketed probes — one
      // implementation, so the pruned and full reads cannot drift
      rows.map(applyKbDrops(spark, survDir, tail, _, cumDrops))
        .getOrElse(emptyMerged)
    }
    (attrs, assemble("labels", "labels_delta"),
      assemble("survivors", "survivors_delta"))
  }

  /** doc_id-only membership of the assembled attrs dim — the
    * first-time anti-join's probe side (r18, VERDICT #2). Reads the
    * newest base's `compact/members` artifact (doc_id-only, sorted —
    * written by [[compactKeepBest]] so row-group min/max stats support
    * runtime-filter pruning at warehouse scale) falling back to the
    * doc_id COLUMN of the base attrs artifact (parquet-pruned), plus
    * the tail `attrs_delta` slices' doc_id columns — never the full
    * three-column dim and never through a localCheckpoint. The
    * residual per-wave read is the corpus's doc_id column: the
    * exact-membership floor of a scan model (PLANS.md r18 names it;
    * the bucketed/indexed store is the warehouse form). */
  private[graft] def assembledKeepBestMembers(spark: SparkSession,
      survDir: String, vs0: Seq[Long]): DataFrame = {
    import java.nio.file.{Files, Paths}
    requireSuccessMarkers(spark)
    def emptyMembers = spark.emptyDataFrame
      .select(lit(0L).as("doc_id")).limit(0)
    val vs = vs0.sorted
    if (vs.isEmpty) return emptyMembers
    val base = cumulativeBase(survDir, vs)
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs)
    val baseMembers: Seq[DataFrame] = base.toSeq.flatMap { b =>
      if (Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
          Files.exists(Paths.get(s"$survDir/v$b/compact/members")))
        kbTierRoots(survDir, b).map { case (_, root) =>
          spark.read.parquet(s"$root/members").select(col("doc_id")) }
      else if (Files.isRegularFile(Paths.get(s"$survDir/v$b/attrs/_SUCCESS")))
        Seq(spark.read.parquet(s"$survDir/v$b/attrs").select(col("doc_id")))
      else Seq(backfillAttrs(spark, survDir, vs.filter(_ <= b))
        .select(col("doc_id")))
    }
    (baseMembers ++
      tail.map(v => spark.read.parquet(s"$survDir/v$v/attrs_delta")
        .select(col("doc_id"))))
      .reduceOption(_ unionByName _).getOrElse(emptyMembers)
  }

  /** The distinct kb_bucket ids (key >> shift) present in `probe`,
    * collected to the driver to drive partition-directory pruning —
    * bounded by the probe's distinct keys (touched-size driver state,
    * the same class as the gram reader's version dims; in the common
    * range-clustered-id case it is far smaller: the probe's id spread
    * over the bucket width). */
  private def touchedKbBuckets(probe: DataFrame, idCol: String,
      shift: Int): Seq[Long] =
    probe.select(shiftright(col(idCol), shift).cast("long").as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq

  /** Prune a bucketed compaction artifact to the given buckets. The
    * filter literals are cast to the INFERRED partition-column dtype
    * up front — a mistyped literal would wrap the partition attribute
    * in a cast and silently defeat directory pruning (the probe would
    * still be correct, and ∝ corpus again). A frame without the
    * kb_bucket column (an empty artifact written unbucketed — see
    * [[compactKeepBest]]) passes through whole. */
  private def bucketPruned(df: DataFrame, buckets: Seq[Long]): DataFrame = {
    if (!df.columns.contains("kb_bucket")) df
    else if (buckets.isEmpty) df.where(lit(false))
    else {
      val dt = df.schema("kb_bucket").dataType
      df.where(col("kb_bucket").isin(buckets.map(b => lit(b).cast(dt)): _*))
    }
  }

  /** Per-root bucket-pruned reads of a compaction artifact across a
    * base's tier roots (r19 tiering): roots are grouped by their
    * `BUCKETS` shift so the probe's touched-bucket set is collected
    * once per DISTINCT width — tiers written at different corpus
    * sizes legitimately carry different widths; a root without a
    * readable shift is read unpruned (correct, just not pruned).
    * Returns (build version, pruned frame) pairs. */
  private def kbRootsPruned(spark: SparkSession, survDir: String, b: Long,
      part: String, probe: DataFrame,
      probeKey: String): Seq[(Long, DataFrame)] =
    kbTierRoots(survDir, b)
      .groupBy { case (_, root) => kbShiftAtRoot(root) }.toSeq
      .flatMap {
        case (Some(shift), rs) =>
          val buckets = touchedKbBuckets(probe, probeKey, shift)
          rs.map { case (ver, root) =>
            ver -> bucketPruned(
              spark.read.parquet(s"$root/$part"), buckets) }
        case (None, rs) =>
          rs.map { case (ver, root) =>
            ver -> spark.read.parquet(s"$root/$part") }
      }

  /** [[assembledKeepBestMembers]] pruned to the buckets the `probe`
    * frame's doc_ids could live in (r19, VERDICT #2): the base
    * compaction's bucketed members stores are read at the probe's
    * kb_bucket partitions only — per-wave read ∝ touched buckets ×
    * target bucket rows, i.e. ∝ batch — plus the O(K) tail delta
    * doc_id columns. Sound as the first-time anti-join's right side
    * because a member whose bucket is outside the probe's bucket set
    * can never equal a probe doc_id. Falls back to the full
    * membership when the base carries no bucketed store. */
  private[graft] def keepBestMembersProbe(spark: SparkSession,
      survDir: String, vs0: Seq[Long], probe: DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths}
    val vs = vs0.sorted
    val bucketedBase = cumulativeBase(survDir, vs).filter { b =>
      Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
        Files.exists(Paths.get(s"$survDir/v$b/compact/members"))
    }
    bucketedBase match {
      case None => assembledKeepBestMembers(spark, survDir, vs)
      case Some(b) =>
        (kbRootsPruned(spark, survDir, b, "members", probe, "doc_id")
          .map(_._2.select(col("doc_id"))) ++
          vs.filter(_ > b).map(v =>
            spark.read.parquet(s"$survDir/v$v/attrs_delta")
              .select(col("doc_id"))))
          .reduce(_ unionByName _)
    }
  }

  /** Label rows possibly matching the `probe` frame's `keyCol` values
    * (r19, VERDICT #3) — the bucketed-probe sibling of
    * [[assembledKeepBestDims]]' label assembly: the newest base's
    * `compact/<basePart>` store (`labels` keyed by cluster_id, or the
    * doc-keyed `labels_by_doc` copy) pruned to the probe's kb_bucket
    * partitions, plus ALL tail `labels_delta` slices (each ∝ its
    * wave), under the SAME drop algebra. Returns a SUPERSET of the
    * probe's rows (whole buckets) so callers semi-join exactly as
    * before — sound because a row whose bucketed key is outside the
    * probe's bucket set can never equal a probe key. Falls back to
    * the full assembled labels when the base carries no bucketed
    * store. */
  private def labelsProbe(spark: SparkSession, survDir: String,
      vs0: Seq[Long], basePart: String, keyCol: String,
      probe: DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths}
    val vs = vs0.sorted
    val bucketedBase = cumulativeBase(survDir, vs).filter { b =>
      Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
        Files.exists(Paths.get(s"$survDir/v$b/compact/$basePart"))
    }
    bucketedBase match {
      case None => assembledKeepBestDims(spark, survDir, vs)._2
      case Some(b) =>
        val cols = Seq("doc_id", "cluster_id", "quality_score", "lang")
        val tail = vs.filter(_ > b)
        val rows = (kbRootsPruned(spark, survDir, b, basePart, probe, keyCol)
            .map { case (ver, df) =>
              df.select(cols.map(col): _*).withColumn("_ver", lit(ver)) } ++
          tail.map(v =>
            spark.read.parquet(s"$survDir/v$v/labels_delta")
              .select(cols.map(col): _*).withColumn("_ver", lit(v))))
          .reduce(_ unionByName _)
        applyKbDrops(spark, survDir, tail, rows,
          kbCumulativeDrops(spark, survDir, Some(b)))
    }
  }

  /** First-wins attrs rows possibly matching the `probe` frame's
    * doc_ids: the base compaction's bucketed attrs store pruned to
    * the probe's buckets + the tail `attrs_delta` slices (append-only,
    * no drop algebra — delta doc_ids are first-time by construction).
    * Superset semantics and fallback as in [[labelsProbe]]. */
  private def attrsProbe(spark: SparkSession, survDir: String,
      vs0: Seq[Long], probe: DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths}
    val vs = vs0.sorted
    val bucketedBase = cumulativeBase(survDir, vs).filter { b =>
      Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
        Files.exists(Paths.get(s"$survDir/v$b/compact/attrs"))
    }
    bucketedBase match {
      case None => assembledKeepBestDims(spark, survDir, vs)._1
      case Some(b) =>
        (kbRootsPruned(spark, survDir, b, "attrs", probe, "doc_id")
          .map(_._2
            .select(col("doc_id"), col("quality_score"), col("lang"))) ++
          vs.filter(_ > b).map(v =>
            spark.read.parquet(s"$survDir/v$v/attrs_delta")
              .select(col("doc_id"), col("quality_score"), col("lang"))))
          .reduce(_ unionByName _)
    }
  }

  /** The shared latest-wins drop algebra over versioned label rows
    * (`_ver`-tagged): a row from version u survives iff no version
    * later than u dropped its cluster — factored out of
    * [[assembledKeepBestDims]] so the bucketed probes cannot drift
    * from the full assembly.
    *
    * `cumDrops` (r19 tiering) is the newest compaction's cumulative
    * per-cluster max-drop store: with KEPT older tiers on disk, a drop
    * recorded between two compactions must keep retiring the older
    * tier's rows even after the recording wave's own `drops` slice is
    * janitor-deleted — the cumulative store carries exactly that
    * history. Sound against tier rows tagged with their BUILD version:
    * a tier built at t contains only rows that survived every drop
    * ≤ t (applied at merge time), so `maxDrop <= t` never wrongly
    * saves a row and `maxDrop > t` is exactly the set that must kill
    * it. */
  private def applyKbDrops(spark: SparkSession, survDir: String,
      dropVersions: Seq[Long], rows: DataFrame,
      cumDrops: Option[DataFrame] = None): DataFrame = {
    val dropDim = (cumDrops
        .map(_.select(col("cluster_id"), col("_maxDrop").as("_dver"))).toSeq ++
      dropVersions.map(v =>
        spark.read.parquet(s"$survDir/v$v/drops").select(col("cluster_id"))
          .withColumn("_dver", lit(v))))
      .reduceOption(_ unionByName _)
      .map(_.groupBy(col("cluster_id")).agg(max(col("_dver")).as("_maxDrop")))
    dropDim match {
      case None => rows.drop("_ver")
      case Some(d) =>
        rows.join(broadcast(d), Seq("cluster_id"), "left")
          .where(col("_maxDrop").isNull || col("_maxDrop") <= col("_ver"))
          .drop("_ver", "_maxDrop")
    }
  }

  /** Tier roots of a keep-best compaction base (r19 tiering — the
    * [[bandTierRoots]] manifest idea on the survivor direction): the
    * base's `_CUMULATIVE` marker lists dim-relative roots (each
    * holding attrs/members/labels/labels_by_doc/survivors and its own
    * `BUCKETS` width), newest last; a legacy empty marker (the
    * pre-tiering full-rewrite form) means the single root
    * `v<b>/compact`. Each root's BUILD version — the `_ver` its rows
    * carry under [[applyKbDrops]] — is parsed from the root path. */
  private def kbTierRoots(survDir: String, b: Long): Seq[(Long, String)] = {
    import java.nio.file.{Files, Paths}
    val lines = new String(
      Files.readAllBytes(Paths.get(s"$survDir/v$b/_CUMULATIVE")),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty) Seq(b -> s"$survDir/v$b/compact")
    else lines.map { rel =>
      val ver = "^v(\\d+)/".r.findFirstMatchIn(rel).map(_.group(1).toLong)
        .getOrElse(throw new IllegalStateException(
          s"unparseable keep-best tier root '$rel' in v$b/_CUMULATIVE"))
      ver -> s"$survDir/$rel"
    }
  }

  /** The newest compaction's cumulative per-cluster drop store
    * ((cluster_id, _maxDrop) — see [[applyKbDrops]]), or None for a
    * legacy/pre-tiering base (whose single full store needs only the
    * tail drop slices, exactly the pre-r19 semantics). */
  private def kbCumulativeDrops(spark: SparkSession, survDir: String,
      base: Option[Long]): Option[DataFrame] = {
    import java.nio.file.{Files, Paths}
    base.filter { b =>
      Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
        Files.exists(Paths.get(s"$survDir/v$b/compact/drops"))
    }.map(b => spark.read.parquet(s"$survDir/v$b/compact/drops"))
  }

  /** Power-of-two range-bucket exponent for a compaction's bucketed
    * stores: one stats pass over the assembled dim picks the width
    * targeting ~targetRowsPerBucket rows per bucket at the OBSERVED
    * key density. Because every compaction re-derives the width,
    * bucket size stays ≈ constant as the corpus grows — so a wave's
    * probe reads (touched buckets × target rows), ∝ batch, never
    * ∝ corpus. RANGE buckets (key >> shift) rather than hash: new
    * documents arrive in new id ranges, so a mostly-new batch's
    * buckets don't even exist in the store and the probe reads
    * ~nothing; hash buckets would spread any batch over
    * min(batch, B) directories. Skewed id ranges fatten individual
    * buckets' constant factor, never correctness (a probe always
    * includes every bucket a probe key could live in). Shared by
    * [[compactKeepBest]] and [[compactBandIndex]] so the two
    * compactions' bucket algebra cannot drift. */
  private def kbShiftFor(dim: DataFrame, keyCol: String,
      targetRowsPerBucket: Long): Int = {
    val st = dim
      .agg(min(col(keyCol)), max(col(keyCol)), count(lit(1)))
      .collect()(0)
    val (lo, hi, n) =
      if (st.isNullAt(0)) (0L, 0L, 0L)
      else (st.getLong(0), st.getLong(1), st.getLong(2))
    require(lo >= 0L,
      s"negative $keyCol $lo — kb range bucketing assumes nonnegative ids")
    val width = math.max(1.0,
      (hi - lo + 1).toDouble * targetRowsPerBucket / math.max(1L, n))
    math.min(62,
      math.max(0, math.ceil(math.log(width) / math.log(2)).toInt))
  }

  /** Write one kb_bucket-partitioned compaction artifact, sorted by
    * key within each bucket so row-group min/max pruning inside a
    * touched bucket stays available at warehouse scale. An EMPTY dim
    * is written plain (a partitioned write of zero rows creates no
    * files and the dir cannot be re-read) — [[bucketPruned]] passes
    * kb_bucket-less frames through whole. */
  private def writeKbBucketed(df: DataFrame, keyCol: String, out: String,
      shift: Int): Unit = {
    if (df.isEmpty) df.write.mode("overwrite").parquet(out)
    else df
      .withColumn("kb_bucket", shiftright(col(keyCol), shift).cast("long"))
      .repartition(col("kb_bucket"))
      .sortWithinPartitions(col("kb_bucket"), col(keyCol))
      .write.mode("overwrite").partitionBy("kb_bucket").parquet(out)
  }

  /** Driver-side parquet row count of a store dir, summed from file
    * FOOTERS (r20, ADVICE): the tier metrics below used to run
    * `spark.read.parquet(dir).count()` per store per trigger — each a
    * scheduled Spark job (tasks, exchanges of nothing, listener
    * events), so trigger overhead grew with tier + tail count even
    * when nothing would be absorbed. A footer read is pure metadata
    * (the row count is in the file footer), needs no job, and costs
    * one short ranged read per file — stores are written
    * size-targeted, so file counts are bounded. Recursive listing
    * covers kb_bucket-partitioned stores. */
  private[graft] def parquetRowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf))
        try n += r.getRecordCount finally r.close()
      }
    }
    n
  }

  /** Number of kb_bucket partition directories under a bucketed store
    * — the per-root term of the tier-merge bound below. */
  private def bucketDirCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("kb_bucket=")).toLong
  }

  /** Tier-merge bound for the bucketed stores (r20, VERDICT #4): when
    * the BUCKET DIRECTORIES across a manifest's kept tier roots exceed
    * this, the next compaction absorbs every root into one tier
    * regardless of the size rule. Unmerged tiers each carry their own
    * bucket-dir fan-out, and every wave's probe lists touched buckets
    * per root — at warehouse wave counts the listing cost the
    * compaction removed would re-grow with tier count. The default
    * (4096) keeps listings trivially cheap on any store while firing
    * rarely enough that the forced rewrite amortizes (a major merge is
    * one extra O(corpus) rewrite per ~doubling). Parameterised for
    * tests and clusters; scale-adaptive because bucket width re-derives
    * per tier, so dir count tracks corpus/target rows, not waves. */
  private def maxKeptBucketDirs(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.kb.maxKeptBucketDirs")
      .flatMap(_.toLongOption).getOrElse(4096L)

  /** Compact a delta keep-best lineage at its newest committed
    * version: SIZE-TIERED since the r19 tiering — merge the fresh
    * tail slices plus any prior tier roots of comparable size into a
    * new tier under `v<top>/compact/`, list kept roots + the new tier
    * in the `_CUMULATIVE` manifest (written last) — the
    * [[compactGramIndex]] story on the survivor direction with
    * [[compactUnionStore]]'s amortization. Readers stand on the
    * manifest tiers + later delta slices (O(log W) stores + O(K)
    * listings). Janitor-deletable set: below the base, delta/docs
    * SLICES are subsumed by the tiers and compact roots UNREFERENCED
    * by the newest manifest by later merges — manifest-referenced
    * roots and the version markers must survive (StreamingSpec sweeps
    * exactly that and proves the reader and the next wave unchanged).
    * Idempotent; safe at any cadence.
    *
    * r18 (VERDICT #3): the pre-r18 form wrote the cumulative
    * artifacts OVER the version's top-level paths, which forced a
    * corpus-sized `localCheckpoint` of all three dims first (a pre-r17
    * base AT top is read by the very assembly the write replaced) —
    * executor memory ∝ corpus pinned for the whole compaction. The
    * `compact/` namespace makes reads and writes disjoint by
    * construction: nothing is checkpointed, a crash mid-compaction
    * leaves a torn `compact/` dir no reader trusts (the marker is
    * written last), and the retry overwrites it whole. */
  def compactKeepBest(spark: SparkSession, survDir: String,
      targetRowsPerBucket: Long = 65536L): Unit = {
    import java.nio.file.{Files, Paths}
    val vs = modelVersions(survDir).sorted
    require(vs.nonEmpty, s"no committed survivor version under $survDir")
    val top = vs.max
    if (Files.isRegularFile(Paths.get(s"$survDir/v$top/_CUMULATIVE"))) return
    val base = cumulativeBase(survDir, vs)
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs)
    val cols = Seq("doc_id", "cluster_id", "quality_score", "lang")
    // SIZE-TIERED merge (r19 — [[compactUnionStore]]'s rule, which the
    // survivor stores could not take pre-r19 because their latest-wins
    // precedence needs per-tier version context; [[applyKbDrops]]'
    // cumDrops store + build-version tags supply exactly that): absorb
    // prior tier roots smallest-first while a root's attrs rows are
    // ≤ 2× the rows merged so far. The pre-tiering form rewrote the
    // FULL assembled dims every trigger — total compaction work
    // quadratic in wave count; tiered, a row is rewritten O(log W)
    // times and a trigger whose tails are small writes a small tier.
    // A pre-r17 whole-rewrite base (no marker) has no compact-layout
    // root to keep, so it is always absorbed through the full
    // assembly — a one-time upgrade cost, after which the lineage is
    // manifest-tiered.
    val tieredBase = base.filter(b =>
      Files.isRegularFile(Paths.get(s"$survDir/v$b/_CUMULATIVE")) &&
        Files.exists(Paths.get(s"$survDir/v$b/compact/attrs")))
    val priorCumDrops = kbCumulativeDrops(spark, survDir, base)
    val (kept, attrs, labels, survivors) = tieredBase match {
      case None =>
        val (a, l, s) = assembledKeepBestDims(spark, survDir, vs)
        (Seq.empty[(Long, String)], a, l, s)
      case Some(b) =>
        val roots = kbTierRoots(survDir, b)
        // r20 (ADVICE): a root without the full r19 artifact set (the
        // doc-keyed labels_by_doc copy + BUCKETS meta — r18-era
        // compact layouts, written before those artifacts existed)
        // cannot serve the bucketed probes: if a manifest KEEPS one,
        // the next wave's labelsProbe reads <root>/labels_by_doc — a
        // nonexistent path — and crashes. Force-absorb such roots
        // regardless of size: the same one-time upgrade cost the
        // pre-r17 whole-rewrite base takes, after which every
        // manifest-referenced root carries every probe artifact.
        val (modern, legacy) = roots.partition { case (_, root) =>
          Files.exists(Paths.get(s"$root/labels_by_doc")) &&
            Files.isRegularFile(Paths.get(s"$root/BUCKETS"))
        }
        // the tier metric is attrs ROW COUNT (the corpus-membership
        // artifact — one row per streamed doc), summed from parquet
        // footers on the driver (r20, ADVICE — [[parquetRowCount]]:
        // no per-store count() jobs on the trigger path)
        def rowsOf(dir: String): Long = parquetRowCount(spark, dir)
        var acc = tail.map(v => rowsOf(s"$survDir/v$v/attrs_delta")).sum +
          legacy.map { case (_, root) => rowsOf(s"$root/attrs") }.sum
        val absorbed =
          scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        absorbed ++= legacy
        modern.map { rv => rv -> rowsOf(s"${rv._2}/attrs") }
          .sortBy(_._2).foreach { case (rv, n) =>
            if (n <= 2 * acc) { absorbed += rv; acc += n }
          }
        var keptRoots = roots.filterNot(absorbed.contains)
        // r20 (VERDICT #4): bucket-dir tier-merge bound — see
        // [[maxKeptBucketDirs]]. Counted over the roots that would be
        // KEPT (the new tier's dirs replace the absorbed ones).
        if (keptRoots.map { case (_, root) =>
              bucketDirCount(spark, s"$root/attrs") }.sum
            > maxKeptBucketDirs(spark)) {
          absorbed ++= keptRoots
          keptRoots = Seq.empty
        }
        val a = (absorbed.toSeq.map { case (_, root) =>
            spark.read.parquet(s"$root/attrs")
              .select(col("doc_id"), col("quality_score"), col("lang")) } ++
          tail.map(v => spark.read.parquet(s"$survDir/v$v/attrs_delta")
            .select(col("doc_id"), col("quality_score"), col("lang"))))
          .reduce(_ unionByName _)
        // merged label/survivor rows carry the SAME drop algebra as
        // the readers (absorbed tiers tagged with their build
        // versions, tails with theirs) — so the new tier contains
        // exactly the rows that survive through `top`, and reading it
        // tagged `top` is sound (see [[applyKbDrops]])
        def merge(cumPart: String, deltaPart: String): DataFrame = {
          val rows = (absorbed.toSeq.map { case (ver, root) =>
              spark.read.parquet(s"$root/$cumPart")
                .select(cols.map(col): _*).withColumn("_ver", lit(ver)) } ++
            tail.map(v => spark.read.parquet(s"$survDir/v$v/$deltaPart")
              .select(cols.map(col): _*).withColumn("_ver", lit(v))))
            .reduce(_ unionByName _)
          applyKbDrops(spark, survDir, tail, rows, priorCumDrops)
        }
        (keptRoots, a, merge("labels", "labels_delta"),
          merge("survivors", "survivors_delta"))
    }
    // bucket width (r19, VERDICT #2/#3): see [[kbShiftFor]] — derived
    // from THIS tier's rows, so every tier targets ≈ constant rows per
    // bucket at its own key density (probes collect buckets per
    // distinct width, [[kbRootsPruned]]). Cluster ids are
    // member-minimum doc_ids, so they bucket under the same width as
    // doc ids.
    val shift = kbShiftFor(attrs, "doc_id", targetRowsPerBucket)
    def writeBucketed(df: DataFrame, keyCol: String, part: String): Unit =
      writeKbBucketed(df, keyCol, s"$survDir/v$top/compact/$part", shift)
    writeBucketed(attrs, "doc_id", "attrs")
    // doc_id-only membership (the first-time anti-join's probe side),
    // derived from the just-written attrs so it re-reads one narrow
    // column instead of re-running the assembly
    writeBucketed(
      spark.read.parquet(s"$survDir/v$top/compact/attrs")
        .select(col("doc_id")),
      "doc_id", "members")
    writeBucketed(labels, "cluster_id", "labels")
    // the same label rows keyed the OTHER way: touched-cluster
    // discovery probes BY DOC (wave-pair endpoints → their clusters),
    // member expansion probes BY CLUSTER — two narrow copies beat one
    // corpus labels scan per wave
    writeBucketed(
      spark.read.parquet(s"$survDir/v$top/compact/labels")
        .select(col("doc_id"), col("cluster_id"), col("quality_score"),
          col("lang")),
      "doc_id", "labels_by_doc")
    survivors.write.mode("overwrite")
      .parquet(s"$survDir/v$top/compact/survivors")
    // cumulative per-cluster drop store (r19 tiering): prior
    // cumulative + tail drop slices, per-cluster max — the drop
    // history KEPT tiers need after their recording waves' own
    // `drops` slices are janitor-deleted. Written before the marker
    // like every tier artifact. PRUNED to entries that can still kill
    // a row (r20, ADVICE): every row a reader can present carries
    // _ver >= the minimum build version in the NEW manifest (kept
    // tiers at their build versions, the new tier at `top`, later
    // deltas newer still), and `_maxDrop <= _ver` always survives —
    // so entries with _maxDrop <= that minimum are dead weight, and
    // without pruning the store (broadcast by [[applyKbDrops]] on
    // every wave) would grow with every cluster EVER dropped.
    val minKeptVer = (kept.map(_._1) :+ top).min
    (priorCumDrops
        .map(_.select(col("cluster_id"), col("_maxDrop").as("_dver")))
        .toSeq ++
      tail.map(v => spark.read.parquet(s"$survDir/v$v/drops")
        .select(col("cluster_id")).withColumn("_dver", lit(v))))
      .reduce(_ unionByName _)
      .groupBy(col("cluster_id")).agg(max(col("_dver")).as("_maxDrop"))
      .where(col("_maxDrop") > lit(minKeptVer))
      .write.mode("overwrite").parquet(s"$survDir/v$top/compact/drops")
    // bucket meta BEFORE the marker: a torn compaction never exposes it
    Files.write(Paths.get(s"$survDir/v$top/compact/BUCKETS"),
      shift.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the marker is a MANIFEST since the r19 tiering: kept roots + the
    // new tier, dim-relative, one per line (a legacy EMPTY marker
    // still reads as the single root v<b>/compact). Written last — a
    // torn merge leaves the old manifest authoritative and the orphan
    // compact/ dir invisible.
    val prefix = s"$survDir/"
    val manifest = (kept.map(_._2.stripPrefix(prefix)) :+
      s"v$top/compact").mkString("\n")
    Files.write(Paths.get(s"$survDir/v$top/_CUMULATIVE"),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** The accumulated band index's (band, bh, doc_id) rows over the
    * committed versions `prior`: the newest [[compactBandIndex]]
    * store + O(K) tail slices, or all slices pre-compaction. */
  private[graft] def bandHistBands(spark: SparkSession, dimDir: String,
      prior: Seq[Long]): DataFrame = {
    val vs = prior.sorted
    val base = bandCumulativeBase(dimDir, vs)
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs)
    val roots = base.toSeq.flatMap(b => bandTierRoots(dimDir, b))
    spark.read.parquet(
      (roots.map(r => s"$r/bands") ++
        tail.map(p => s"$dimDir/v$p/bands")): _*)
      .select(col("band"), col("bh"), col("doc_id"))
  }

  /** The exact-Jaccard verify's inputs for a band-index probe: the
    * (possibly pinned) candidate pairs and the hist shingle rows that
    * can match them. With a compacted base, candidates are
    * touched-size — pin them once, then prune the fat shingle store
    * to the candidates' id_b kb_buckets: the verify reads ∝ matches,
    * never ∝ corpus (sound: a hist doc outside the candidates'
    * buckets can never equal a candidate id_b). Pre-compaction both
    * fall through lazily to the all-slices scan. `docsPart`/`docsCols`
    * name the shingle artifact — "docs"(doc_id, sh, nsh) on the
    * standalone band index, "sh"(… + lang) inside the datasheet's
    * embedded dup engine. */
  private[graft] def bandVerifyInputs(spark: SparkSession, dimDir: String,
      prior: Seq[Long], candLazy: DataFrame,
      docsPart: String = "docs",
      docsCols: Seq[String] = Seq("doc_id", "sh", "nsh"))
      : (DataFrame, DataFrame) = {
    val vs = prior.sorted
    val base = bandCumulativeBase(dimDir, vs)
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs)
    base match {
      case Some(b) =>
        val c = graft.Caches.pin(candLazy)
        // one bucket collection per DISTINCT shift — tiers written at
        // different corpus sizes carry different bucket widths
        val roots = bandTierRoots(dimDir, b)
        val shifts = roots.map(r => r -> kbShiftAtRoot(r))
        val bucketsByShift = shifts.flatMap(_._2).distinct
          .map(s => s -> touchedKbBuckets(c, "id_b", s)).toMap
        val h = (shifts.map { case (r, sh) =>
            val df = spark.read.parquet(s"$r/$docsPart")
            sh.fold(df)(s => bucketPruned(df, bucketsByShift(s)))
              .select(docsCols.map(col): _*)
          } ++
          tail.map(p => spark.read.parquet(s"$dimDir/v$p/$docsPart")
            .select(docsCols.map(col): _*)))
          .reduce(_ unionByName _)
        (c, h)
      case None =>
        (candLazy,
          spark.read.parquet(tail.map(p => s"$dimDir/v$p/$docsPart"): _*))
    }
  }

  /** Newest committed version of a band-index lineage carrying a
    * compacted store ([[compactBandIndex]]'s `compact/bands` under a
    * `_CUMULATIVE` marker) — [[cumulativeBase]]'s shape on the index
    * direction. None = no compaction yet: probes fall back to the
    * all-slices scan. */
  private def bandCumulativeBase(dimDir: String,
      vs: Seq[Long]): Option[Long] =
    cumulativeBaseAt(dimDir, vs, "bands")

  /** Tier ROOT dirs of a band-index compaction base (r19 tiering —
    * [[compactUnionStore]]'s manifest idea on the two-artifact store):
    * the base's `_CUMULATIVE` marker lists dim-relative roots, each
    * holding `bands`, the shingle artifact and its own `BUCKETS`
    * width; a legacy empty marker means the single root
    * `v<b>/compact`. */
  private def bandTierRoots(dimDir: String, b: Long): Seq[String] = {
    import java.nio.file.{Files, Paths}
    val lines = new String(
      Files.readAllBytes(Paths.get(s"$dimDir/v$b/_CUMULATIVE")),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty) Seq(s"$dimDir/v$b/compact")
    else lines.map(rel => s"$dimDir/$rel")
  }

  /** The kb_bucket shift a tier root was written with (its `BUCKETS`
    * meta), or None for a root without a bucketed artifact — callers
    * then read that tier unpruned. */
  private def kbShiftAtRoot(root: String): Option[Int] = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(s"$root/BUCKETS")
    if (!Files.isRegularFile(p)) None
    else scala.util.Try(new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt).toOption
  }

  /** Newest committed version under `dimDir` whose `compact/<part>`
    * store committed (`_CUMULATIVE` marker written after it). */
  private def cumulativeBaseAt(dimDir: String, vs: Seq[Long],
      part: String): Option[Long] = {
    import java.nio.file.{Files, Paths}
    vs.filter { v =>
      Files.isRegularFile(Paths.get(s"$dimDir/v$v/_CUMULATIVE")) &&
        Files.exists(Paths.get(s"$dimDir/v$v/compact/$part"))
    }.sorted.lastOption
  }

  /** The live store dirs of a union-store compaction base: since the
    * r19 tiering, a version's `_CUMULATIVE` marker is a MANIFEST —
    * one dim-relative store dir per line, the size-tiered set whose
    * union is the full accumulated store. A legacy empty marker (the
    * pre-tiering full-rewrite form) means the single store
    * `v<b>/compact/<part>`. */
  private def cumulativeStores(dimDir: String, b: Long,
      part: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    val lines = new String(
      Files.readAllBytes(Paths.get(s"$dimDir/v$b/_CUMULATIVE")),
      java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty) Seq(s"$dimDir/v$b/compact/$part")
    else lines.map(rel => s"$dimDir/$rel")
  }

  /** Paths composing a union-store history read: the manifest stores
    * of the newest committed compaction (if any) + the raw slices
    * after it — O(log W) stores + O(K) tails instead of O(W) slices.
    * Falls back to the all-slices scan when no compaction exists. */
  private def unionStorePaths(dimDir: String, vs: Seq[Long],
      part: String): Seq[String] = {
    val sorted = vs.sorted
    val base = cumulativeBaseAt(dimDir, sorted, part)
    val tail = base.map(b => sorted.filter(_ > b)).getOrElse(sorted)
    base.toSeq.flatMap(b => cumulativeStores(dimDir, b, part)) ++
      tail.map(v => s"$dimDir/v$v/$part")
  }

  /** The exact paths a janitor may delete under a `_CUMULATIVE`-marker
    * lineage dir (keep-best survivors, band index, span index, ledger,
    * datasheet dims) — r20, ADVICE: since the r19 tiering, KEPT tier
    * roots live INSIDE old version dirs, so the pre-r19 janitor
    * contract ("version dirs below the newest compaction are deletable
    * outright") silently inverted; a janitor built on it destroys
    * manifest-referenced tiers, detected only as a path-not-found
    * crash at read time. This helper IS the contract now: janitors
    * enumerate instead of re-deriving the rule from doc comments.
    *
    * Protected: version dirs NEWER than the newest manifest (live tail
    * slices), every root the newest manifest references (whole
    * subtrees, wherever they live), and each version dir's
    * `_SUCCESS`/`_CUMULATIVE` markers (version registration + manifest
    * history). Everything else at or below the manifest version is
    * subsumed by the tiers: raw slices, and compact roots earlier
    * merges superseded. Returns maximal deletable subtrees; deleting
    * exactly this set leaves every reader, the next wave and the next
    * recompaction unchanged (StreamingSpec gates it against the batch
    * oracle). */
  def janitorDeletablePaths(dimDir: String): Seq[String] = {
    import java.nio.file.{Files, Paths, Path}
    val vs = modelVersions(dimDir).sorted
    val base = vs.filter(v =>
      Files.isRegularFile(Paths.get(s"$dimDir/v$v/_CUMULATIVE"))).lastOption
    base match {
      case None => Seq.empty // nothing compacted: every slice is live
      case Some(b) =>
        val lines = new String(
          Files.readAllBytes(Paths.get(s"$dimDir/v$b/_CUMULATIVE")),
          java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
        val roots =
          (if (lines.isEmpty) Seq(s"$dimDir/v$b/compact")
           else lines.map(rel => s"$dimDir/$rel"))
            .map(r => Paths.get(r).normalize)
        // a path is deletable iff it neither contains nor lies inside
        // a protected root; a dir containing one recurses so the
        // siblings of a nested root (e.g. v1/compact/shas) still go
        def sweep(p: Path): Seq[String] =
          if (roots.exists(r => r.startsWith(p) && r != p)) {
            val kids = Files.list(p).toArray.toSeq.map(_.asInstanceOf[Path])
            kids.flatMap(sweep)
          } else if (roots.exists(p.startsWith)) Seq.empty
          else Seq(p.toString)
        vs.filter(_ <= b).flatMap { v =>
          val vd = Paths.get(s"$dimDir/v$v")
          Files.list(vd).toArray.toSeq.map(_.asInstanceOf[Path])
            .filterNot(e => e.getFileName.toString == "_CUMULATIVE" ||
              e.getFileName.toString == "_SUCCESS")
            .flatMap(sweep)
        }
    }
  }

  /** SIZE-TIERED compaction of a distinct-union lineage (ledger shas,
    * span index) at its newest committed version `top`. The
    * pre-tiering form rewrote the FULL accumulated store at every
    * cadence trigger — total compaction work quadratic in wave count
    * (every K waves re-reads and re-writes ∝ corpus). Tiered, each
    * trigger merges the fresh tail slices plus any existing manifest
    * stores of comparable size (absorb smallest-first while a store
    * is ≤ 2× the rows merged so far): a row is rewritten O(log W)
    * times total, per-trigger cost is ∝ tails except at exponentially
    * spaced promotions, and readers list O(log W) stores + O(K)
    * tails. Commit protocol unchanged: the merged store is written
    * under `v<top>/compact/<part>` FIRST, then the `_CUMULATIVE`
    * manifest (surviving stores + the new one, dim-relative) LAST —
    * a torn merge leaves the old manifest authoritative and the
    * orphan dir invisible; a replayed trigger is a marker-check
    * no-op. Superseded store dirs are left on disk (same append-only
    * discipline as raw slices — deleting under a concurrent reader
    * of the prior manifest would tear its read); janitor-deletable
    * set = slices at-or-below the base + compact stores unreferenced
    * by the newest manifest, keeping version markers (StreamingSpec
    * sweeps exactly that and proves the reader, later waves and the
    * next recompaction unchanged).
    *
    * `distinctStore`: span slices overlap across waves, so merges
    * re-distinct (cross-tier duplicates are harmless to the left_semi
    * probe and collapse at the next shared merge); ledger slices are
    * anti-joined disjoint at write, so the union is exact without it. */
  private def compactUnionStore(spark: SparkSession, dimDir: String,
      part: String, cols: Seq[String], distinctStore: Boolean): Unit = {
    import java.nio.file.{Files, Paths}
    val vs = modelVersions(dimDir).sorted
    require(vs.nonEmpty, s"no committed version under $dimDir")
    val top = vs.max
    if (Files.isRegularFile(Paths.get(s"$dimDir/v$top/_CUMULATIVE"))) return
    val base = cumulativeBaseAt(dimDir, vs, part)
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs)
    val stores = base.toSeq.flatMap(b => cumulativeStores(dimDir, b, part))
    val tailDirs = tail.map(v => s"$dimDir/v$v/$part")
    // the tier metric is ROW COUNT, not bytes: rows track data
    // ∝-exactly for a fixed schema at any scale, and (unlike file
    // bytes) they are not poisoned by per-file overhead on small
    // slices. Summed from parquet footers on the driver (r20, ADVICE
    // — [[parquetRowCount]]: no count() jobs on the trigger path).
    def rowsOf(dir: String): Long = parquetRowCount(spark, dir)
    var acc = tailDirs.map(rowsOf).sum
    val absorbed = scala.collection.mutable.ArrayBuffer.empty[String]
    stores.map(s => s -> rowsOf(s)).sortBy(_._2).foreach { case (s, b) =>
      if (b <= 2 * acc) { absorbed += s; acc += b }
    }
    val kept = stores.filterNot(absorbed.contains)
    val merged0 = spark.read.parquet((absorbed.toSeq ++ tailDirs): _*)
      .select(cols.map(col): _*)
    val merged = (if (distinctStore) merged0.distinct() else merged0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = merged.count()
    merged.repartition(math.max(1L, n / 8000000L + 1L).toInt)
      .sortWithinPartitions(col(cols.head))
      .write.mode("overwrite").parquet(s"$dimDir/v$top/compact/$part")
    merged.unpersist(blocking = false)
    val prefix = s"$dimDir/"
    val manifest = (kept.map(_.stripPrefix(prefix)) :+
      s"v$top/compact/$part").mkString("\n")
    Files.write(Paths.get(s"$dimDir/v$top/_CUMULATIVE"),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** Compact a band-index lineage at its newest committed version:
    * persist the accumulated (bands, docs) under that version's
    * `compact/` namespace, `_CUMULATIVE` marker last — the
    * [[compactKeepBest]] discipline on the index direction
    * (idempotent, disjoint read/write namespaces, a torn `compact/`
    * dir is invisible without the marker).
    *
    * Why (r19, measured): pre-compaction, every [[bandIndexUpdate]]
    * wave re-opened ALL prior slices — O(waves × shuffle-partitions)
    * files, whose footer/listing reads alone grew ~91 KB/wave on the
    * r19 probe corpus, the dominant per-wave ∝-history read term
    * after the keep-best store bucketing. Post-compaction a wave
    * stands on ONE store + O(K) tail slices.
    *
    * The `docs` store (the fat shingle arrays — the verify side) is
    * kb_bucket range-partitioned by doc_id and sorted within buckets,
    * so the exact-Jaccard verify probes only the candidates' buckets
    * (∝ matches). The `bands` store is size-targeted files sorted by
    * (band, bh): band keys are uniform hashes, so arrival-range
    * bucketing cannot prune a probe — the win here is bounded file
    * count (and the sort keeps row-group stats usable for any future
    * literal probe). */
  def compactBandIndex(spark: SparkSession, dimDir: String,
      targetRowsPerBucket: Long = 65536L,
      docsPart: String = "docs",
      docsCols: Seq[String] = Seq("doc_id", "sh", "nsh")): Unit = {
    import java.nio.file.{Files, Paths}
    val vs = modelVersions(dimDir).sorted
    require(vs.nonEmpty, s"no committed band-index version under $dimDir")
    val top = vs.max
    if (Files.isRegularFile(Paths.get(s"$dimDir/v$top/_CUMULATIVE"))) return
    // assemble from the PRIOR tiers + the tail (not all slices):
    // recompaction stays O(tail) on the listing side and a
    // janitor-swept lineage can still recompact
    val base = bandCumulativeBase(dimDir, vs)
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs)
    val roots = base.toSeq.flatMap(b => bandTierRoots(dimDir, b))
    // SIZE-TIERED merge ([[compactUnionStore]]'s rule on the shingle
    // rows): absorb prior tiers smallest-first while a tier is ≤ 2×
    // the rows merged so far — the pre-tiering form rewrote the FULL
    // accumulated store every trigger, total work quadratic in wave
    // count. Kept tiers survive in the manifest; band/docs slices are
    // per-batch disjoint, so tiers partition the store exactly and no
    // precedence is needed (unlike the latest-wins keep-best survivor
    // stores, which stay single-base for that reason).
    def rowsOf(dir: String): Long = parquetRowCount(spark, dir)
    var acc = tail.map(v => rowsOf(s"$dimDir/v$v/$docsPart")).sum
    val absorbed = scala.collection.mutable.ArrayBuffer.empty[String]
    roots.map(r => r -> rowsOf(s"$r/$docsPart")).sortBy(_._2).foreach {
      case (r, n) => if (n <= 2 * acc) { absorbed += r; acc += n }
    }
    var kept = roots.filterNot(absorbed.contains)
    // r20 (VERDICT #4): bucket-dir tier-merge bound over the kept
    // roots' bucketed docs stores — see [[maxKeptBucketDirs]]
    if (kept.map(r => bucketDirCount(spark, s"$r/$docsPart")).sum
        > maxKeptBucketDirs(spark)) {
      absorbed ++= kept
      kept = Seq.empty
    }
    // the kb_bucket-partitioned tiers and the plain tail slices must
    // be read separately (one mixed read trips Spark's conflicting-
    // directory-structures check) — select() aligns the schemas
    val docs =
      (absorbed.toSeq.map(r => spark.read.parquet(s"$r/$docsPart"))
        ++ tail.map(v => spark.read.parquet(s"$dimDir/v$v/$docsPart")))
      .map(_.select(docsCols.map(col): _*))
      .reduce(_ unionByName _)
    val bands = spark.read.parquet(
      (absorbed.toSeq.map(r => s"$r/bands") ++
        tail.map(v => s"$dimDir/v$v/bands")): _*)
      .select(col("band"), col("bh"), col("doc_id"))
    val shift = kbShiftFor(docs, "doc_id", targetRowsPerBucket)
    writeKbBucketed(docs, "doc_id", s"$dimDir/v$top/compact/$docsPart",
      shift)
    val nBands = bands.count()
    bands.repartition(math.max(1L, nBands / 4000000L + 1L).toInt)
      .sortWithinPartitions(col("band"), col("bh"))
      .write.mode("overwrite").parquet(s"$dimDir/v$top/compact/bands")
    // bucket meta BEFORE the marker: a torn compaction never exposes it
    Files.write(Paths.get(s"$dimDir/v$top/compact/BUCKETS"),
      shift.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val prefix = s"$dimDir/"
    val manifest = (kept.map(_.stripPrefix(prefix)) :+
      s"v$top/compact").mkString("\n")
    Files.write(Paths.get(s"$dimDir/v$top/_CUMULATIVE"),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** One maintained wave of the delta keep-best WITH the compaction
    * cadence — [[gramIndexMaintain]]'s sibling on the survivor
    * direction. Since r19 the cadence also compacts the band-index
    * lineage the maintainer drives (same wave, same `compactEvery`):
    * the keep-best wave cost is bounded only if BOTH its stores'
    * probes are. `compactEvery <= 0` disables the cadence. */
  private[graft] def keepBestDeltaMaintain(dimDir: String, pairsDir: String,
      survDir: String, compactEvery: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    keepBestDeltaUpdate(dimDir, pairsDir, survDir)(batch, batchId)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      compactKeepBest(batch.sparkSession, survDir)
      compactBandIndex(batch.sparkSession, dimDir)
    }
  }

  /** Run the delta keep-best maintainer over a documents stream to
    * completion (AvailableNow) — [[buildKeepBest]]'s sibling on the
    * delta-star updater, compacting the survivor lineage every
    * `compactEvery` waves. Defaults ON at 8 (r18, VERDICT #4): the
    * bounded-listing property must hold without operator opt-in — a
    * lineage that grows until someone remembers to compact is the
    * failure mode the cadence exists to close. Pass 0 to disable. */
  def buildKeepBestDelta(docs: DataFrame, dimDir: String, pairsDir: String,
      survDir: String, ckptDir: String, compactEvery: Int = 8): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dimDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pairsDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(survDir))
    requireSharedLifecycle(dimDir, ckptDir)
    requireSharedLifecycle(survDir, ckptDir)
    requireSliceLifecycle(pairsDir, ckptDir, "pair")
    val q = docs.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        keepBestDeltaMaintain(dimDir, pairsDir, survDir, compactEvery)(
          df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The delta maintainer's survivor set as of the latest committed
    * version: assembled survivors plus the singleton majority. The
    * singletons derive from the assembled ATTRS dim (one first-wins
    * row per streamed doc) rather than the all-versions docs-slice
    * union the rebuild form's reader scans — same rows, deduplicated,
    * and it survives the janitor deleting pre-compaction version
    * dirs. */
  def streamedKeepBestDeltaSurvivors(spark: SparkSession,
      survDir: String): DataFrame = {
    val vs = modelVersions(survDir).sorted
    require(vs.nonEmpty, s"no committed survivor version in $survDir")
    val (attrs, labels, survivors) = assembledKeepBestDims(spark, survDir, vs)
    val singletons = attrs
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"),
        col("quality_score"), col("lang"))
    survivors.unionByName(singletons)
  }

  /** The assembled first-wins attrs dim as of the latest committed
    * version (spec/debug surface for the delta lineage). */
  private[graft] def streamedKeepBestAttrs(spark: SparkSession,
      survDir: String): DataFrame = {
    val vs = modelVersions(survDir).sorted
    require(vs.nonEmpty, s"no committed survivor version in $survDir")
    assembledKeepBestDims(spark, survDir, vs)._1
  }

  /** Tenth maintainer — the fuzzy dictionary's gram/token blocking
    * index, maintained INCREMENTALLY as the dictionary itself changes:
    * the batch path memoizes a per-version index
    * (LocationResolve.fuzzyResolveDim's indexMemoKey) and any
    * dictionary update rebuilds it whole; this updater keys ONLY the
    * batch's added variants and tombstones the removed ones, under a
    * FROZEN gram order (the [[ivfPqIndexUpdate]] frozen-model pattern:
    * prefix filtering is sound under ANY fixed total order — the df
    * order buys selectivity, never recall — so freezing the base
    * dictionary's order keeps every previously-written key slice valid
    * forever; a rebuilt index under the CURRENT df order carries
    * different keys but provably identical resolution results, which
    * is what StreamingSpec compares). Per batch: key the adds (every
    * family, cross grams included, so any later probe shape is
    * served), write them as the version's key slice; write removed
    * vkeys as tombstones; probes are untouched. Cost ∝ batch, never
    * ∝ accumulated dictionary.
    *
    * Batch schema: (vkey, canon, vorder, op), op ∈ 'add'|'del'.
    * Tombstones are VERSIONED (r16; the r15 global-tombstone rule —
    * re-add requires a new lineage — is retired): a del at version v
    * kills adds from versions < v only, so add→del→re-add works in
    * one lineage, and the reader keeps only each vkey's LATEST add
    * slice (duplicate re-adds can never double a vkey's bkey rows —
    * the candidate-count economics the shared-key filter was derived
    * for survive long lineages). Within one batch, add wins over del
    * for the same vkey (a del applies to strictly older versions).
    * Exactly-once: slices first, `_SUCCESS` last, committed replays
    * are no-ops. */
  def gramIndexUpdate(idxDir: String, gramOrder: DataFrame)(
      batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    if (Files.isRegularFile(Paths.get(s"$idxDir/v$batchId/_SUCCESS"))) return
    val prior = modelVersions(idxDir).filter(_ < batchId)
    requirePredecessorState(idxDir, batchId, prior)
    graft.ops.LocationResolve.withBlockKeys(
        batch.filter(col("op") === "add")
          .select(col("vkey"), col("canon"), col("vorder")),
        "vkey", gramOrder, "dlen",
        graft.nlp.Cleaner.FuzzyScoreCutoff,
        grams = true, crossGrams = true, materializeRanked = false)
      .write.mode("overwrite").parquet(s"$idxDir/v$batchId/keys")
    batch.filter(col("op") === "del").select(col("vkey"))
      .write.mode("overwrite").parquet(s"$idxDir/v$batchId/dels")
    Files.write(Paths.get(s"$idxDir/v$batchId/_SUCCESS"),
      Array.emptyByteArray)
  }

  /** One maintained wave of the gram index WITH the compaction
    * cadence (r17, VERDICT #5): the per-batch update, then — every
    * `compactEvery` committed versions — [[compactGramIndex]], so a
    * long-running lineage bounds its own read listing at O(K) waves
    * without an operator remembering to compact. Exactly-once
    * composes: a replayed committed batch no-ops the update, and the
    * compaction is idempotent (`_COMPACT` checked, overwrite-then-
    * marker on retry after a crash mid-compaction). `compactEvery <=
    * 0` disables the cadence (the pre-r17 behavior). */
  private[graft] def gramIndexMaintain(idxDir: String,
      gramOrder: DataFrame, compactEvery: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    gramIndexUpdate(idxDir, gramOrder)(batch, batchId)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactGramIndex(batch.sparkSession, idxDir)
  }

  /** Run the incremental dictionary-index maintainer over a variant
    * update stream (rows (vkey, canon, vorder, op)) to completion,
    * compacting the index every `compactEvery` waves. Defaults ON at
    * 8 (r18, VERDICT #4; see [[buildKeepBestDelta]]). Pass 0 to
    * disable. */
  def buildGramIndex(updates: DataFrame, idxDir: String,
      gramOrder: DataFrame, ckptDir: String,
      compactEvery: Int = 8): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(idxDir))
    requireSharedLifecycle(idxDir, ckptDir)
    val q = updates.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        gramIndexMaintain(idxDir, gramOrder, compactEvery)(df, batchId)
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Compact the streamed gram index up to its newest committed
    * version: materialize the LIVE key rows (latest-wins semantics,
    * `_ver` preserved) as a consolidated `compact/keys` artifact under
    * that version (plus an empty-by-construction `compact/dels` —
    * compacted tombstones are provably inert, see below), `_COMPACT`
    * marker last. [[streamedGramResolve]] then
    * reads the newest compaction + only the slices COMMITTED AFTER
    * it — per-read file listing drops from ∝ lineage length to
    * O(waves since last compaction), the same history-proportional
    * class the r16 attrs dim killed in the keep-best maintainer.
    * Dead key rows (tombstoned or superseded re-adds) leave the read
    * path physically. Idempotent; safe to run at any cadence (each
    * compaction is self-contained, and later updates never touch
    * committed versions). Pre-compaction slice dirs become dead
    * weight on disk that a janitor may delete — correctness never
    * reads them again (StreamingSpec proves resolution survives
    * their deletion). */
  def compactGramIndex(spark: SparkSession, idxDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val vs = modelVersions(idxDir).sorted
    require(vs.nonEmpty, s"no committed index version under $idxDir")
    val top = vs.max
    if (Files.isRegularFile(Paths.get(s"$idxDir/v$top/_COMPACT"))) return
    val (live, dels) = liveGramSlices(spark, idxDir, vs)
    live.write.mode("overwrite").parquet(s"$idxDir/v$top/compact/keys")
    // compacted tombstones are provably inert (r17, ADVICE):
    // compact/keys already excludes every row a tombstone ≤ top could
    // kill, and any post-compaction add carries _ver > top ≥ every
    // compacted _maxDel, so the reader's `_maxDel <= _maxAdd` liveness
    // test can never fail through them — the artifact's dels are
    // written pruned to EMPTY (schema preserved for the reader's
    // union) instead of carrying every historical per-vkey tombstone
    // forever, which grew ∝ delete churn for zero read-path effect.
    dels.limit(0).write.mode("overwrite")
      .parquet(s"$idxDir/v$top/compact/dels")
    Files.write(Paths.get(s"$idxDir/v$top/_COMPACT"), Array.emptyByteArray)
  }

  /** The live key rows (with `_ver`) and per-vkey max tombstone
    * version over the given committed versions, starting from the
    * newest compaction at or below them (if any). */
  private def liveGramSlices(spark: SparkSession, idxDir: String,
      vs: Seq[Long]): (DataFrame, DataFrame) = {
    import java.nio.file.{Files, Paths}
    val base = vs.filter(v =>
      Files.isRegularFile(Paths.get(s"$idxDir/v$v/_COMPACT")))
      .sorted.lastOption
    val tail = base.map(b => vs.filter(_ > b)).getOrElse(vs).sorted
    val keys = (base.map(b => spark.read
        .parquet(s"$idxDir/v$b/compact/keys")).toSeq ++
      tail.map(v => spark.read.parquet(s"$idxDir/v$v/keys")
        .withColumn("_ver", lit(v))))
      .reduce(_ unionByName _)
    val dels = (base.map(b => spark.read
        .parquet(s"$idxDir/v$b/compact/dels")).toSeq ++
      tail.map(v => spark.read.parquet(s"$idxDir/v$v/dels")
        .select(col("vkey")).withColumn("_maxDel", lit(v))))
      .reduce(_ unionByName _)
      .groupBy(col("vkey")).agg(max(col("_maxDel")).as("_maxDel"))
    val lastAdd = keys.groupBy(col("vkey")).agg(max(col("_ver")).as("_maxAdd"))
    val live = keys
      .join(broadcast(lastAdd), Seq("vkey"))
      .where(col("_ver") === col("_maxAdd"))
      .join(broadcast(dels), Seq("vkey"), "left")
      .where(col("_maxDel").isNull || col("_maxDel") <= col("_maxAdd"))
      .drop("_maxAdd", "_maxDel")
    (live, dels)
  }

  /** Resolve DISTINCT probe strings (`fnorm`) against the streamed
    * dictionary index as of the latest committed version: union the
    * committed key slices under LATEST-WINS version semantics (r16 —
    * a key row from slice v is live iff v is its vkey's newest add
    * AND no tombstone at a version > v exists; add→del→re-add
    * resolves to the re-add, duplicate re-adds keep one slice), then
    * the n11/n13 candidate pipeline — shared-key filter, derived
    * length band, codegen scorer, argmax with the vorder-then-vkey
    * tiebreak. Reads start from the newest [[compactGramIndex]]
    * artifact when one exists, so lineage length stops growing the
    * per-read file listing. Probes are keyed under the same frozen
    * order with EVERY family on, mirroring the index's carry (since
    * r16 the cold path keys every family too, so the candidate sets
    * match shape-for-shape). The per-vkey version dims broadcast at
    * dictionary size — the same class as the dict broadcasts
    * everywhere else. StreamingSpec pins equality with the cold
    * rebuild over the surviving dictionary, including an
    * add→del→re-add lineage and a compacted one. */
  def streamedGramResolve(spark: SparkSession, idxDir: String,
      gramOrder: DataFrame, probes: DataFrame,
      probeBroadcast: Option[Boolean] = None): DataFrame = {
    graft.functions.CustomExprs.register(spark)
    val vs = modelVersions(idxDir).sorted
    require(vs.nonEmpty, s"no committed index version under $idxDir")
    val (liveKeys, _) = liveGramSlices(spark, idxDir, vs)
    val live = liveKeys.drop("_ver")
    val probeD = probes.select(col("fnorm")).distinct()
    // probe broadcast under the batch path's sizing switch (r17,
    // VERDICT #2 — this reader broadcast probe keys unconditionally
    // while LocationResolve gained the ProbeBroadcastMax gate in r15):
    // a fact-level probe set past ~1M distinct strings degrades to a
    // shuffle equi-join instead of a driver-sized broadcast. The
    // limit-probe count is an early-out, never a full scan of a
    // large probe side; `probeBroadcast` forces either form for the
    // StreamingSpec shuffle≡broadcast gate.
    val maxP = graft.ops.LocationResolve.ProbeBroadcastMax
    val bcast = probeBroadcast.getOrElse(
      probeD.limit((maxP + 1).toInt).count() <= maxP)
    val probeKeyed0 = graft.ops.LocationResolve.withBlockKeys(
        probeD, "fnorm", gramOrder,
        "plen", graft.nlp.Cleaner.FuzzyScoreCutoff,
        grams = true, crossGrams = true, materializeRanked = false)
    val probeKeyed = if (bcast) broadcast(probeKeyed0) else probeKeyed0
    val cutoff = graft.nlp.Cleaner.FuzzyScoreCutoff
    graft.ops.LocationResolve.candidateFilter(
        live.join(probeKeyed, "bkey")
          .where(graft.ops.LocationResolve.fuzzyLenBandPred(
            col("plen"), col("dlen"), cutoff)),
        Seq("fnorm", "vkey", "canon", "vorder"))
      .withColumn("score", graft.functions.CustomExprs
        .token_sort_ratio(col("fnorm"), col("vkey")))
      .where(col("score") >= cutoff)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fnorm"))
          .orderBy(col("score").desc, col("vorder").asc, col("vkey").asc)))
      .where(col("rn") === 1)
      .select(col("fnorm"), col("canon").as("floc"))
  }

  /** e07 streaming sibling: watermarked stream-stream interval join —
    * clicks joined to the same user's purchases within 10 minutes after
    * the click. Both sides carry a watermark and the join condition bounds
    * purchase_ts relative to click_ts in both directions, so Spark can
    * expire both join states (clicks older than watermark − 10 min,
    * purchases older than watermark) instead of buffering forever — the
    * requirement for an unbounded 100 TB/day stream. Inner-join results
    * emit as they match (append mode), so the finite replay equals the
    * batch form exactly (StreamingSpec). */
  def intervalJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    clicks.join(purchases,
        expr("user_id = p_user_id AND " +
          "purchase_ts >= click_ts AND " +
          "purchase_ts <= click_ts + interval 10 minutes"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  case class UserStat(userId: Long, nEvents: Long, totalValue: Double,
      lastTs: java.sql.Timestamp)
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Custom per-key state (KeyValueGroupedDataset.flatMapGroupsWithState):
    * running per-user counters — the primitive behind bespoke sessionization
    * / enrichment the built-in windows can't express. */
  def userStats(events: DataFrame): Dataset[UserStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select($"user_id", $"ts", $"value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserStat]) => {
          var (n, tot0, last) = state.getOption
            .map(s => (s.nEvents, s.totalValue, s.lastTs))
            .getOrElse((0L, 0.0, new java.sql.Timestamp(0)))
          // accumulate in exact decimal: the group iterator's order is
          // not guaranteed, and double addition is non-associative — a
          // replayed batch folding the same events in another order
          // would commit a last-ulp-different state (windowedAgg casts
          // to decimal(18,2) for exactly this determinism)
          var tot = java.math.BigDecimal.valueOf(tot0)
          evs.foreach { e =>
            n += 1; tot = tot.add(java.math.BigDecimal.valueOf(e.value))
            if (e.ts.after(last)) last = e.ts
          }
          val s = UserStat(uid, n, tot.doubleValue, last)
          state.update(s)
          Iterator.single(s)
        })
  }

  /** The reference's whole periodic cycle — paginated fetch → checkpoint
    * resume → structure → master transform (Main.py:466-518, §3.1) — as
    * ONE streaming pipeline: the paged DSv2 source in micro-batch mode
    * (offset = page index) feeding the P-op coercions and the NLP
    * cleaner. In streaming the cleaner runs as per-row UDFs (the
    * distinct-strings trick is a batch optimization; the dictionary is a
    * closure constant either way). */
  def tripCycle(spark: SparkSession, pagesDir: String): DataFrame =
    graft.ops.Transform.tripRecordTransform(
      spark.readStream.format("graft.sources.PagedJsonSource")
        .load(pagesDir))

  /** The cycle's persistence step in streaming form: each micro-batch of
    * cleaned records lands as a BOM'd CSV directory (the reference's
    * per-cycle `to_csv(..., encoding="utf-8-sig")`, Main.py:544,562) via
    * foreachBatch + the S7 sink. The checkpoint makes re-runs pick up
    * only newly landed pages — the reference's resume semantics, with
    * exactly-once batch ids naming the output dirs. */
  def tripCycleToCsv(spark: SparkSession, pagesDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val q = tripCycle(spark, pagesDir).writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        graft.sources.CsvSink.write(df, s"$outDir/batch_$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Run a streaming DataFrame to completion over the finite fixture
    * (Trigger.AvailableNow + memory sink + checkpoint dir) and return the
    * materialized result. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_ckpt_$name").toString
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
