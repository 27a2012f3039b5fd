package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` with typed
  * metadata. The container has no image/audio codecs, so the decode step
  * is a clearly-marked deterministic STUB (Decoder below); everything
  * around it — schema, batched per-partition decoder lifecycle, frame
  * explosion, partitioning — is the real shape a 100 TB media pipeline
  * needs (the Scala analog of mapInPandas is Dataset.mapPartitions with
  * one decoder instance per partition, amortizing model/codec init).
  *
  * The stand-in blob is the UTF-8 encoding of `documents.text`, which
  * keeps every derived quantity deterministic and oracle-checkable.
  */
object Multimodal {

  /** documents → (doc_id, media_type, blob, byte_size). */
  def mediaFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir).select(
      $"doc_id",
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3).cast("int") + 1).as("media_type"),
      encode($"text", "UTF-8").as("blob"))
      .withColumn("byte_size", length($"blob").cast("long"))
  }

  /** x40 — metadata extraction + decode-stub features, all expressions. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaFrame(spark, sfDir).select(
      $"doc_id", $"media_type", $"byte_size",
      sha2($"blob", 256).as("content_sha"),
      (lit(320L) + ($"byte_size" % 1280)).as("width"),
      (lit(240L) + ($"byte_size" % 720)).as("height"),
      (lit(1L) + ($"byte_size" % 300)).as("duration_s"),
      (($"byte_size" * 31 + $"doc_id") % 256).as("brightness"), // decode stub
    )
      // resize stub: fit into 128×128 preserving aspect (integer math)
      .withColumn("thumb_w", lit(128L))
      .withColumn("thumb_h",
        (($"height" * 128L) / $"width").cast("long"))
      .orderBy($"doc_id")
  }

  val mediaMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_size
      |  FROM documents
      |)
      |SELECT doc_id, media_type, byte_size,
      |  sha256(text) AS content_sha,
      |  320 + (byte_size % 1280) AS width,
      |  240 + (byte_size % 720) AS height,
      |  1 + (byte_size % 300) AS duration_s,
      |  (byte_size * 31 + doc_id) % 256 AS brightness,
      |  CAST(128 AS BIGINT) AS thumb_w,
      |  ((240 + (byte_size % 720)) * 128) // (320 + (byte_size % 1280)) AS thumb_h
      |FROM m ORDER BY doc_id""".stripMargin

  /** x41 — frame sampling: one row per sampled frame with a decode-stub
    * feature. Expression form (oracle-checked). */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nFrames = lit(1L) + ($"byte_size" % 8)
    mediaFrame(spark, sfDir)
      .withColumn("frame_idx", explode(sequence(lit(0L), nFrames - 1)))
      .select($"doc_id", $"frame_idx",
        (($"byte_size" * 7 + $"frame_idx" * 13) % 256).as("feature"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val frameSampleSql: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_size
      |  FROM documents
      |)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |  (byte_size * 7 + f * 13) % 256 AS feature
      |FROM m, UNNEST(range(0, 1 + byte_size % 8)) AS t(f)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** The decode STUB — stands in for a real codec (??? in a container
    * with codecs, this would wrap e.g. javax.imageio / ffmpeg bindings).
    * Deterministic on the blob bytes; expensive-init is simulated so the
    * per-partition amortization pattern is honest. */
  final class Decoder {
    val initialized = true // real codec init would happen here, once
    def decodeBrightness(blob: Array[Byte], docId: Long): Long =
      (blob.length.toLong * 31 + docId) % 256
    def sampleFrames(blob: Array[Byte]): Seq[Long] =
      0L until (1L + blob.length % 8)
    def frameFeature(blob: Array[Byte], frame: Long): Long =
      (blob.length.toLong * 7 + frame * 13) % 256
  }

  /** x41 via mapPartitions — the batched-decoder plumbing (one Decoder per
    * partition, analogous to mapInPandas batch decode). Verified equal to
    * the expression form in MultimodalSpec. */
  def frameSampleViaMapPartitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("feature", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    mediaFrame(spark, sfDir)
      .select($"doc_id", $"blob")
      .mapPartitions { it =>
        val decoder = new Decoder // once per partition
        it.flatMap { r =>
          val docId = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          decoder.sampleFrames(blob).iterator.map { f =>
            Row(docId, f, decoder.frameFeature(blob, f))
          }
        }
      }
      .orderBy($"doc_id", $"frame_idx")
  }
}
