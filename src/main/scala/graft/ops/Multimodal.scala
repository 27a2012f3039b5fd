package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` with typed
  * metadata. The container has no image/video codec libraries, so those
  * decode steps are a clearly-marked deterministic STUB (Decoder below);
  * audio is decoded FOR REAL — [[WavCodec]] parses genuine RIFF/WAVE
  * containers with pure byte arithmetic (x48). Everything around the
  * decode — schema, batched per-partition decoder lifecycle, frame
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

  // ------------------------------------------------------------ x48 WAV

  /** Parsed WAV format metadata — everything below is read from the
    * blob bytes alone. */
  final case class WavMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, dataBytes: Long, durationMs: Long)

  /** A real (if minimal) PCM WAV codec — pure byte arithmetic, no codec
    * libraries, replacing the labeled decode stub for this format
    * (audio was the one media family a codec-free container CAN decode:
    * the RIFF layout is fixed-offset little-endian integers).
    *
    * `encode` writes a canonical RIFF/WAVE container (44-byte PCM
    * header + even-padded data chunk). `decode` is a genuine
    * chunk-walking parser: it validates the RIFF/WAVE magics, walks
    * chunks by their declared sizes (honoring the even-padding rule),
    * reads the format fields out of `fmt ` and the payload length out
    * of `data` — it parses any standard PCM WAV file, including ones
    * with extra chunks (LIST/INFO etc.) between `fmt ` and `data`;
    * MultimodalSpec pins that against a hand-laid-out reference header
    * it did not produce. */
  final class WavCodec {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.charset.StandardCharsets.US_ASCII

    def encode(payload: Array[Byte], sampleRate: Int, channels: Int,
        bits: Int): Array[Byte] = {
      val dataLen = payload.length
      val padded = dataLen + (dataLen & 1) // RIFF chunks pad to even size
      val buf = ByteBuffer.allocate(44 + padded).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(US_ASCII)).putInt(4 + 24 + 8 + padded)
      buf.put("WAVE".getBytes(US_ASCII))
      buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      buf.putShort(1) // PCM
      buf.putShort(channels.toShort)
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * channels * (bits / 8)) // byte rate
      buf.putShort((channels * (bits / 8)).toShort)  // block align
      buf.putShort(bits.toShort)
      buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
      buf.put(payload) // trailing pad byte (if any) stays zero
      buf.array()
    }

    def decode(blob: Array[Byte]): WavMeta = {
      val buf = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, US_ASCII)
      }
      require(buf.remaining >= 12 && tag() == "RIFF", "not a RIFF container")
      buf.getInt() // container size (trailing truncation tolerated)
      require(tag() == "WAVE", "not a WAVE form")
      var rate = -1; var ch = -1; var bits = -1; var dataLen = -1L
      while (buf.remaining >= 8 && dataLen < 0) {
        // chunk sizes are UNSIGNED 32-bit per the RIFF spec — read as
        // u32 so a > 2 GiB data declaration still parses (the payload is
        // never read; only its size is). Chunks that must be WALKED PAST
        // are bounded by what's actually in the buffer, which also
        // guarantees forward progress (a signed read once made a corrupt
        // size of -8 advance the walk by zero — an executor-task hang)
        val id = tag(); val size = buf.getInt().toLong & 0xffffffffL
        if (id == "fmt ") {
          require(size >= 16 && size <= buf.remaining,
            s"bad fmt chunk size $size")
          val start = buf.position()
          val fmt = buf.getShort()
          require(fmt == 1, s"not PCM: format tag $fmt")
          ch = buf.getShort(); rate = buf.getInt()
          buf.getInt(); buf.getShort() // byte rate / block align: derived
          bits = buf.getShort()
          buf.position(start + size.toInt + (size & 1).toInt)
        } else if (id == "data") dataLen = size
        else { // skip chunk
          require(size <= buf.remaining, s"chunk '$id' overruns container")
          buf.position(buf.position() + size.toInt + (size & 1).toInt)
        }
      }
      require(rate > 0 && bits > 0 && ch > 0, "missing or bad fmt chunk")
      // integer PCM frames are whole bytes per sample; without this a
      // declared bitsPerSample of 1-7 makes bits/8 truncate to 0 and
      // durationMs divide by zero (ArithmeticException instead of the
      // intended validation failure)
      require(bits >= 8 && bits % 8 == 0, s"non-byte-aligned PCM bits $bits")
      require(dataLen >= 0, "missing data chunk")
      val byteRate = rate.toLong * ch * (bits / 8)
      WavMeta(rate, ch, bits, dataLen, dataLen * 1000L / byteRate)
    }
  }

  /** documents → (doc_id, genuine WAV blob): each document's text bytes
    * wrapped as the PCM payload of a real RIFF/WAVE container, with
    * per-doc format parameters (8/16/24 kHz, mono/stereo, 16-bit).
    * One codec instance per partition — the mapInPandas-batch analog. */
  def wavFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new WavCodec
        it.map { case (docId, payload) =>
          (docId, codec.encode(payload,
            sampleRate = 8000 * (1 + (docId % 3).toInt),
            channels = 1 + (docId % 2).toInt, bits = 16))
        }
      }
      .toDF("doc_id", "wav")
  }

  /** x48 — REAL audio metadata decode: parse the WAV container bytes
    * (magics, chunk walk, little-endian format fields — nothing from the
    * row but the blob) into sample rate / channels / bit depth / payload
    * size / duration. The DuckDB oracle recomputes the same fields from
    * the generator parameters, so the parse is checked byte-exactly;
    * MultimodalSpec additionally pins the parser against a foreign
    * reference header and extra-chunk layouts the encoder never emits. */
  def wavDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wavFrame(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new WavCodec // once per partition, like a real codec
        it.map { case (docId, wav) =>
          val m = codec.decode(wav)
          (docId, m.sampleRate, m.channels, m.bitsPerSample,
            m.dataBytes, m.durationMs)
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "bits_per_sample",
        "data_bytes", "duration_ms")
      .orderBy($"doc_id")
  }

  val wavDecodeSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
      |    8000 * (1 + doc_id % 3) AS rate,
      |    1 + (doc_id % 2) AS ch
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(rate AS INT) AS sample_rate,
      |  CAST(ch AS INT) AS channels,
      |  CAST(16 AS INT) AS bits_per_sample,
      |  len AS data_bytes,
      |  (len * 1000) // (rate * ch * 2) AS duration_ms
      |FROM m ORDER BY doc_id""".stripMargin

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
