package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** x48 WAV codec: the decode path must be a REAL container parser, not
  * the inverse of our own encoder — pinned against a hand-laid-out
  * reference header and chunk layouts the encoder never produces. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf
  private def codec = new Multimodal.WavCodec

  // shared little-endian encoders for ALL hand-laid RIFF/BMP fixtures in
  // this suite — one definition so byte-layout fixes reach every test
  private def le32(v: Long): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
  private def le16(v: Int): Array[Byte] = Array(v, v >> 8).map(_.toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("encode→decode round-trips format fields and payload size") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 50) {
      val payload = Array.fill(rnd.nextInt(5000))(rnd.nextInt.toByte)
      val rate = Seq(8000, 16000, 22050, 44100, 48000)(rnd.nextInt(5))
      val ch = 1 + rnd.nextInt(2)
      val m = codec.decode(codec.encode(payload, rate, ch, 16))
      assert(m == Multimodal.WavMeta(rate, ch, 16, payload.length,
        payload.length * 1000L / (rate.toLong * ch * 2)))
    }
  }

  test("parses a foreign reference header it did not produce") {
    // The canonical 44-byte PCM WAV header laid out by hand from the
    // RIFF spec (44100 Hz stereo 16-bit, 8-byte payload), byte by byte —
    // NOT built with the encoder, so a codec that merely inverts its own
    // writer fails here.
    val bytes =
      "RIFF".getBytes ++ le32(36 + 8) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++
        le32(44100) ++ le32(176400) ++ le16(4) ++ le16(16) ++
        "data".getBytes ++ le32(8) ++ Array.fill[Byte](8)(0x7f)
    val m = codec.decode(bytes)
    assert(m == Multimodal.WavMeta(44100, 2, 16, 8, 8 * 1000L / 176400))
  }

  test("chunk walk skips extra chunks between fmt and data") {
    // Real WAV files carry LIST/INFO, fact, cue chunks; the parser must
    // walk by declared size (with the odd-size pad rule), not assume the
    // canonical 44-byte layout.
    val oddChunk = "LIST".getBytes ++ le32(5) ++
      Array.fill[Byte](6)(0x42) // 5 declared + 1 pad byte
    val bytes =
      "RIFF".getBytes ++ le32(36 + 12 + 4) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
        oddChunk ++
        "data".getBytes ++ le32(4) ++ Array.fill[Byte](4)(1)
    val m = codec.decode(bytes)
    assert(m == Multimodal.WavMeta(8000, 1, 16, 4, 4 * 1000L / 16000))
  }

  test("corrupt chunk sizes throw instead of hanging the chunk walk") {
    // a declared skip-chunk size beyond the container (-8 read signed
    // once advanced the walk by zero — an infinite loop in an executor
    // task); the parser must throw, never spin
    val bytes = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(-8L & 0xffffffffL) ++ Array.fill[Byte](16)(0)
    intercept[IllegalArgumentException](codec.decode(bytes))
  }

  test("data sizes are u32: a 3 GiB declaration is metadata-readable") {
    // chunk sizes are unsigned per the RIFF spec; the data payload is
    // never read (decode stops at its header), so a high-bit size must
    // parse, not throw — truncated-prefix metadata extraction relies on it
    val big = 0xC0000000L // 3 GiB
    val bytes = "RIFF".getBytes ++ le32(36 + big) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(big)
    val m = codec.decode(bytes)
    assert(m.dataBytes == big)
    assert(m.durationMs == big * 1000L / 16000)
  }

  test("rejects non-WAV bytes") {
    intercept[IllegalArgumentException](codec.decode("not a wav".getBytes))
    intercept[IllegalArgumentException](
      codec.decode("RIFX1234WAVE".getBytes)) // wrong magic
    // RIFF but a different form type (e.g. AVI) must not parse as audio
    intercept[IllegalArgumentException](
      codec.decode("RIFF".getBytes ++ Array.fill[Byte](4)(0) ++ "AVI ".getBytes))
  }

  // ---------------------------------------------------------- x57 BMP
  private def bmpCodec = new Multimodal.BmpCodec

  test("BMP encode→decode round-trips geometry fields") {
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 50) {
      val payload = Array.fill(1 + rnd.nextInt(5000))(rnd.nextInt.toByte)
      val w = 1 + rnd.nextInt(64)
      val bpp = Seq(8, 24, 32)(rnd.nextInt(3))
      val topDown = rnd.nextBoolean()
      val rowBytes = w * bpp / 8
      val h = math.max(1, (payload.length + rowBytes - 1) / rowBytes)
      val stride = (w * bpp + 31) / 32 * 4
      val m = bmpCodec.decode(bmpCodec.encode(payload, w, bpp, topDown))
      assert(m == Multimodal.BmpMeta(w, h, bpp, stride,
        stride.toLong * h, topDown))
    }
  }

  test("parses a foreign BMP reference header it did not produce") {
    // the classic 2×2 24-bit BI_RGB example, laid out by hand from the
    // BMP spec byte by byte — NOT built with the encoder, so a codec
    // that merely inverts its own writer fails here
    val bytes = "BM".getBytes ++ le32(70) ++ le16(0) ++ le16(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      Array.fill[Byte](16)(0xff.toByte)
    val m = bmpCodec.decode(bytes)
    assert(m == Multimodal.BmpMeta(2, 2, 24, 8, 16, topDown = false))
  }

  test("BMP: V5 header size, zero biSizeImage fallback, top-down height") {
    // a 124-byte BITMAPV5HEADER (a superset of V1 — real files carry
    // these), biSizeImage = 0 (legal for BI_RGB → stride × |height|),
    // height −1 (top-down row order): layouts the encoder never emits
    val off = 14 + 124
    val bytes = "BM".getBytes ++ le32(off + 12L) ++ le16(0) ++ le16(0) ++
      le32(off.toLong) ++
      le32(124) ++ le32(3) ++ le32(-1L & 0xffffffffL) ++ le16(1) ++
      le16(24) ++ le32(0) ++ le32(0) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++
      Array.fill[Byte](124 - 40)(0) ++ Array.fill[Byte](12)(1)
    val m = bmpCodec.decode(bytes)
    assert(m == Multimodal.BmpMeta(3, 1, 24, 12, 12, topDown = true))
  }

  test("BMP: rejects non-bitmaps, compressed forms, and corrupt headers") {
    intercept[IllegalArgumentException](bmpCodec.decode("not a bmp".getBytes))
    // a compressed bitmap (BI_RLE8) must be refused, never mis-sized
    val rle = bmpCodec.encode(Array[Byte](1, 2, 3), 4, 8, topDown = false)
    rle(30) = 1 // biCompression ← BI_RLE8
    intercept[IllegalArgumentException](bmpCodec.decode(rle))
    // a pixel offset pointing outside the container must be refused
    val bad = bmpCodec.encode(Array[Byte](1, 2, 3), 4, 24, topDown = false)
    bad(10) = 0x7f // bfOffBits low byte → far beyond the blob...
    intercept[IllegalArgumentException](bmpCodec.decode(bad))
  }

  test("x57 blobs are genuine BMP containers; decode matches the generator") {
    import spark.implicits._
    val rows = Multimodal.bmpFrame(spark, sf).as[(Long, Array[Byte])]
      .take(20)
    assert(rows.nonEmpty)
    rows.foreach { case (docId, bmp) =>
      assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
      val m = bmpCodec.decode(bmp)
      assert(m.width == 8 + (docId % 25).toInt)
      assert(m.bitsPerPixel == Array(8, 24, 32)((docId % 3).toInt))
      assert(m.topDown == (docId % 5 == 0))
      // the declared pixel array really is there, palette included
      val paletteLen = if (m.bitsPerPixel == 8) 1024 else 0
      assert(bmp.length.toLong == 14 + 40 + paletteLen + m.pixelBytes)
    }
  }

  // ---------------------------------------------------------- x58 AVI
  private def aviCodec = new Multimodal.AviCodec

  test("AVI encode→decode round-trips every header field") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val payload = Array.fill(rnd.nextInt(3000))(rnd.nextInt.toByte)
      val w = 2 + rnd.nextInt(1920); val h = 2 + rnd.nextInt(1080)
      val (rate, scale) =
        Seq((24000, 1001), (30000, 1001), (25, 1), (60, 1), (120000, 1001))(
          rnd.nextInt(5))
      val frames = rnd.nextInt(100000)
      val codec = Seq("MJPG", "I420", "DIB ", "FFV1")(rnd.nextInt(4))
      val m = aviCodec.decode(
        aviCodec.encode(payload, w, h, rate, scale, frames, codec))
      assert(m == Multimodal.AviMeta(w, h, 1000000L * scale / rate,
        frames, rate * 1000L / scale, codec))
    }
  }

  test("parses a foreign AVI layout it did not produce") {
    // hand-laid from the AVI spec: a JUNK chunk BEFORE hdrl, an
    // odd-size vendor chunk exercising the even-pad rule, an audio strl
    // before the video strl (first-vids selection), and a trailing idx1
    // — none of which the encoder emits
    val avih = fcc("avih") ++ le32(56) ++ le32(40000) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(250) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(320) ++ le32(240) ++ Array.fill[Byte](16)(0)
    val strhAud = fcc("strh") ++ le32(56) ++ fcc("auds") ++ fcc("    ") ++
      Array.fill[Byte](48)(0)
    val strlAud = fcc("LIST") ++ le32(4 + strhAud.length) ++ fcc("strl") ++ strhAud
    val strhVid = fcc("strh") ++ le32(56) ++ fcc("vids") ++ fcc("XVID") ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++
      le32(0) ++ le32(250) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(320) ++ le16(240)
    val vendor = fcc("vndr") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // odd+pad
    val strlVid = fcc("LIST") ++ le32(4 + strhVid.length + vendor.length) ++
      fcc("strl") ++ strhVid ++ vendor
    val hdrl = fcc("LIST") ++
      le32(4 + avih.length + strlAud.length + strlVid.length) ++ fcc("hdrl") ++
      avih ++ strlAud ++ strlVid
    val junk = fcc("JUNK") ++ le32(8) ++ Array.fill[Byte](8)(0x55)
    val idx1 = fcc("idx1") ++ le32(16) ++ Array.fill[Byte](16)(0)
    val body = junk ++ hdrl ++ idx1
    val bytes = fcc("RIFF") ++ le32(4 + body.length) ++ fcc("AVI ") ++ body
    val m = aviCodec.decode(bytes)
    assert(m == Multimodal.AviMeta(320, 240, 40000L, 250L, 25000L, "XVID"))
  }

  test("AVI: tolerates an unpadded odd-size final chunk") {
    // writers commonly omit the RIFF pad byte after the LAST chunk; the
    // walk's pad advance must clamp to the container end, not position
    // one past it (which threw before the clamp)
    val avih = fcc("avih") ++ le32(56) ++ le32(40000) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(10) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(64) ++ le32(48) ++ Array.fill[Byte](16)(0)
    val strhVid = fcc("strh") ++ le32(56) ++ fcc("vids") ++ fcc("MJPG") ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++
      Array.fill[Byte](28)(0)
    val strl = fcc("LIST") ++ le32(4 + strhVid.length) ++ fcc("strl") ++ strhVid
    val hdrl = fcc("LIST") ++ le32(4 + avih.length + strl.length) ++
      fcc("hdrl") ++ avih ++ strl
    // final top-level chunk: 17 declared bytes, NO trailing pad byte
    val tail = fcc("vndr") ++ le32(17) ++ Array.fill[Byte](17)(0x7e)
    val body = hdrl ++ tail
    val bytes = fcc("RIFF") ++ le32(4 + body.length) ++ fcc("AVI ") ++ body
    val m = aviCodec.decode(bytes)
    assert(m == Multimodal.AviMeta(64, 48, 40000L, 10L, 25000L, "MJPG"))
  }

  test("AVI: rejects non-AVI RIFF forms and headerless containers") {
    intercept[IllegalArgumentException](aviCodec.decode("junk".getBytes))
    // a valid RIFF that is a WAVE, not an AVI
    val wav = new Multimodal.WavCodec
    intercept[IllegalArgumentException](
      aviCodec.decode(wav.encode(Array[Byte](1, 2), 8000, 1, 16)))
    // an AVI form with no hdrl: must refuse, not return garbage
    intercept[IllegalArgumentException](aviCodec.decode(
      fcc("RIFF") ++ le32(4) ++ fcc("AVI ")))
  }

  test("x58 blobs are genuine AVI containers; decode matches the generator") {
    import spark.implicits._
    val rows = Multimodal.aviFrame(spark, sf).as[(Long, Array[Byte])]
      .take(20)
    assert(rows.nonEmpty)
    rows.foreach { case (docId, avi) =>
      assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
      val m = aviCodec.decode(avi)
      assert(m.width == 16 * (1 + (docId % 8).toInt))
      assert(m.height == 12 * (1 + (docId % 6).toInt))
      assert(m.totalFrames == 1 + docId % 120)
      assert(m.codec == Seq("MJPG", "I420", "DIB ")((docId % 3).toInt))
      // the movi payload really is in there, even-padded
      val declared = java.nio.ByteBuffer.wrap(avi, 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
      assert(avi.length == 8 + declared)
    }
  }

  test("x48 blobs are genuine WAV containers; decode matches the generator") {
    import spark.implicits._
    val rows = Multimodal.wavFrame(spark, sf).as[(Long, Array[Byte])]
      .take(20)
    assert(rows.nonEmpty)
    rows.foreach { case (docId, wav) =>
      assert(new String(wav.slice(0, 4)) == "RIFF")
      assert(new String(wav.slice(8, 12)) == "WAVE")
      val m = codec.decode(wav)
      assert(m.sampleRate == 8000 * (1 + (docId % 3).toInt))
      assert(m.channels == 1 + (docId % 2).toInt)
      assert(m.bitsPerSample == 16)
      // declared payload really is there (even-padded container)
      assert(wav.length.toLong == 44 + m.dataBytes + (m.dataBytes & 1))
    }
  }
}
