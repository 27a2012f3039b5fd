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
    // declared size = canonical 36 + the 14-byte LIST (8 hdr + 5 + pad)
    // + 4 extra data bytes — spec-exact so the fixture stays valid if
    // the codec ever validates chunk extents against the declared size
    val bytes =
      "RIFF".getBytes ++ le32(36 + 14 + 4) ++ "WAVE".getBytes ++
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
    // a TRUNCATED pixel array (header describes more rows than the
    // blob holds) must fail validation, not AIOOBE in a stats task
    val whole = bmpCodec.encode(Array.fill[Byte](48)(9), 4, 24,
      topDown = false)
    intercept[IllegalArgumentException](
      bmpCodec.decode(whole.dropRight(8)))
    // same geometry with biSizeImage = 0 (stride-recomputed size):
    // the recomputed pixel array must also fit
    val zeroed = whole.clone()
    zeroed(34) = 0; zeroed(35) = 0; zeroed(36) = 0; zeroed(37) = 0
    intercept[IllegalArgumentException](
      bmpCodec.decode(zeroed.dropRight(8)))
    assert(bmpCodec.decode(zeroed).pixelBytes == 48, "intact zero-size ok")
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

  test("AVI DIB frames: encode→decode round-trips stride-mapped pixels") {
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 50) {
      val payload = Array.fill(rnd.nextInt(2000))(rnd.nextInt.toByte)
      val w = 1 + rnd.nextInt(64)
      val bpp = Seq(8, 24, 32)(rnd.nextInt(3))
      val blob = aviCodec.encodeVideoFrames(payload, w, bpp, "DIB ")
      val rowBytes = w * bpp / 8
      val h = math.max(1, (payload.length + rowBytes - 1) / rowBytes)
      val stride = (w * bpp + 31) / 32 * 4
      val bs = aviCodec.dibFrameBytes(blob)
        .getOrElse(fail("DIB stream rejected"))
      assert(bs.length == stride * h, "frame bytes violate stride*h")
      // every payload byte at its stride-mapped position; padding zero
      val expect = new Array[Byte](stride * h)
      payload.zipWithIndex.foreach { case (b, j) =>
        expect((j / rowBytes) * stride + (j % rowBytes)) = b
      }
      assert(java.util.Arrays.equals(bs, expect), "pixel bytes diverged")
      // the container is still a valid x58 metadata decode
      assert(aviCodec.decode(blob).codec == "DIB ")
    }
  }

  // ---- shared vids-layout builders for the STRUCTURAL AVI tests ----
  // (the foreign-reference-header tests above stay fully inline on
  // purpose: their point is byte-level independence from any builder;
  // these tests vary STRUCTURE — chunk layout, stream count, rec
  // groupings — over the same spec-exact headers, so the header bytes
  // live in one place and a layout fix reaches every test)
  private def strlVids(w: Int, h: Int, bpp: Int, stride: Int): Array[Byte] = {
    val strh = fcc("strh") ++ le32(56) ++ fcc("vids") ++ fcc("DIB ") ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++
      Array.fill[Byte](28)(0)
    val strf = fcc("strf") ++ le32(40) ++ le32(40) ++ le32(w) ++ le32(h) ++
      le16(1) ++ le16(bpp) ++ le32(0) ++ le32(stride * h) ++
      Array.fill[Byte](16)(0)
    fcc("LIST") ++ le32(4 + strh.length + strf.length) ++
      fcc("strl") ++ strh ++ strf
  }
  private def strlAuds(): Array[Byte] = {
    val strh = fcc("strh") ++ le32(56) ++ fcc("auds") ++ le32(1) ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(8000) ++
      Array.fill[Byte](28)(0)
    fcc("LIST") ++ le32(4 + strh.length) ++ fcc("strl") ++ strh
  }
  private def aviFile(w: Int, h: Int, strls: Array[Byte],
      moviBody: Array[Byte], trailer: Array[Byte] = Array.emptyByteArray,
      totalFrames: Int = 1): Array[Byte] = {
    val avih = fcc("avih") ++ le32(56) ++ le32(40000) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(totalFrames) ++ le32(0) ++ le32(1) ++
      le32(0) ++ le32(w) ++ le32(h) ++ Array.fill[Byte](16)(0)
    val hdrl = fcc("LIST") ++ le32(4 + avih.length + strls.length) ++
      fcc("hdrl") ++ avih ++ strls
    val movi = fcc("LIST") ++ le32(4 + moviBody.length) ++
      fcc("movi") ++ moviBody
    val body = hdrl ++ movi ++ trailer
    fcc("RIFF") ++ le32(4 + body.length) ++ fcc("AVI ") ++ body
  }
  private def dbChunk(stream: String, f: Array[Byte]): Array[Byte] =
    fcc(stream + "db") ++ le32(f.length) ++ f

  test("AVI DIB frame decode walks a foreign multi-chunk movi layout") {
    // structural: TWO 00db frame chunks (real writers emit one chunk
    // per frame), a JUNK inside movi, and a trailing idx1 — the
    // single-chunk encoder never produces this
    val w = 3; val bpp = 24 // stride 12, rowBytes 9: real alignment gap
    val stride = 12; val h = 2
    val f0 = Array.tabulate[Byte](stride * h)(i => (i + 1).toByte)
    val f1 = Array.tabulate[Byte](stride * h)(i => (100 + i).toByte)
    val junk = fcc("JUNK") ++ le32(4) ++ Array.fill[Byte](4)(0x55)
    val idx1 = fcc("idx1") ++ le32(16) ++ Array.fill[Byte](16)(0)
    val bytes = aviFile(w, h, strlVids(w, h, bpp, stride),
      dbChunk("00", f0) ++ junk ++ dbChunk("00", f1),
      trailer = idx1, totalFrames = 2)
    val bs = aviCodec.dibFrameBytes(bytes)
      .getOrElse(fail("foreign DIB stream rejected"))
    assert(java.util.Arrays.equals(bs, f0 ++ f1),
      "concatenated frame bytes diverged")
    // a frame chunk violating the stride*h law must throw, not decode —
    // lastIndexOfSlice targets the SECOND chunk (both share identical
    // header bytes), so the walk passes a valid frame before hitting
    // the corrupt one
    val short = bytes.lastIndexOfSlice(fcc("00db") ++ le32(f1.length))
    val corrupt = bytes.clone()
    corrupt(short + 4) = (f1.length - 1).toByte // shrink declared size
    intercept[IllegalArgumentException](aviCodec.dibFrameBytes(corrupt))
  }

  test("AVI frame decode descends interleaved 'LIST rec ' groupings") {
    // the VfW interleave convention wraps each frame set in a
    // `LIST rec ` inside movi; a walker that skips those would return
    // a silent zero-frame decode on a spec-conforming file
    val w = 3; val bpp = 24; val stride = 12; val h = 2
    val f0 = Array.tabulate[Byte](stride * h)(i => (i + 1).toByte)
    val f1 = Array.tabulate[Byte](stride * h)(i => (50 + i).toByte)
    def rec(body: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(4 + body.length) ++ fcc("rec ") ++ body
    // one rec per frame group; second group also carries an audio chunk
    val aud = fcc("01wb") ++ le32(6) ++ Array.fill[Byte](6)(0x11)
    val strls = strlVids(w, h, bpp, stride)
    val bytes = aviFile(w, h, strls,
      rec(dbChunk("00", f0)) ++ rec(dbChunk("00", f1) ++ aud),
      totalFrames = 2)
    val bs = aviCodec.dibFrameBytes(bytes)
      .getOrElse(fail("rec-wrapped DIB stream rejected"))
    assert(java.util.Arrays.equals(bs, f0 ++ f1),
      "rec-wrapped frame bytes diverged")
    // a vids stream whose movi yields NO frame chunks must fail loudly
    // (unrecognized grouping), never decode to zero frames silently
    val nfBytes = aviFile(w, h, strls, Array.emptyByteArray)
    intercept[IllegalArgumentException](aviCodec.dibFrameBytes(nfBytes))
  }

  test("AVI frame decode selects only the chosen vids stream's chunks") {
    // AVI stream numbering: the Nth strl is stream N, its movi chunks
    // are `NNdb`/`NNdc`. A multi-stream file must decode ONLY the
    // selected vids stream — another stream's frames blended in would
    // corrupt the pixels or trip the stride law on a well-formed file.
    // layout A: stream 0 is AUDIO, stream 1 is the vids — frames are
    // tagged 01db and a stray 00wb audio chunk sits between them
    val fA = Array.tabulate[Byte](12 * 2)(i => (i + 1).toByte)
    val aud = Array.fill[Byte](6)(0x11)
    val bodyA = dbChunk("01", fA) ++
      fcc("00wb") ++ le32(aud.length) ++ aud
    val bsA = aviCodec.dibFrameBytes(
        aviFile(3, 2, strlAuds() ++ strlVids(3, 2, 24, 12), bodyA))
      .getOrElse(fail("vids-as-stream-1 rejected"))
    assert(java.util.Arrays.equals(bsA, fA), "stream-1 vids frames diverged")
    // layout B: TWO vids streams with different geometry — stream 1's
    // frame (48 B ≠ stream 0's stride·h = 24 B) must be IGNORED, not
    // blended in or tripped over by the stride law
    val f0 = Array.tabulate[Byte](12 * 2)(i => (i + 1).toByte)
    val f1 = Array.fill[Byte](24 * 2)(0x77)
    val bodyB = dbChunk("00", f0) ++ dbChunk("01", f1)
    val bsB = aviCodec.dibFrameBytes(
        aviFile(3, 2, strlVids(3, 2, 24, 12) ++ strlVids(8, 2, 24, 24),
          bodyB))
      .getOrElse(fail("two-vids-stream file rejected"))
    assert(java.util.Arrays.equals(bsB, f0),
      "second vids stream's frames leaked into the decode")
  }

  test("AVI entropy-coded streams are rejected with the handler fourcc") {
    val payload = "not really mjpeg bytes".getBytes("US-ASCII")
    for (fourcc <- Seq("MJPG", "I420")) {
      val blob = aviCodec.encodeVideoFrames(payload, 16, 24, fourcc)
      assert(aviCodec.dibFrameBytes(blob) == Left(fourcc.trim),
        s"$fourcc must reject")
      // and the metadata walk still reads it (rejection ≠ unparseable)
      assert(aviCodec.decode(blob).codec == fourcc)
    }
    // biCompression is authoritative: a stream CLAIMING 'DIB ' but
    // carrying a nonzero compression tag must still reject
    val dib = aviCodec.encodeVideoFrames(payload, 16, 24, "DIB ")
    val strfAt = dib.indexOfSlice(fcc("strf"))
    val lying = dib.clone()
    lying(strfAt + 8 + 4 + 4 + 4 + 2 + 2) = 1 // biCompression = BI_RLE8
    assert(lying(strfAt + 8 + 16) == 1, "offset check")
    assert(aviCodec.dibFrameBytes(lying) == Left("DIB"))
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

  // ---------------------------------------------------------- x63 PNG
  private def pngCodec = new Multimodal.PngCodec

  private def be32(v: Long): Array[Byte] =
    Array(v >> 24, v >> 16, v >> 8, v).map(_.toByte)

  /** PNG chunk with a REAL CRC — for hand-laying foreign layouts. */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32(crc.getValue)
  }
  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  test("PNG encode→decode round-trips header fields; IDAT genuinely inflates") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 30) {
      val payload = Array.fill(rnd.nextInt(150000))(rnd.nextInt.toByte)
      val w = 1 + rnd.nextInt(64)
      val (depth, ct) = Seq((8, 0), (8, 2), (8, 6), (16, 0), (16, 2))(
        rnd.nextInt(5))
      val png = pngCodec.encode(payload, w, depth, ct)
      val m = pngCodec.decode(png)
      val ch = Seq(1, 0, 3, 0, 2, 0, 4)(ct)
      val rowBytes = w * ch * depth / 8
      val h = math.max(1, (payload.length + rowBytes - 1) / rowBytes)
      val raw = h * (1 + rowBytes)
      assert(m == Multimodal.PngMeta(w, h, depth, ct, ch, false,
        2L + 5 * math.max(1, (raw + 65534) / 65535) + raw + 4))
      // the zlib stream is GENUINE: a stock Inflater recovers the
      // filter-byte-prefixed scanlines, payload intact (>64 KiB payloads
      // exercise the multi-block stored framing)
      val idatOff = 8 + 12 + 13 + 8 // sig + IHDR chunk + IDAT len/type
      val inf = new java.util.zip.Inflater()
      inf.setInput(png, idatOff, m.idatBytes.toInt)
      val out = new Array[Byte](raw)
      assert(inf.inflate(out) == raw && inf.finished())
      val recovered = (0 until h).flatMap { r =>
        assert(out(r * (1 + rowBytes)) == 0, "filter byte must be None")
        out.slice(r * (1 + rowBytes) + 1, (r + 1) * (1 + rowBytes))
      }.toArray
      assert(java.util.Arrays.equals(recovered.take(payload.length), payload))
    }
  }

  test("parses a foreign PNG layout: ancillary chunks, split IDAT, interlace") {
    // hand-laid with chunks the encoder never emits: pHYs + tEXt before
    // the image data, the zlib stream SPLIT across three IDAT chunks
    // (real writers emit ~32 KiB IDATs), Adam7 interlace flag set
    val ihdr = be32(640) ++ be32(480) ++
      Array[Byte](8, 3, 0, 0, 1) // 8-bit palette, interlaced
    val zlib = pngCodec.zlibStored(Array.fill[Byte](100)(0x5a))
    val (a, rest) = zlib.splitAt(40)
    val (b, c) = rest.splitAt(30)
    val png = pngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("pHYs", be32(2835) ++ be32(2835) ++ Array[Byte](1)) ++
      pngChunk("tEXt", "Software graft".getBytes("US-ASCII")) ++
      pngChunk("IDAT", a) ++ pngChunk("IDAT", b) ++ pngChunk("IDAT", c) ++
      pngChunk("IEND", Array.emptyByteArray)
    val m = pngCodec.decode(png)
    assert(m == Multimodal.PngMeta(640, 480, 8, 3, 1, true, zlib.length))
  }

  test("PNG: rejects bad signature, corrupted IHDR CRC, invalid combos") {
    intercept[IllegalArgumentException](pngCodec.decode("not a png".getBytes))
    val good = pngCodec.encode(Array[Byte](1, 2, 3), 4, 8, 0)
    // flip one IHDR data byte without fixing its CRC: must refuse
    val corrupt = good.clone()
    corrupt(8 + 8 + 4) = (corrupt(8 + 8 + 4) ^ 1).toByte
    intercept[IllegalArgumentException](pngCodec.decode(corrupt))
    // depth 16 is illegal for palette color (type 3)
    val badCombo = pngSig ++
      pngChunk("IHDR", be32(4) ++ be32(4) ++ Array[Byte](16, 3, 0, 0, 0)) ++
      pngChunk("IDAT", pngCodec.zlibStored(Array[Byte](0))) ++
      pngChunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](pngCodec.decode(badCombo))
    // IHDR not first (spec violation): must refuse
    val notFirst = pngSig ++
      pngChunk("tEXt", "x y".getBytes("US-ASCII")) ++
      pngChunk("IHDR", be32(4) ++ be32(4) ++ Array[Byte](8, 0, 0, 0, 0)) ++
      pngChunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](pngCodec.decode(notFirst))
  }

  test("x63 blobs are genuine PNGs; decode matches the generator") {
    import spark.implicits._
    val rows = Multimodal.pngFrame(spark, sf).as[(Long, Array[Byte])]
      .take(20)
    assert(rows.nonEmpty)
    rows.foreach { case (docId, png) =>
      assert(java.util.Arrays.equals(png.slice(0, 8), pngSig))
      val m = pngCodec.decode(png)
      assert(m.width == 8 + (docId % 24).toInt)
      assert(m.bitDepth == Seq(8, 8, 8, 16)((docId % 4).toInt))
      assert(m.colorType == Seq(0, 2, 6)((docId % 3).toInt))
    }
  }

  // ---------------------------------------------------------- x64 JPEG
  private def jpegCodec = new Multimodal.JpegCodec

  test("JPEG encode→decode round-trips; 0xFF payloads exercise un-stuffing") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 30) {
      // binary payload: ~1/256 of bytes are 0xFF, so the scan REALLY
      // contains stuffed FF00 sequences the decoder must not count twice
      val payload = Array.fill(rnd.nextInt(5000))(rnd.nextInt.toByte)
      val w = 1 + rnd.nextInt(2000)
      val h = 1 + rnd.nextInt(2000)
      val ncomp = Seq(1, 3)(rnd.nextInt(2))
      val prog = rnd.nextBoolean()
      val m = jpegCodec.decode(jpegCodec.encode(payload, w, h, ncomp, prog))
      assert(m == Multimodal.JpegMeta(w, h, 8, ncomp, prog, payload.length))
    }
  }

  test("parses a foreign JPEG layout: COM, fill bytes, restart markers") {
    import java.nio.ByteBuffer
    def seg(marker: Int, data: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++
        Array(((data.length + 2) >> 8).toByte, (data.length + 2).toByte) ++ data
    val sof = ByteBuffer.allocate(9)
      .put(12.toByte) // 12-bit precision (extended sequential allows it)
      .putShort(768.toShort).putShort(1024.toShort) // height THEN width
      .put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte).array()
    val sos = Array[Byte](1, 1, 0, 0, 63, 0)
    // scan: 5 data bytes, a stuffed FF (counts as ONE), an RST0 marker
    // (counts as ZERO), 3 more bytes, then EOI
    val scan = Array[Byte](1, 2, 3, 4, 5) ++
      Array(0xff.toByte, 0x00.toByte) ++
      Array(0xff.toByte, 0xd0.toByte) ++ Array[Byte](6, 7, 8)
    val jpg = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xfe, "a comment".getBytes("US-ASCII")) ++ // COM, never emitted
      Array(0xff.toByte) ++ // fill byte before the next marker (B.1.1.2)
      seg(0xc1, sof) ++     // SOF1 extended sequential, never emitted
      seg(0xda, sos) ++ scan ++ Array(0xff.toByte, 0xd9.toByte)
    val m = jpegCodec.decode(jpg)
    assert(m == Multimodal.JpegMeta(1024, 768, 12, 1, false, 9L))
  }

  test("JPEG: rejects missing SOI, missing SOF, truncated scans") {
    intercept[IllegalArgumentException](jpegCodec.decode("nope".getBytes))
    // SOI + EOI with no frame header: refuse, not garbage geometry
    intercept[IllegalArgumentException](jpegCodec.decode(
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)))
    // a scan that never reaches EOI must throw, not run off the buffer
    val good = jpegCodec.encode(Array[Byte](1, 2, 3), 8, 8, 1, false)
    intercept[IllegalArgumentException](
      jpegCodec.decode(good.dropRight(2)))
  }

  test("x64 blobs are genuine JPEGs; decode matches the generator") {
    import spark.implicits._
    val rows = Multimodal.jpegFrame(spark, sf).as[(Long, Array[Byte])]
      .take(20)
    assert(rows.nonEmpty)
    rows.foreach { case (docId, jpg) =>
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
      assert((jpg(jpg.length - 2) & 0xff) == 0xff &&
        (jpg(jpg.length - 1) & 0xff) == 0xd9)
      val m = jpegCodec.decode(jpg)
      assert(m.width == 8 * (1 + (docId % 40).toInt))
      assert(m.height == 8 * (1 + (docId % 30).toInt))
      assert(m.nComponents == Seq(1, 3)((docId % 2).toInt))
      assert(m.progressive == (docId % 4 == 0))
      // the generator stamps EXIF in both TIFF byte orders
      assert(m.orientation == 1 + (docId % 8).toInt)
      assert(m.exifDatetime ==
        f"2024:06:${1 + (docId % 28)}%02d ${docId % 24}%02d:${docId % 60}%02d:00")
    }
  }

  test("JPEG EXIF: round-trips both byte orders; foreign TIFF layout parses") {
    // encoder round-trip, LE and BE
    for (be <- Seq(false, true)) {
      val jpg = jpegCodec.encode(Array[Byte](1, 2, 3), 16, 8, 1, false,
        exif = Some((6, "2023:12:25 08:30:00")), exifBigEndian = be)
      val m = jpegCodec.decode(jpg)
      assert(m.orientation == 6 && m.exifDatetime == "2023:12:25 08:30:00",
        s"EXIF round-trip failed (bigEndian=$be)")
    }
    // a hand-laid FOREIGN EXIF the encoder never produces: big-endian
    // TIFF, IFD0 at a non-minimal offset, a Make tag (0x010F) BEFORE
    // orientation, and the DateTime string placed after the IFD
    val bb = java.nio.ByteBuffer.allocate(200)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    val t0 = bb.position() // TIFF origin
    bb.put("MM".getBytes("US-ASCII")).putShort(42).putInt(16) // IFD0 at 16
    bb.put(Array.fill[Byte](8)(0x55)) // 8 bytes of padding before the IFD
    bb.putShort(3) // three entries
    bb.putShort(0x010f.toShort).putShort(2).putInt(4)
      .put("ACME".getBytes("US-ASCII"))              // Make, inline ASCII
    bb.putShort(0x0112.toShort).putShort(3).putInt(1)
      .putShort(8).putShort(0)                       // orientation = 8
    val strOff = 16 + 2 + 3 * 12 + 4 // past the IFD and next-IFD pointer
    bb.putShort(0x0132.toShort).putShort(2).putInt(20).putInt(strOff)
    bb.putInt(0) // next IFD
    assert(bb.position() == t0 + strOff)
    bb.put("2020:01:02 03:04:05".getBytes("US-ASCII")).put(0.toByte)
    val app1 = java.util.Arrays.copyOf(bb.array(), bb.position())
    def seg(marker: Int, data: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((data.length + 2) >> 8).toByte, ((data.length + 2) & 0xff).toByte) ++
        data
    val sof = Array[Byte](8, 0, 8, 0, 16, 1, 1, 0x11, 0)
    val jpg = Array(0xff.toByte, 0xd8.toByte) ++ seg(0xe1, app1) ++
      seg(0xc0, sof) ++ Array(0xff.toByte, 0xd9.toByte)
    val m = jpegCodec.decode(jpg)
    assert(m.orientation == 8 && m.exifDatetime == "2020:01:02 03:04:05")
    // a non-EXIF APP1 (XMP) is skipped without EXIF fields
    val xmp = "http://ns.adobe.com/xap/1.0/".getBytes("US-ASCII")
    val m2 = jpegCodec.decode(Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xe1, xmp) ++ seg(0xc0, sof) ++ Array(0xff.toByte, 0xd9.toByte))
    assert(m2.orientation == 0 && m2.exifDatetime == "")
  }

  test("JPEG: standalone markers outside a scan are rejected cleanly") {
    // TEM (0x01) and RSTn (0xd0-0xd7) carry no length word; a naive
    // length read would misparse the following bytes as a segment size
    // and fail with a confusing overrun instead of a clear rejection
    for (marker <- Seq(0x01, 0xd0, 0xd7)) {
      val bad = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, marker.toByte,
        0xff.toByte, 0xd9.toByte)
      val e = intercept[IllegalArgumentException](jpegCodec.decode(bad))
      assert(e.getMessage.contains("standalone marker"),
        s"marker $marker: ${e.getMessage}")
    }
  }

  // ------------------------------------------- x65/x67/x68 content stats

  test("x40 byte_mean is measured: equals a JVM recompute over the payload") {
    import spark.implicits._
    val got = Multimodal.mediaMeta(spark, sf)
      .select($"doc_id", $"byte_mean").as[(Long, Long)].collect().toMap
    val ref = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val b = t.getBytes("UTF-8")
        id -> b.map(_ & 0xffL).sum / b.length
      }.toMap
    assert(got == ref, "byte_mean diverged from the payload recompute")
  }

  test("PNG unfilter reconstructs Sub/Up/Average/Paeth-filtered scanlines") {
    // an independent forward-filter (spec §9) the codec must invert —
    // our encoder only emits filter 0, so this is the foreign case
    def fwd(ftype: Int, row: Array[Int], prev: Array[Int],
        fpp: Int): Array[Byte] = {
      row.indices.map { i =>
        val a = if (i >= fpp) row(i - fpp) else 0
        val b = prev(i)
        val c = if (i >= fpp) prev(i - fpp) else 0
        val x = ftype match {
          case 0 => row(i)
          case 1 => row(i) - a
          case 2 => row(i) - b
          case 3 => row(i) - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            row(i) - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        (x & 0xff).toByte
      }.toArray
    }
    val rnd = new scala.util.Random(23)
    for ((depth, ct, ch) <- Seq((8, 0, 1), (8, 2, 3), (16, 6, 4))) {
      val w = 5
      val rowBytes = w * ch * depth / 8
      val recon = Array.fill(5)(Array.fill(rowBytes)(rnd.nextInt(256)))
      val zero = Array.fill(rowBytes)(0)
      val fpp = math.max(1, ch * depth / 8)
      val raw = recon.zipWithIndex.flatMap { case (row, r) =>
        val prev = if (r == 0) zero else recon(r - 1)
        (r % 5).toByte +: fwd(r % 5, row, prev, fpp) // filters 0,1,2,3,4
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(5).put(depth.toByte).put(ct.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array()
      val png = pngSig ++ pngChunk("IHDR", ihdr) ++
        pngChunk("IDAT", pngCodec.zlibStored(raw)) ++
        pngChunk("IEND", Array.emptyByteArray)
      val got = pngCodec.unfilteredPixels(png)
      assert(java.util.Arrays.equals(got,
        recon.flatten.map(v => (v & 0xff).toByte)),
        s"unfilter mismatch at depth=$depth ct=$ct")
    }
  }

  test("x65/x67/x68 stats equal payload-computed references") {
    import spark.implicits._
    // the decoded-container stats must equal what the raw payload bytes
    // say directly — decode adds container structure, never content
    val texts = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)]
      .take(30).toMap
    def bytesOf(id: Long): Array[Byte] = texts(id).getBytes("UTF-8")

    val bmp = Multimodal.bmpPixelStats(spark, sf)
      .filter($"doc_id".isin(texts.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(bmp.nonEmpty)
    bmp.foreach { case (id, (sum, meanMilli, mx)) =>
      val p = bytesOf(id).map(_ & 0xff)
      assert(sum == p.map(_.toLong).sum, s"x65 byte_sum doc $id")
      assert(mx == (if (p.isEmpty) 0 else p.max), s"x65 max_byte doc $id")
      val w = 8 + (id % 25).toInt
      val bpp = Seq(8, 24, 32)((id % 3).toInt)
      val rb = w * bpp / 8
      val h = math.max(1, (p.length + rb - 1) / rb)
      assert(meanMilli == p.map(_.toLong).sum * 1000 / (w.toLong * h * (bpp / 8)),
        s"x65 mean_milli doc $id")
    }

    val wav = Multimodal.wavPcmStats(spark, sf)
      .filter($"doc_id".isin(texts.keys.toSeq: _*))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(wav.nonEmpty)
    wav.foreach { case (id, (n, peak, sumSq, rms)) =>
      val p = bytesOf(id)
      val samples = (0 until p.length / 2).map { j =>
        (p(2 * j + 1) << 8) | (p(2 * j) & 0xff)
      }
      assert(n == samples.size, s"x67 n_samples doc $id")
      assert(peak == (if (samples.isEmpty) 0L
        else samples.map(s => math.abs(s.toLong)).max), s"x67 peak doc $id")
      assert(sumSq == samples.map(s => s.toLong * s).sum, s"x67 sum_sq doc $id")
      val expRms = if (samples.isEmpty) 0L
        else math.floor(math.sqrt(sumSq.toDouble / n) * 1000).toLong
      assert(rms == expRms, s"x67 rms doc $id")
    }

    val png = Multimodal.pngPixelStats(spark, sf)
      .filter($"doc_id".isin(texts.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(png.nonEmpty)
    png.foreach { case (id, (sum, meanMilli, mx)) =>
      val p = bytesOf(id).map(_ & 0xff)
      assert(sum == p.map(_.toLong).sum, s"x68 byte_sum doc $id")
      assert(mx == (if (p.isEmpty) 0 else p.max), s"x68 max_byte doc $id")
      val w = 8 + (id % 24).toInt
      val depth = Seq(8, 8, 8, 16)((id % 4).toInt)
      val ch = Seq(1, 0, 3, 0, 2, 0, 4)(Seq(0, 2, 6)((id % 3).toInt))
      val rb = w * ch * depth / 8
      val h = math.max(1, (p.length + rb - 1) / rb)
      assert(meanMilli == p.map(_.toLong).sum * 1000 / (h.toLong * rb),
        s"x68 mean_milli doc $id")
    }
  }

  test("x67 odd-length payload drops the trailing half-sample") {
    val wavCodec = new Multimodal.WavCodec
    val wav = wavCodec.encode(Array[Byte](10, 20, 30), 8000, 1, 16)
    val (off, len) = wavCodec.dataRange(wav)
    assert(len == 3 && off == 44)
    // one full sample (10, 20) = 0x140A little-endian = 5130
    assert(((wav(off + 1) << 8) | (wav(off) & 0xff)) == 5130)
  }

  // ------------------------------------------------- baseline JPEG (x41)

  private def jpegB = new graft.ops.JpegBaselineCodec

  test("JPEG baseline: gray DC-only round-trip is the exact block expansion") {
    // expectation computed with plain array math, independent of the
    // decoder's plane/MCU bookkeeping
    val payload = (0 until 41).map(i => ((i * 37 + 5) % 256).toByte).toArray
    for (n <- Seq(1, 2, 3); restart <- Seq(0, 4)) {
      val blob = jpegB.encodeGrayDcOnly(payload, n, restart)
      val img = jpegB.decode(blob)
      val m = (payload.length + n - 1) / n
      assert(img.width == 8 * n && img.height == 8 * m && img.nComponents == 1,
        s"n=$n restart=$restart geometry")
      val expected = new Array[Byte](64 * n * m)
      for (j <- 0 until n * m; k <- 0 until 64) {
        val p = (j / n) * 64 * n + (k / 8) * 8 * n + (j % n) * 8 + (k % 8)
        expected(p) = if (j < payload.length) payload(j) else 0
      }
      assert(java.util.Arrays.equals(img.pixels, expected),
        s"n=$n restart=$restart pixel mismatch")
    }
  }

  test("JPEG baseline: restart markers are real RSTn bytes in the stream") {
    val payload = Array.tabulate(20)(i => (i * 11).toByte)
    val blob = jpegB.encodeGrayDcOnly(payload, 1, restartInterval = 4)
    // 20 MCUs at interval 4 → RST0..RST3 appear (modulo-8 numbering)
    val rsts = blob.sliding(2).zipWithIndex.collect {
      case (Array(a, b), _) if a == 0xff.toByte &&
        (b & 0xff) >= 0xd0 && (b & 0xff) <= 0xd7 => b & 0xff
    }.toSeq
    assert(rsts == Seq(0xd0, 0xd1, 0xd2, 0xd3),
      s"expected 4 sequential RSTn markers, got ${rsts.map(_.toHexString)}")
  }

  test("JPEG baseline: hand-assembled stream with AC coefficients decodes " +
      "through the real Huffman+IDCT path") {
    import graft.ops.JpegBaseline._
    // an independent canonical-code builder (T.81 C.2 restated), so the
    // test's bitstream does not depend on the codec's own writer
    def codes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) {
          out(vals(k)) = (code, l); code += 1; k += 1
        }
        code <<= 1
      }
      out.toMap
    }
    val dc = codes(DcLumBits, DcLumVals)
    val ac = codes(AcLumBits, AcLumVals)
    val bitbuf = scala.collection.mutable.ArrayBuffer.empty[Int]
    def putBits(v: Int, len: Int): Unit =
      for (i <- (len - 1) to 0 by -1) bitbuf += ((v >> i) & 1)
    // one 8×8 block: DC = 40 (cat 6), AC at zigzag k=1 → (u,v)=(1,0)
    // with run 0, value 12 (cat 4), then EOB
    putBits(dc(6)._1, dc(6)._2); putBits(40, 6)
    putBits(ac(0x04)._1, ac(0x04)._2); putBits(12, 4)
    putBits(ac(0x00)._1, ac(0x00)._2)
    while (bitbuf.length % 8 != 0) bitbuf += 1 // pad with 1s
    val scan = bitbuf.grouped(8)
      .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    assert(!scan.contains(0xff.toByte), "fixture avoids stuffing by design")
    def seg(m: Int, body: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, m.toByte, ((body.length + 2) >> 8).toByte,
        ((body.length + 2) & 0xff).toByte) ++ body
    val qAll1 = Array(0.toByte) ++ Array.fill(64)(1.toByte)
    val sof = Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0)
    val dht0 = Array(0x00.toByte) ++ DcLumBits.map(_.toByte) ++
      DcLumVals.map(_.toByte)
    val dht1 = Array(0x10.toByte) ++ AcLumBits.map(_.toByte) ++
      AcLumVals.map(_.toByte)
    val sos = Array[Byte](1, 1, 0x00, 0, 63, 0)
    val blob = Array(0xff.toByte, 0xd8.toByte) ++ seg(0xdb, qAll1) ++
      seg(0xc0, sof) ++ seg(0xc4, dht0) ++ seg(0xc4, dht1) ++
      seg(0xda, sos) ++ scan ++ Array(0xff.toByte, 0xd9.toByte)
    val img = jpegB.decode(blob)
    assert(img.width == 8 && img.height == 8)
    // expected pixels from the textbook IDCT formula, restated here
    val expected = Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      def cos(a: Int, f: Int) = math.cos((2 * a + 1) * f * math.Pi / 16)
      val s = (1.0 / math.sqrt(2)) * (1.0 / math.sqrt(2)) * 40 * 1 * 1 +
        1.0 * (1.0 / math.sqrt(2)) * 12 * cos(x, 1) * 1 // S(u=1,v=0)
      val v = math.round(s / 4).toInt + 128
      math.max(0, math.min(255, v)).toByte
    }
    assert(java.util.Arrays.equals(img.pixels, expected))
  }

  test("JPEG baseline: 4:2:0 color decodes to uniform RGB MCUs " +
      "(subsampled-chroma upsampling + YCbCr conversion)") {
    val mcus = Array((90, 100, 200), (200, 60, 40), (0, 128, 128),
      (255, 255, 0), (128, 0, 255), (17, 211, 99))
    val blob = jpegB.encodeColor420DcOnly(mcus, mcusPerRow = 3)
    val img = jpegB.decode(blob)
    assert(img.width == 48 && img.height == 32 && img.nComponents == 3)
    for (y <- 0 until 32; x <- 0 until 48) {
      val (yy, cb, cr) = mcus((y / 16) * 3 + (x / 16))
      val (r, g, b) = graft.ops.JpegBaseline.yccToRgb(yy, cb, cr)
      val o = (y * 48 + x) * 3
      assert((img.pixels(o) & 0xff) == r && (img.pixels(o + 1) & 0xff) == g
        && (img.pixels(o + 2) & 0xff) == b,
        s"pixel ($x,$y) expected ($r,$g,$b) from MCU ${(yy, cb, cr)}")
    }
  }

  test("JPEG baseline: progressive/non-baseline frames reject loudly") {
    val meta = new Multimodal.JpegCodec
    val prog = meta.encode("zz".getBytes("US-ASCII"), 16, 16,
      nComponents = 1, progressive = true)
    val e = intercept[IllegalArgumentException](jpegB.decode(prog))
    assert(e.getMessage.contains("SOF"), e.getMessage)
  }

  test("JPEG baseline: malformed segment length < 2 rejects cleanly") {
    // a foreign/corrupt APPn declaring length 0 or 1 must hit the
    // loud-reject convention, not advance INSIDE the segment and die on
    // a raw bounds error or an 'expected marker' misdiagnosis
    for (len <- Seq(0, 1)) {
      val blob = Array(0xff, 0xd8, 0xff, 0xe5, len >> 8, len & 0xff,
        0x41, 0x42).map(_.toByte)
      val e = intercept[IllegalArgumentException](jpegB.decode(blob))
      assert(e.getMessage.contains(s"length $len < 2"), e.getMessage)
    }
  }

  test("x80 aHash: identity, near-dup sensitivity, empty-doc exclusion, " +
      "blocked pairs ≡ brute-force hamming") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sigs = Multimodal.imageAHashSigs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // empty docs carry no image: excluded from the signature frame
    val emptyIds = graft.Tables.documents(spark, sf)
      .filter(length(encode($"text", "UTF-8")) === 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(emptyIds.forall(id => !sigs.contains(id)))
    assert(sigs.nonEmpty)
    // the blocked engine pairs ≡ brute-force hamming over the sigs
    // (structural under the pigeonhole radius — this is the gate that
    // catches a band-extraction bug the oracle's quadratic form hides)
    val got = Multimodal.imageAHashPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = cappedBruteForce(sigs)
    assert(got == brute,
      s"blocked pairs != capped reference: missing=${(brute -- got).take(3)} " +
        s"extra=${(got -- brute).take(3)}")
    // non-degenerate on this corpus: grid-identical docs pair at
    // hamming 0 (no byte-identical texts exist at this sf — these are
    // hash-level collisions, the aHash family's designed coarseness)
    assert(got.exists(_._3 == 0), "no hamming-0 pair in the fixture")
    // the cap has TEETH at this sf: at least one uncapped pair is
    // dropped, or the cap-binding claim in the scaladoc is stale
    val uncapped = (for {
      a <- sigs.keysIterator; b <- sigs.keysIterator if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if d <= Multimodal.AHashHamMax
    } yield (a, b, d)).toSet
    assert(brute.subsetOf(uncapped) && brute.size < uncapped.size,
      s"cap dropped nothing at fixture scale (${brute.size} of " +
        s"${uncapped.size}) — the gate no longer exercises it")
  }

  /** Driver-side reference for the CAPPED banded semantics: pairs
    * sharing ≥ 1 band whose document frequency ≤ the cap, at hamming ≤
    * the radius — the same function [[Dedup.hamming64BlockedPairs]]
    * computes, written the pedestrian way. */
  private def cappedBruteForce(
      sigs: Map[Long, Long]): Set[(Long, Long, Int)] = {
    val bands = scala.collection.mutable.Map.empty[(Int, Int), List[Long]]
    for ((d, s) <- sigs; c <- 0 until 8) {
      val cv = ((s >>> (8 * c)) & 0xFF).toInt
      bands((c, cv)) = d :: bands.getOrElse((c, cv), Nil)
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    for ((_, members) <- bands if members.size <= Multimodal.AHashBandDfCap) {
      val m = members.toArray
      for (i <- m.indices; j <- i + 1 until m.length) {
        val (a, b) = (math.min(m(i), m(j)), math.max(m(i), m(j)))
        val d = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
        if (d <= Multimodal.AHashHamMax) out += ((a, b, d))
      }
    }
    out.toSet
  }

  test("x81 audio fingerprint: blocked pairs ≡ brute-force hamming; " +
      "sub-sample docs excluded; planted dups at hamming 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sigs = Multimodal.audioFingerprintSigs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val shortIds = graft.Tables.documents(spark, sf)
      .filter(length(encode($"text", "UTF-8")) === 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(shortIds.forall(id => !sigs.contains(id)))
    assert(sigs.nonEmpty)
    val got = Multimodal.audioFingerprintPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = cappedBruteForce(sigs)
    assert(got == brute,
      s"blocked pairs != capped reference: missing=${(brute -- got).take(3)} " +
        s"extra=${(got -- brute).take(3)}")
    // non-degenerate on this corpus: grid-identical docs exist (hamming
    // 0) and the fixture's near-dup texts land within the radius
    assert(got.exists(_._3 == 0), "no hamming-0 pair in the fixture")
  }

  test("AVI mjpgFrames: MJPG chunks surface as-is; other handlers Left") {
    val payload = (0 until 30).map(_.toByte).toArray
    val jpeg = jpegB.encodeGrayDcOnly(payload, 2)
    val blob = aviCodec.encodeVideoFrames(jpeg, 16, 24, "MJPG",
      codedHeight = 8 * 15)
    val frames = aviCodec.mjpgFrames(blob)
      .getOrElse(fail("MJPG stream rejected"))
    assert(frames.length == 1)
    assert(java.util.Arrays.equals(frames.head, jpeg),
      "movi chunk must carry the JPEG bytes unmodified")
    // the declared strf geometry matches the JPEG's own SOF0 geometry
    val m = aviCodec.decode(blob)
    val img = jpegB.decode(frames.head)
    assert((m.width, m.height) == (img.width, img.height))
    assert(aviCodec.mjpgFrames(
      aviCodec.encodeVideoFrames(payload, 16, 24, "I420")) == Left("I420"))
  }
}
