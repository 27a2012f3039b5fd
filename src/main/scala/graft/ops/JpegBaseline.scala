package graft.ops

/** A real baseline-sequential JPEG codec (ITU-T T.81): Huffman entropy
  * coding, dequantization, 2-D IDCT, chroma upsampling and JFIF
  * YCbCr→RGB — the decode path [[Multimodal.frameSample]] (x41) runs
  * over MJPG movi chunks, retiring the engine's last NULL path (the
  * `rejected:MJPG` rows). The implementation is the public spec's
  * textbook shape, self-contained on purpose (no javax.imageio — the
  * decode must be a real per-partition codec the plans can account
  * for, and the spec pins it against hand-assembled bitstreams it did
  * not produce).
  *
  * Scope: baseline DCT (SOF0), 8-bit precision, 1 or 3 components,
  * sampling factors 1-2, one interleaved scan, restart intervals.
  * Progressive (SOF2), arithmetic coding and 12-bit precision are
  * rejected loudly — x64's metadata walk classifies those without
  * decoding, which remains the honest split.
  *
  * The encoder writes DC-only blocks (every AC coefficient zero, EOB
  * immediately after the DC code) with DC quantizer 8, so a block
  * whose stored level is v−128 reconstructs to the EXACT uniform value
  * v: S00 = (v−128)·8 and IDCT(S00-only) = S00/8 — integer, no
  * rounding. That is what keeps x41's DuckDB oracle closed-form while
  * the bitstream, the Huffman tables, the byte stuffing, the restart
  * markers and the full 64-coefficient IDCT in the DECODER stay
  * completely general (MultimodalSpec drives the decoder over
  * hand-built streams with nonzero AC coefficients and over 4:2:0
  * color MCUs to prove that).
  */
object JpegBaseline {
  /** T.81 Annex K.3 typical Huffman tables: (bits per code length
    * 1..16, values). Public-spec constants. */
  val DcLumBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcLumVals: Array[Int] = (0 to 11).toArray
  val DcChrBits: Array[Int] =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  val DcChrVals: Array[Int] = (0 to 11).toArray
  val AcLumBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  val AcChrBits: Array[Int] =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  val AcChrVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Zig-zag scan order (T.81 Figure A.6): zigzag index → natural
    * row-major index. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman code assignment (T.81 C.2): for (bits, vals),
    * the i-th value (in table order) gets the i-th code of its length
    * class, codes increasing, shifting left at each length step. */
  final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    require(bits.length == 16 && bits.sum == vals.length,
      s"bits/vals mismatch: ${bits.sum} codes, ${vals.length} values")
    /** code and length per value index, encoder side. */
    val codeOf = new Array[Int](vals.length)
    val lenOf = new Array[Int](vals.length)
    /** decoder side: T.81 F.16 mincode/maxcode/valptr per length. */
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (l <- 1 to 16) {
        valPtr(l) = k
        minCode(l) = code
        for (_ <- 0 until bits(l - 1)) {
          codeOf(k) = code; lenOf(k) = l; code += 1; k += 1
        }
        maxCode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1
      }
    }
    /** value-index lookup by value byte (encoder side). */
    private val idxOf: Map[Int, Int] = vals.zipWithIndex.toMap
    def encodeSym(v: Int): (Int, Int) = {
      val i = idxOf.getOrElse(v,
        throw new IllegalArgumentException(s"symbol $v not in table"))
      (codeOf(i), lenOf(i))
    }
    /** DHT segment body for this table: Tc/Th nibble byte + bits + vals. */
    def dhtBody(tc: Int, th: Int): Array[Byte] =
      Array(((tc << 4) | th).toByte) ++ bits.map(_.toByte) ++
        vals.map(_.toByte)
  }

  val DcLum = new HuffTable(DcLumBits, DcLumVals)
  val AcLum = new HuffTable(AcLumBits, AcLumVals)
  val DcChr = new HuffTable(DcChrBits, DcChrVals)
  val AcChr = new HuffTable(AcChrBits, AcChrVals)

  /** JFIF YCbCr→RGB, the formula every baseline decoder applies;
    * shared so the spec's expectation and the decoder cannot drift. */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(d: Double): Int = math.max(0, math.min(255, math.round(d).toInt))
    (cl(y + 1.402 * (cr - 128)),
      cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
      cl(y + 1.772 * (cb - 128)))
  }
}

/** Decoded baseline image: `pixels` is row-major, 1 byte/px for
  * grayscale, 3 bytes/px interleaved RGB for color. */
final case class JpegImage(width: Int, height: Int, nComponents: Int,
    pixels: Array[Byte])

final class JpegBaselineCodec {
  import JpegBaseline._

  // ------------------------------------------------------------ writer

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** pad the current byte with 1-bits (B.1.1.5) — does NOT stuff a
      * pad byte that lands on 0xFF? It does: a padded 0xFF is still a
      * data byte and must be stuffed like any other. */
    def align(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
    /** a raw marker byte pair, written byte-aligned (RSTn). */
    def marker(m: Int): Unit = { align(); out.write(0xff); out.write(m) }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** amplitude bits for a value in category `cat` (T.81 F.1.2.1
    * EXTEND's inverse): non-negative values code as-is, negative ones
    * as value − 1 in `cat` low bits. */
  private def ampBits(v: Int, cat: Int): Int =
    if (v >= 0) v else v - 1 + (1 << cat)

  private def category(v: Int): Int = {
    var cat = 0; var a = math.abs(v)
    while (a != 0) { cat += 1; a >>= 1 }
    cat
  }

  private def seg(marker: Int, body: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      ((body.length + 2) >> 8).toByte, ((body.length + 2) & 0xff).toByte) ++
      body

  /** Quant table: DC quantizer 8 (the exactness pivot — see object
    * doc), every AC quantizer 16 (arbitrary: the encoder stores no AC
    * coefficients, but a table must be fully valid for any decoder). */
  private def qtBody(tq: Int): Array[Byte] =
    Array(tq.toByte) ++ (8 +: Array.fill(63)(16)).map(_.toByte)

  private def sof0(width: Int, height: Int,
      comps: Seq[(Int, Int, Int)]): Array[Byte] = {
    // comps: (id, sampling hv byte, tq)
    require(width > 0 && width <= 65535 && height > 0 && height <= 65535,
      s"bad geometry ${width}x$height")
    Array(8.toByte,
      (height >> 8).toByte, (height & 0xff).toByte,
      (width >> 8).toByte, (width & 0xff).toByte,
      comps.length.toByte) ++
      comps.flatMap { case (id, hv, tq) =>
        Seq(id.toByte, hv.toByte, tq.toByte) }
  }

  private def sosBody(comps: Seq[(Int, Int)]): Array[Byte] =
    // comps: (id, TdTa byte)
    Array(comps.length.toByte) ++
      comps.flatMap { case (id, tdta) => Seq(id.toByte, tdta.toByte) } ++
      Array[Byte](0, 63, 0)

  /** One grayscale block per payload byte, `blocksPerRow` blocks per
    * MCU row: a W=8·N × H=8·M image (M = ceil(len/N), short final row
    * padded with value-0 blocks) that decodes back to each payload
    * byte as a uniform 8×8 block — the exactness contract x41's oracle
    * replays. `restartInterval` > 0 emits a DRI segment and real RSTn
    * markers (DC predictor reset included) every that many MCUs. */
  def encodeGrayDcOnly(payload: Array[Byte], blocksPerRow: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(blocksPerRow > 0, "blocksPerRow must be positive")
    val n = blocksPerRow
    val m = math.max(1, (payload.length + n - 1) / n)
    require(8 * m <= 65535, s"payload ${payload.length} exceeds JPEG height")
    val bw = new BitWriter
    var pred = 0
    var sinceRestart = 0; var rst = 0
    for (b <- 0 until n * m) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        bw.marker(0xd0 + rst); rst = (rst + 1) % 8
        pred = 0; sinceRestart = 0
      }
      val v = if (b < payload.length) payload(b) & 0xff else 0
      val dc = v - 128
      val diff = dc - pred; pred = dc
      val cat = category(diff)
      val (c, l) = DcLum.encodeSym(cat)
      bw.put(c, l)
      if (cat > 0) bw.put(ampBits(diff, cat), cat)
      val (ec, el) = AcLum.encodeSym(0x00) // EOB: every AC is zero
      bw.put(ec, el)
      sinceRestart += 1
    }
    val dri = if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8).toByte,
        (restartInterval & 0xff).toByte))
    else Array.emptyByteArray
    Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xdb, qtBody(0)) ++
      seg(0xc0, sof0(8 * n, 8 * m, Seq((1, 0x11, 0)))) ++
      seg(0xc4, DcLum.dhtBody(0, 0)) ++ seg(0xc4, AcLum.dhtBody(1, 0)) ++
      dri ++
      seg(0xda, sosBody(Seq((1, 0x00)))) ++
      bw.bytes ++ Array(0xff.toByte, 0xd9.toByte)
  }

  /** A 4:2:0 color image of uniform 16×16 MCUs: per MCU one (Y,Cb,Cr)
    * triple, four DC-only Y blocks + one Cb + one Cr block — the spec
    * fixture for subsampled-chroma upsampling and color conversion
    * (decoded RGB is uniform per MCU at yccToRgb(y,cb,cr) exactly). */
  def encodeColor420DcOnly(mcus: Array[(Int, Int, Int)],
      mcusPerRow: Int): Array[Byte] = {
    require(mcusPerRow > 0 && mcus.nonEmpty &&
      mcus.length % mcusPerRow == 0, "mcus must fill complete rows")
    mcus.foreach { case (y, cb, cr) =>
      require(y >= 0 && y <= 255 && cb >= 0 && cb <= 255 &&
        cr >= 0 && cr <= 255, "samples must be bytes") }
    val rows = mcus.length / mcusPerRow
    val bw = new BitWriter
    var predY = 0; var predCb = 0; var predCr = 0
    def putDc(t: HuffTable, diff: Int): Unit = {
      val cat = category(diff)
      val (c, l) = t.encodeSym(cat)
      bw.put(c, l)
      if (cat > 0) bw.put(ampBits(diff, cat), cat)
    }
    def eob(t: HuffTable): Unit = {
      val (c, l) = t.encodeSym(0x00); bw.put(c, l)
    }
    mcus.foreach { case (y, cb, cr) =>
      for (_ <- 0 until 4) { // four Y blocks, all the same level
        putDc(DcLum, (y - 128) - predY); predY = y - 128; eob(AcLum)
      }
      putDc(DcChr, (cb - 128) - predCb); predCb = cb - 128; eob(AcChr)
      putDc(DcChr, (cr - 128) - predCr); predCr = cr - 128; eob(AcChr)
    }
    Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xdb, qtBody(0)) ++ seg(0xdb, qtBody(1)) ++
      seg(0xc0, sof0(16 * mcusPerRow, 16 * rows,
        Seq((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)))) ++
      seg(0xc4, DcLum.dhtBody(0, 0)) ++ seg(0xc4, AcLum.dhtBody(1, 0)) ++
      seg(0xc4, DcChr.dhtBody(0, 1)) ++ seg(0xc4, AcChr.dhtBody(1, 1)) ++
      seg(0xda, sosBody(Seq((1, 0x00), (2, 0x11), (3, 0x11)))) ++
      bw.bytes ++ Array(0xff.toByte, 0xd9.toByte)
  }

  // ------------------------------------------------------------ reader

  private final class BitReader(blob: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    /** next entropy bit; un-stuffs FF00; a bare marker here is a
      * malformed stream (RSTn are consumed by [[restart]], EOI must
      * only follow complete MCU data). */
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < blob.length, "entropy data truncated")
        var b = blob(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < blob.length, "entropy data truncated at FF")
          val m = blob(pos) & 0xff; pos += 1
          require(m == 0x00,
            f"marker FF$m%02X inside entropy-coded segment")
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** consume an expected RSTn marker (byte-aligned). */
    def restart(expected: Int): Unit = {
      nbits = 0 // discard pad bits to the byte boundary
      require(pos + 2 <= blob.length, "truncated at restart")
      require((blob(pos) & 0xff) == 0xff &&
        (blob(pos + 1) & 0xff) == 0xd0 + expected,
        f"expected RST$expected at $pos, got " +
          f"${blob(pos) & 0xff}%02X${blob(pos + 1) & 0xff}%02X")
      pos += 2
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit(); var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit(); l += 1
      }
      require(l <= 16, "invalid Huffman code (no 16-bit match)")
      t.vals(t.valPtr(l) + code - t.minCode(l))
    }
    /** T.81 F.2.2.1 EXTEND. */
    def receiveExtend(cat: Int): Int = {
      if (cat == 0) return 0
      val v = bits(cat)
      if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v
    }
  }

  /** exact 2-D IDCT (T.81 A.3.3) — O(64²) per block, double precision,
    * rounded to the nearest integer and level-shifted. Not the fast
    * factorized form on purpose: this is the REFERENCE transform the
    * spec formula states, and the fixture blocks are DC-heavy (cheap
    * either way at corpus scale — the probe measures it). */
  private val cosTab: Array[Double] =
    Array.tabulate(8, 8) { (x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16)
    }.flatten
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 0.70710678118654752 else 1.0
              val cv = if (v == 0) 0.70710678118654752 else 1.0
              s += cu * cv * c * cosTab(x * 8 + u) * cosTab(y * 8 + v)
            }
            v += 1
          }
          u += 1
        }
        val px = math.round(s / 4).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, px))
        x += 1
      }
      y += 1
    }
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Full baseline decode. See object doc for scope. */
  def decode(blob: Array[Byte]): JpegImage = {
    require(blob.length >= 4 && blob(0) == 0xff.toByte &&
      blob(1) == 0xd8.toByte, "not a JPEG (no SOI)")
    var pos = 2
    def u8(i: Int) = blob(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4); val acT = new Array[HuffTable](4)
    var width = -1; var height = -1
    var comps: Seq[Comp] = Seq.empty
    var dri = 0
    var scanAt = -1
    var scanComps: Seq[(Comp, HuffTable, HuffTable)] = Seq.empty
    while (scanAt < 0) {
      require(pos + 2 <= blob.length, "truncated before SOS")
      require(u8(pos) == 0xff, f"expected marker at $pos")
      var m = u8(pos + 1); pos += 2
      while (m == 0xff) { m = u8(pos); pos += 1 } // fill bytes (B.1.1.2)
      m match {
        case 0xc0 => // SOF0 baseline
          val len = u16(pos)
          require(u8(pos + 2) == 8, "only 8-bit precision is baseline")
          height = u16(pos + 3); width = u16(pos + 5)
          val nc = u8(pos + 7)
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          require(len == 8 + 3 * nc, "SOF0 length mismatch")
          comps = (0 until nc).map { i =>
            val o = pos + 8 + 3 * i
            val c = Comp(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0xf, u8(o + 2))
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"unsupported sampling ${c.h}x${c.v}")
            c
          }
          pos += len
        case 0xc2 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException(
            f"SOF$m%02X is not baseline sequential — metadata-only (x64)")
        case 0xc4 => // DHT (possibly several tables in one segment)
          val len = u16(pos); var o = pos + 2
          while (o < pos + len) {
            val tc = u8(o) >> 4; val th = u8(o) & 0xf
            require(tc <= 1 && th <= 3, s"bad DHT id $tc/$th")
            val bits = Array.tabulate(16)(i => u8(o + 1 + i))
            val nv = bits.sum
            val vals = Array.tabulate(nv)(i => u8(o + 17 + i))
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            o += 17 + nv
          }
          pos += len
        case 0xdb => // DQT (8- or 16-bit entries)
          val len = u16(pos); var o = pos + 2
          while (o < pos + len) {
            val pq = u8(o) >> 4; val tq = u8(o) & 0xf
            require(pq <= 1 && tq <= 3, s"bad DQT id $pq/$tq")
            qt(tq) = Array.tabulate(64) { i =>
              if (pq == 0) u8(o + 1 + i) else u16(o + 1 + 2 * i)
            }
            o += 1 + (if (pq == 0) 64 else 128)
          }
          pos += len
        case 0xdd => // DRI
          require(u16(pos) == 4, "bad DRI length")
          dri = u16(pos + 2); pos += 4
        case 0xda => // SOS
          require(width > 0, "SOS before SOF0")
          val len = u16(pos)
          val ns = u8(pos + 2)
          require(ns == comps.length,
            s"non-interleaved scans unsupported ($ns of ${comps.length})")
          scanComps = (0 until ns).map { i =>
            val o = pos + 3 + 2 * i
            val c = comps.find(_.id == u8(o)).getOrElse(
              throw new IllegalArgumentException(s"scan names unknown comp ${u8(o)}"))
            val td = u8(o + 1) >> 4; val ta = u8(o + 1) & 0xf
            require(dcT(td) != null && acT(ta) != null,
              s"scan references undefined Huffman table $td/$ta")
            (c, dcT(td), acT(ta))
          }
          scanAt = pos + len
        case 0xd9 =>
          throw new IllegalArgumentException("EOI before any scan")
        case _ => // APPn / COM / anything else: skip by declared length
          // the declared length includes its own 2 bytes (B.1.1.4); a
          // malformed length < 2 would leave pos INSIDE the segment and
          // surface later as a raw bounds error or a confusing
          // 'expected marker' — reject loudly here like every other arm
          val len = u16(pos)
          require(len >= 2, f"segment FF$m%02X declares length $len < 2")
          pos += len
      }
    }
    comps.foreach(c => require(qt(c.tq) != null,
      s"component ${c.id} references undefined quant table ${c.tq}"))

    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component plane at its own sampling resolution, MCU-padded
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray

    val br = new BitReader(blob, scanAt)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    var mcu = 0; var sinceRestart = 0; var rst = 0
    while (mcu < mcusX.toLong * mcusY) {
      if (dri > 0 && sinceRestart == dri) {
        br.restart(rst); rst = (rst + 1) % 8
        java.util.Arrays.fill(pred, 0); sinceRestart = 0
      }
      val my = (mcu / mcusX).toInt; val mx = (mcu % mcusX).toInt
      var ci = 0
      while (ci < scanComps.length) {
        val (c, dct, act) = scanComps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val cat = br.decodeHuff(dct)
            require(cat <= 11, s"bad DC category $cat")
            pred(ci) += br.receiveExtend(cat)
            coef(0) = pred(ci) * q(0)
            var k = 1
            while (k < 64) {
              val rs = br.decodeHuff(act)
              val r = rs >> 4; val s = rs & 0xf
              if (s == 0) {
                if (rs == 0xf0) k += 16 // ZRL: sixteen zeros
                else k = 64             // EOB
              } else {
                k += r
                require(k < 64, "AC run overruns block")
                coef(Zigzag(k)) = br.receiveExtend(s) * q(k)
                k += 1
              }
            }
            idctBlock(coef, px)
            val x0 = (mx * c.h + bx) * 8; val y0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((y0 + yy) * pw + x0 + xx) =
                  px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      sinceRestart += 1
      mcu += 1
    }

    if (comps.length == 1) {
      val pw = planeW(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
      JpegImage(width, height, 1, out)
    } else {
      // nearest-neighbor chroma upsampling (the JFIF default shape),
      // then YCbCr→RGB per pixel
      val out = new Array[Byte](width * height * 3)
      val cY = comps(0); val cCb = comps(1); val cCr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(i: Int, c: Comp): Int = {
            val sx = x * c.h / hmax; val sy = y * c.v / vmax
            planes(i)(sy * planeW(i) + sx) & 0xff
          }
          val (r, g, b) = yccToRgb(
            sample(0, cY), sample(1, cCb), sample(2, cCr))
          val o = (y * width + x) * 3
          out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      JpegImage(width, height, 3, out)
    }
  }
}
