package graft.ops

/** Baseline JPEG (ITU-T T.81) codec, pure JVM, both directions.
  *
  * Scope — the baseline sequential profile a curation pipeline actually
  * meets in bulk web data: SOF0/SOF1 Huffman DCT, 8-bit samples, 1 or 3
  * components, sampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0), JFIF YCbCr,
  * DRI/RSTn restart intervals, stuffed-byte entropy streams. Everything
  * else (progressive SOF2, arithmetic coding, 12-bit, hierarchical,
  * fractional sampling ratios) returns None and falls through to the
  * caller's next decoder (javax.imageio in Multimodal.decodePixelsOne) —
  * on a 100 TB corpus an unsupported profile must degrade, not throw.
  *
  * Mirrors the reference's posture of doing real work on binary columns
  * (peskas.malawi.data.pipeline R/export.R:18-60 treats tracks as opaque
  * typed payloads); the codec itself is implemented from the public
  * T.81 spec (quantization + Huffman table data from Annex K, marker
  * structure from §B, decode procedures from §F.2).
  *
  * Determinism contract (the gate relies on it): the decoder's IDCT is
  * double-precision and block-constant fixtures quantize to DC-only
  * coefficients, so their decode is integer-exact end to end; the
  * YCbCr→RGB conversion uses floor(x + 0.5) with the JFIF constants
  * 1.402 / 0.344136 / 0.714136 / 1.772 in a fixed expression order, so
  * DuckDB reproduces it bit-for-bit with FLOOR over the same doubles.
  */
object Jpeg {

  // zigzag scan order (T.81 Figure A.6): k-th scanned coefficient's
  // position in the natural row-major 8×8 block
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 Annex K.1 luminance quantization table, natural order. */
  val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** T.81 Annex K.2 chrominance quantization table, natural order. */
  val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Fixture quantization table: DC step 8, AC step 16. A block-constant
    * 8×8 tile has FDCT coefficients DC = 8·(v−128) (± double rounding)
    * and AC ≈ 0, so with a DC step of 8 the quantized DC is exactly
    * v−128 and decode is LOSSLESS — the property the q_mm_jpeg_pixels
    * oracle needs to recompute pixels in closed form.
    */
  val FlatQuant: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  // Standard Huffman table specs (T.81 Annex K.3): (bits(1..16), values).
  private val DcLumaSpec: (Array[Int], Array[Int]) =
    (Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
      (0 to 11).toArray)
  private val DcChromaSpec: (Array[Int], Array[Int]) =
    (Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
      (0 to 11).toArray)
  private val AcLumaSpec: (Array[Int], Array[Int]) =
    (Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d), Array(
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
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val AcChromaSpec: (Array[Int], Array[Int]) =
    (Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77), Array(
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
      0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  // DCT basis M(u,x) = 0.5·C(u)·cos((2x+1)uπ/16): FDCT S = M f Mᵀ,
  // IDCT f = Mᵀ S M — the exact T.81 A.3.3 scaling, double precision
  private val Basis: Array[Double] = {
    val m = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        m(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    m
  }

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing (B.1.1.5)
        nbits -= 8
      }
    }
    // pad the final partial byte with 1-bits (B.1.1.5)
    def flush(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  /** Canonical Huffman codes from a (bits, values) spec: value → (code,
    * length). Canonical assignment per T.81 C.2: codes of each length in
    * value order, starting from (prev + 1) << 1.
    */
  private def huffCodes(spec: (Array[Int], Array[Int])): Array[(Int, Int)] = {
    val (bits, vals) = spec
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        codes(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  private def bitSize(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def fdctQuant(block: Array[Double], qt: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) { // rows: tmp = M f
      var x = 0
      while (x < 8) {
        var s = 0.0; var k = 0
        while (k < 8) { s += Basis(u * 8 + k) * block(k * 8 + x); k += 1 }
        tmp(u * 8 + x) = s; x += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) { // cols: S = tmp Mᵀ
      var uu = 0
      while (uu < 8) {
        var s = 0.0; var k = 0
        while (k < 8) { s += tmp(uu * 8 + k) * Basis(v * 8 + k); k += 1 }
        out(uu * 8 + v) = math.round(s / qt(uu * 8 + v)).toInt
        uu += 1
      }
      v += 1
    }
    out
  }

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
                       body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(body, 0, body.length)
  }

  /** Encode interleaved row-major pixels (1 = grayscale, 3 = RGB) as a
    * baseline JFIF JPEG, 4:4:4 (no subsampling), standard Huffman tables,
    * caller-chosen quantization tables ([[StdLumaQuant]] for realistic
    * lossy output; [[FlatQuant]] for the lossless-by-construction
    * block-constant fixtures). `restartInterval` > 0 emits DRI + RSTn
    * markers every that many MCUs (resynchronization points a real
    * encoder inserts so bit corruption can't cascade past a marker) —
    * and gives the decoder's restart path a same-codec exercise.
    */
  def encode(px: Array[Byte], w: Int, h: Int, ch: Int,
             lumaQ: Array[Int] = StdLumaQuant,
             chromaQ: Array[Int] = StdChromaQuant,
             restartInterval: Int = 0): Array[Byte] = {
    require(ch == 1 || ch == 3, s"channels must be 1 or 3, got $ch")
    require(px.length == w * h * ch, "pixel buffer size mismatch")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeSeg(out, 0xe0, Array[Byte]( // APP0 JFIF 1.1, no thumbnail
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(id: Int, qt: Array[Int]): Unit =
      writeSeg(out, 0xdb,
        (id.toByte +: Array.tabulate(64)(k => qt(Zigzag(k)).toByte)))
    dqt(0, lumaQ)
    if (ch == 3) dqt(1, chromaQ)
    // SOF0: 8-bit precision, all sampling factors 1 (4:4:4)
    val sofBody = new Array[Byte](6 + 3 * ch)
    sofBody(0) = 8
    sofBody(1) = ((h >> 8) & 0xff).toByte; sofBody(2) = (h & 0xff).toByte
    sofBody(3) = ((w >> 8) & 0xff).toByte; sofBody(4) = (w & 0xff).toByte
    sofBody(5) = ch.toByte
    var c = 0
    while (c < ch) {
      sofBody(6 + 3 * c) = (c + 1).toByte       // component id
      sofBody(7 + 3 * c) = 0x11.toByte          // h=1, v=1
      sofBody(8 + 3 * c) = (if (c == 0) 0 else 1).toByte // quant table
      c += 1
    }
    writeSeg(out, 0xc0, sofBody)
    def dht(clazz: Int, id: Int, spec: (Array[Int], Array[Int])): Unit =
      writeSeg(out, 0xc4,
        ((clazz << 4 | id).toByte
          +: (1 to 16).map(l => spec._1(l).toByte).toArray)
          ++ spec._2.map(_.toByte))
    dht(0, 0, DcLumaSpec); dht(1, 0, AcLumaSpec)
    if (ch == 3) { dht(0, 1, DcChromaSpec); dht(1, 1, AcChromaSpec) }
    if (restartInterval > 0)
      writeSeg(out, 0xdd, Array[Byte]( // DRI (B.2.4.4)
        ((restartInterval >> 8) & 0xff).toByte, (restartInterval & 0xff).toByte))
    // SOS: every component in one interleaved scan
    val sosBody = new Array[Byte](1 + 2 * ch + 3)
    sosBody(0) = ch.toByte
    c = 0
    while (c < ch) {
      sosBody(1 + 2 * c) = (c + 1).toByte
      sosBody(2 + 2 * c) = (if (c == 0) 0x00 else 0x11).toByte
      c += 1
    }
    sosBody(1 + 2 * ch) = 0; sosBody(2 + 2 * ch) = 63; sosBody(3 + 2 * ch) = 0
    writeSeg(out, 0xda, sosBody)

    val dcCodes = Array(huffCodes(DcLumaSpec), huffCodes(DcChromaSpec))
    val acCodes = Array(huffCodes(AcLumaSpec), huffCodes(AcChromaSpec))
    val bw = new BitWriter(out)
    val pred = new Array[Int](ch)
    val block = new Array[Double](64)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var mcuIdx = 0
    var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          // restart boundary (E.1.4): pad to a byte, emit RST(n mod 8),
          // reset every DC predictor
          bw.flush()
          out.write(0xff); out.write(0xd0 + (rstN % 8))
          rstN += 1
          java.util.Arrays.fill(pred, 0)
        }
        mcuIdx += 1
        c = 0
        while (c < ch) {
          // level-shifted block, edge-replicated past the image border
          var y = 0
          while (y < 8) {
            val sy = math.min(h - 1, my * 8 + y)
            var x = 0
            while (x < 8) {
              val sx = math.min(w - 1, mx * 8 + x)
              block(y * 8 + x) = (px((sy * w + sx) * ch + c) & 0xff) - 128.0
              x += 1
            }
            y += 1
          }
          val q = fdctQuant(block, if (c == 0) lumaQ else chromaQ)
          val t = if (c == 0) 0 else 1
          // DC: category code + offset bits (F.1.2.1)
          val diff = q(0) - pred(c); pred(c) = q(0)
          val s = bitSize(diff)
          val (dcode, dlen) = dcCodes(t)(s)
          bw.put(dcode, dlen)
          if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
          // AC: run-length of zeros in zigzag order (F.1.2.2)
          var run = 0
          var k = 1
          while (k < 64) {
            val v = q(Zigzag(k))
            if (v == 0) run += 1
            else {
              while (run >= 16) { val (zc, zl) = acCodes(t)(0xf0); bw.put(zc, zl); run -= 16 }
              val ss = bitSize(v)
              val (acode, alen) = acCodes(t)(run << 4 | ss)
              bw.put(acode, alen)
              bw.put(if (v < 0) v + (1 << ss) - 1 else v, ss)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acCodes(t)(0x00); bw.put(ec, el) } // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Canonical Huffman decode tables (F.2.2.3): per code length the
    * smallest/largest code and the index of its first value.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k; minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
    def value(i: Int): Int = vals(i)
  }

  /** Entropy-stream bit reader with 0xFF00 unstuffing. A non-RST marker
    * ends the stream (reads then return 0 bits — the caller's MCU loop
    * is already bounded, so this only pads a truncated tail). */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = 0 // the marker byte that ended the stream, if any
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) return 0
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val nxt = if (pos < p.length) p(pos) & 0xff else 0xd9
          if (nxt == 0x00) { pos += 1 }
          else { hitMarker = nxt; return 0 } // marker: stream over
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Skip to the RSTn marker the encoder placed at a restart boundary
      * and resynchronize after it. */
    def restart(): Unit = {
      nbits = 0
      if (hitMarker >= 0xd0 && hitMarker <= 0xd7) { hitMarker = 0; pos += 1; return }
      while (pos + 1 < p.length) {
        if ((p(pos) & 0xff) == 0xff) {
          val m = p(pos + 1) & 0xff
          if (m >= 0xd0 && m <= 0xd7) { pos += 2; return }
        }
        pos += 1
      }
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.value(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      -1 // corrupt stream; caller bails
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def idct(coef: Array[Int], qt: Array[Int], out: Array[Int]): Unit = {
    val deq = new Array[Double](64)
    var i = 0
    while (i < 64) { deq(i) = coef(i).toDouble * qt(i); i += 1 }
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) { // tmp = Mᵀ S  (rows of tmp indexed by spatial x)
      var v = 0
      while (v < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Basis(u * 8 + x) * deq(u * 8 + v); u += 1 }
        tmp(x * 8 + v) = s; v += 1
      }
      x += 1
    }
    x = 0
    while (x < 8) { // f = tmp M
      var y = 0
      while (y < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += tmp(x * 8 + v) * Basis(v * 8 + y); v += 1 }
        val px = math.floor(s + 128.5).toInt // round(s + 128)
        out(x * 8 + y) = if (px < 0) 0 else if (px > 255) 255 else px
        y += 1
      }
      x += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab = 0
    var acTab = 0
  }

  /** Decode a baseline JPEG to (width, height, channels, interleaved
    * row-major pixels); None for anything outside the supported profile
    * or structurally corrupt. Channels is 1 (grayscale source) or 3
    * (RGB after JFIF YCbCr conversion).
    */
  def decode(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    try decodeImpl(p) catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeImpl(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2
    def u16(o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    while (pos + 4 <= p.length) {
      if ((p(pos) & 0xff) != 0xff) return None
      val marker = p(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      if (marker == 0xff) { pos += 1 } // fill byte (B.1.1.2)
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // TEM / stray RSTn: standalone, no length field
      } else {
      val len = u16(pos + 2)
      val seg = pos + 4
      val segEnd = pos + 2 + len
      if (segEnd > p.length) return None
      marker match {
        case 0xc0 | 0xc1 => // SOF0/SOF1: baseline & extended-sequential Huffman
          if ((p(seg) & 0xff) != 8) return None // 8-bit only
          h = u16(seg + 1); w = u16(seg + 3)
          val nc = p(seg + 5) & 0xff
          if (w == 0 || h == 0 || (nc != 1 && nc != 3)) return None
          comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + 3 * i
            val hv = p(o + 1) & 0xff
            Component(p(o) & 0xff, hv >> 4, hv & 0xf, p(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2))
            return None // sampling factors 1–2 only
        case c if c >= 0xc2 && c <= 0xcf && c != 0xc4 && c != 0xc8 && c != 0xcc =>
          return None // progressive/arithmetic/lossless/hierarchical
        case 0xdb => // DQT: one or more tables
          var o = seg
          while (o < segEnd) {
            val pq = (p(o) & 0xff) >> 4
            val tq = p(o) & 0x0f
            val t = new Array[Int](64)
            var k = 0
            if (pq == 0) {
              while (k < 64) { t(Zigzag(k)) = p(o + 1 + k) & 0xff; k += 1 }
              o += 65
            } else {
              while (k < 64) { t(Zigzag(k)) = u16(o + 1 + 2 * k); k += 1 }
              o += 129
            }
            quant(tq) = t
          }
        case 0xc4 => // DHT: one or more tables
          var o = seg
          while (o < segEnd) {
            val tc = (p(o) & 0xff) >> 4
            val th = p(o) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = p(o + l) & 0xff; total += bits(l); l += 1 }
            val vals = Array.tabulate(total)(i => p(o + 17 + i) & 0xff)
            if (tc == 0) dcTabs(th) = new HuffTable(bits, vals)
            else acTabs(th) = new HuffTable(bits, vals)
            o += 17 + total
          }
        case 0xdd => restartInterval = u16(seg)
        case 0xda => // SOS: decode the (single, interleaved) scan
          if (comps == null) return None
          val ns = p(seg) & 0xff
          if (ns != comps.length) return None // multi-scan not supported
          var i = 0
          while (i < ns) {
            val cid = p(seg + 1 + 2 * i) & 0xff
            val tt = p(seg + 2 + 2 * i) & 0xff
            val comp = comps.find(_.id == cid).getOrElse(return None)
            comp.dcTab = tt >> 4; comp.acTab = tt & 0xf
            i += 1
          }
          return decodeScan(p, segEnd, comps, quant, dcTabs, acTabs, w, h,
            restartInterval)
        case _ => () // APPn / COM / DNL etc: skip
      }
      pos = segEnd
      }
    }
    None
  }

  private def decodeScan(p: Array[Byte], dataStart: Int, comps: Array[Component],
                         quant: Array[Array[Int]], dcTabs: Array[HuffTable],
                         acTabs: Array[HuffTable], w: Int, h: Int,
                         restartInterval: Int): Option[(Int, Int, Int, Array[Byte])] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    if (w.toLong * h * 3 > 64L * 1024 * 1024) return None // same guard as PNG path
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component plane, padded to whole blocks of the MCU grid
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(comps.length)(i => new Array[Int](planeW(i) * planeH(i)))
    comps.foreach { c =>
      if (quant(c.tq) == null || dcTabs(c.dcTab) == null || acTabs(c.acTab) == null)
        return None
    }
    val br = new BitReader(p, dataStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC (F.2.2.1)
            val s = br.decodeHuff(dcTabs(c.dcTab))
            if (s < 0 || s > 11) return None
            pred(ci) += extend(br.bits(s), s)
            coef(0) = pred(ci)
            // AC (F.2.2.2)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decodeHuff(acTabs(c.acTab))
              if (rs < 0) return None
              val r = rs >> 4
              val ss = rs & 0xf
              if (ss == 0) { if (r == 15) k += 16 else eob = true }
              else {
                k += r
                if (k > 63) return None
                coef(Zigzag(k)) = extend(br.bits(ss), ss)
                k += 1
              }
            }
            idct(coef, qt, block)
            val px0 = (my * c.v + by) * 8
            val px0x = (mx * c.h + bx) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((px0 + yy) * planeW(ci) + px0x + xx) = block(yy * 8 + xx)
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
      mcu += 1
    }
    // assemble: nearest-sample each component plane back to full res
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * planeW(0) + x).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, 1, out))
    } else {
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // nearest-neighbor chroma upsample: source sample (x·hi/hmax,
          // y·vi/vmax) — exact for 4:4:4, box-replicated for 4:2:x
          def samp(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / vmax) * planeW(ci) + (x * c.h / hmax))
          }
          val yv = samp(0).toDouble
          val cb = samp(1).toDouble
          val cr = samp(2).toDouble
          // JFIF conversion with floor(x+0.5); EXPRESSION ORDER IS LOAD-
          // BEARING: the q_mm_jpeg_pixels oracle evaluates the identical
          // double arithmetic in DuckDB and compares hashes
          def clamp(d: Double): Int = {
            val v = math.floor(d + 0.5).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val base = (y * w + x) * 3
          out(base) = clamp(yv + 1.402 * (cr - 128.0)).toByte
          out(base + 1) = clamp(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)).toByte
          out(base + 2) = clamp(yv + 1.772 * (cb - 128.0)).toByte
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    }
  }

  // ------------------------------------------------------------------
  // Deterministic fixture (the q_mm_jpeg_pixels gate corpus)
  // ------------------------------------------------------------------

  /** Per-block component value of the fixture image for doc `id`: every
    * 8×8 tile is CONSTANT, which makes the whole codec round-trip
    * integer-exact under [[FlatQuant]] (DC-only blocks, DC step 8 — see
    * the object scaladoc), so the DuckDB oracle recomputes every decoded
    * pixel from this closed form. Mixed id-dependence (`id % 50` group +
    * `id / 50` sweep) mirrors [[Multimodal.pngFixture]]'s structure.
    */
  private[ops] def fixtureBlockVal(id: Long, bx: Int, by: Int, comp: Int): Int = {
    val g = math.floorMod(id, 50L)
    math.floorMod(
      g * 37L + (id / 50L) * 31L + bx * (19L + 2L * g) + by * (29L + 2L * g) + comp * 41L,
      256L).toInt
  }

  /** Geometry of the fixture for doc `id`: (width, height, channels) —
    * 2–4 × 1–2 blocks of 8×8, grayscale for even groups, color for odd
    * (same parity rule as the PNG fixture).
    */
  private[ops] def fixtureGeometry(id: Long): (Int, Int, Int) = {
    val g = math.floorMod(id, 50L).toInt
    (8 * (2 + g % 3), 8 * (1 + g % 2), if (g % 2 == 0) 1 else 3)
  }

  /** The fixture JPEG payload: block-constant planes through the REAL
    * encoder (FDCT + Huffman + stuffing) under [[FlatQuant]]. For color
    * fixtures the constants are per-block (Y, Cb, Cr); the decoder's
    * JFIF conversion then produces the RGB closed form the oracle
    * mirrors with FLOOR arithmetic.
    */
  private[ops] def jpegFixture(id: Long): Array[Byte] = {
    val (w, h, ch) = fixtureGeometry(id)
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) = fixtureBlockVal(id, x / 8, y / 8, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encode(px, w, h, ch, FlatQuant, FlatQuant)
  }
}
