package graft.ops

/** GIF (87a/89a) codec, pure JVM, both directions.
  *
  * Scope — the whole still-image format: global and local color tables,
  * variable-width LSB-first LZW with dictionary growth to 4096 codes and
  * mid-stream CLEAR, interlaced and sequential row order, extension
  * blocks skipped by their sub-block chains, and a partial-image frame
  * (left/top offsets against the logical screen). Animation is out of
  * scope by design: the FIRST image frame is the decode result — the
  * standard curation-pipeline semantics for thumbnailing/fingerprinting
  * a GIF. Malformed streams (bad signature, truncated sub-blocks,
  * out-of-range codes, missing color table) return None, never throw.
  *
  * Mirrors the reference's posture of doing real work on binary columns
  * (peskas.malawi.data.pipeline R/export.R:18-60 treats tracks as opaque
  * typed payloads); the codec itself is implemented from the public
  * GIF89a specification (logical screen §18, image descriptor §20,
  * LZW + sub-block packaging appendices E/F).
  *
  * Determinism contract (the q_mm_gif_pixels gate relies on it): GIF is
  * lossless palette-indexed, so decode(encode(idx, palette)) expands to
  * exactly palette[idx] and a DuckDB oracle recomputes every decoded
  * RGB byte from the fixture's closed-form index/palette arithmetic.
  */
object Gif {

  /** Decoded image: RGB triplets row-major, like the PNG/JPEG decoders. */
  type Decoded = (Int, Int, Int, Array[Byte]) // (w, h, channels=3, pixels)

  // ------------------------------------------------------------ encoder

  /** Encode an indexed image: `indices(y*w+x)` into `palette` (packed
    * RGB triplets, length 3·2^k for some k in 1..8). Emits GIF89a with a
    * global color table; `interlace` writes rows in the four-pass
    * interlaced order (decode restores raster order, so the round trip
    * is identity either way).
    */
  def encode(indices: Array[Byte], w: Int, h: Int, palette: Array[Byte],
             interlace: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h)
    require(palette.length % 3 == 0)
    val nColors = palette.length / 3
    require(nColors >= 2 && nColors <= 256 && Integer.bitCount(nColors) == 1,
      s"palette size $nColors must be a power of two in 2..256")
    val ctBits = 32 - Integer.numberOfLeadingZeros(nColors - 1) // log2(nColors)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | ((ctBits - 1) << 4) | (ctBits - 1)) // GCT, color res, size
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    out.write(palette, 0, palette.length)
    // image descriptor
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(if (interlace) 0x40 else 0x00)
    // pixel stream in file order
    val ordered =
      if (!interlace) indices
      else {
        val o = new Array[Byte](indices.length)
        var j = 0
        for (y <- interlacedRows(h)) {
          System.arraycopy(indices, y * w, o, j * w, w)
          j += 1
        }
        o
      }
    val minCode = math.max(2, ctBits)
    out.write(minCode)
    writeSubBlocks(out, lzwCompress(ordered, minCode))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** The four interlace passes (GIF89a §20): rows 0,8,16… then 4,12…
    * then 2,6,10… then 1,3,5…
    */
  private def interlacedRows(h: Int): Seq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  private def writeSubBlocks(out: java.io.ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
    out.write(0) // block terminator
  }

  /** GIF-flavor LZW: LSB-first variable-width codes, dictionary grown to
    * 4096 then CLEAR. The string table is a trie over (prefixCode,
    * nextByte) pairs in a flat hash map — standard LZW, nothing exotic.
    */
  private def lzwCompress(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var codeSize = minCode + 1
    // (prefix << 8 | byte) -> code
    var table = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += codeSize
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
      // width bump mirrors the decoder exactly: the decoder adds its
      // table entry one code BEHIND the encoder, so the encoder bumps
      // after WRITING a code once the next free entry (added after the
      // previous write) has outgrown the width — at-add-time bumping is
      // the classic off-by-one that corrupts the third code after clear
      if (nextCode >= (1 << codeSize) && codeSize < 12) codeSize += 1
    }
    def reset(): Unit = { table = new java.util.HashMap[Integer, Integer](); nextCode = eoi + 1; codeSize = minCode + 1 }
    put(clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xff
        val key = Integer.valueOf((prefix << 8) | b)
        val hit = table.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          if (nextCode < 4096) {
            table.put(key, Integer.valueOf(nextCode))
            nextCode += 1
          } else {
            put(clear)
            reset()
          }
          prefix = b
        }
        i += 1
      }
      put(prefix)
    }
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------------------ decoder

  /** Decode the first image frame of a GIF to RGB. None, never a throw,
    * on anything that isn't a well-formed GIF within the documented
    * scope. `maxBytes` bounds the decoded allocation against untrusted
    * dimension fields.
    */
  def decode(p: Array[Byte], maxBytes: Long = 64L << 20): Option[Decoded] =
    try decodeImpl(p, maxBytes)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  private def decodeImpl(p: Array[Byte], maxBytes: Long): Option[Decoded] = {
    if (p.length < 13) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    val sw = le16(6); val sh = le16(8)
    val packed = p(10) & 0xff
    var off = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (off + 3 * n > p.length) return None
      gct = java.util.Arrays.copyOfRange(p, off, off + 3 * n)
      off += 3 * n
    }
    if (sw <= 0 || sh <= 0 || sw.toLong * sh * 3 > maxBytes) return None

    while (off < p.length) {
      (p(off) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + sub-block chain
          off += 2
          while (off < p.length && (p(off) & 0xff) != 0)
            off += 1 + (p(off) & 0xff)
          off += 1
        case 0x2c =>
          off += 1
          val left = le16(off); val top = le16(off + 2)
          val iw = le16(off + 4); val ih = le16(off + 6)
          val ipacked = p(off + 8) & 0xff
          off += 9
          var ct = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (off + 3 * n > p.length) return None
            ct = java.util.Arrays.copyOfRange(p, off, off + 3 * n)
            off += 3 * n
          }
          if (ct == null) return None
          if (iw <= 0 || ih <= 0 || left + iw > sw || top + ih > sh) return None
          val interlaced = (ipacked & 0x40) != 0
          val minCode = p(off) & 0xff
          off += 1
          if (minCode < 2 || minCode > 11) return None
          // gather the sub-block chain
          val chain = new java.io.ByteArrayOutputStream()
          var sz = p(off) & 0xff
          off += 1
          while (sz != 0) {
            if (off + sz > p.length) return None
            chain.write(p, off, sz)
            off += sz
            sz = if (off < p.length) { val s = p(off) & 0xff; off += 1; s } else return None
          }
          val indices = lzwDecompress(chain.toByteArray, minCode, iw * ih) match {
            case Some(d) => d
            case None => return None
          }
          // expand palette into the logical screen (background = entry 0)
          val out = new Array[Byte](sw * sh * 3)
          if (left != 0 || top != 0 || iw != sw || ih != sh) {
            val bg = 0
            var i = 0
            while (i < sw * sh) {
              out(i * 3) = ct(bg * 3); out(i * 3 + 1) = ct(bg * 3 + 1); out(i * 3 + 2) = ct(bg * 3 + 2)
              i += 1
            }
          }
          val rowOrder = if (interlaced) interlacedRows(ih) else 0 until ih
          var srcRow = 0
          for (y <- rowOrder) {
            var x = 0
            while (x < iw) {
              val idx = (indices(srcRow * iw + x) & 0xff) * 3
              if (idx + 2 >= ct.length) return None
              val base = ((top + y) * sw + (left + x)) * 3
              out(base) = ct(idx); out(base + 1) = ct(idx + 1); out(base + 2) = ct(idx + 2)
              x += 1
            }
            srcRow += 1
          }
          return Some((sw, sh, 3, out))
        case _ => return None
      }
    }
    None
  }

  /** GIF-flavor LZW decode: LSB-first variable-width codes, string
    * table rebuilt from (prefix, firstByte) chains, the KwKwK case, and
    * mid-stream CLEAR. Stops after `expected` pixels (a conforming
    * stream's EOI lands there).
    */
  private def lzwDecompress(data: Array[Byte], minCode: Int, expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; length(i) = 1; i += 1 }

    val out = new Array[Byte](expected)
    var outPos = 0
    var acc = 0L
    var nbits = 0
    var bytePos = 0
    var prev = -1

    def emit(code: Int): Boolean = {
      // walk the chain backwards into the output
      var l = length(code)
      if (outPos + l > expected) return false
      var pos = outPos + l - 1
      var c = code
      while (c != -1) { out(pos) = suffix(c); pos -= 1; c = prefix(c) }
      outPos += l
      true
    }

    while (outPos < expected) {
      while (nbits < codeSize) {
        if (bytePos >= data.length) return None
        acc |= (data(bytePos) & 0xffL) << nbits
        bytePos += 1
        nbits += 8
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      nbits -= codeSize
      if (code == clear) {
        nextCode = eoi + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outPos == expected) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > nextCode || (code >= nextCode && code >= 4096)) return None
        if (code == nextCode) {
          // KwKwK: new string = prev + firstByte(prev)
          if (nextCode >= 4096) return None
          prefix(nextCode) = prev
          suffix(nextCode) = firstByte(prefix, suffix, prev)
          length(nextCode) = length(prev) + 1
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (!emit(code)) return None
          prev = code
        } else {
          if (!emit(code)) return None
          if (nextCode < 4096) {
            prefix(nextCode) = prev
            suffix(nextCode) = firstByte(prefix, suffix, code)
            length(nextCode) = length(prev) + 1
            nextCode += 1
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
    }
    Some(out)
  }

  private def firstByte(prefix: Array[Int], suffix: Array[Byte], code0: Int): Byte = {
    var c = code0
    while (prefix(c) != -1) c = prefix(c)
    suffix(c)
  }

  // ------------------------------------------------------------ fixture

  /** Deterministic palette-indexed fixture: geometry, palette size,
    * every palette entry, every index, and the interlace flag are
    * closed-form functions of the id — the q_mm_gif_pixels oracle
    * recomputes each decoded RGB byte as palette arithmetic over the
    * index arithmetic. Half the corpus is interlaced, so the
    * deinterlacer is load-bearing in every gate run.
    */
  private[ops] def gifFixture(id: Long): Array[Byte] = {
    val g = math.floorMod(id, 50L).toInt
    val w = 11 + g % 8
    val h = 7 + g % 5
    val nColors = 4 << (g % 3) // 4, 8, 16
    val palette = new Array[Byte](nColors * 3)
    var p0 = 0
    while (p0 < nColors) {
      palette(p0 * 3) = ((p0 * 37 + g * 11) % 256).toByte
      palette(p0 * 3 + 1) = ((p0 * 59 + g * 13) % 256).toByte
      palette(p0 * 3 + 2) = ((p0 * 83 + g * 17) % 256).toByte
      p0 += 1
    }
    val idx = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        idx(y * w + x) =
          math.floorMod(x * 7L + y * 11L + id / 50L + g, nColors.toLong).toByte
        x += 1
      }
      y += 1
    }
    encode(idx, w, h, palette, interlace = g % 2 == 1)
  }
}
