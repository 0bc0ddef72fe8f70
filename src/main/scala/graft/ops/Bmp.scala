package graft.ops

/** BMP (Windows DIB) codec, pure JVM, both directions.
  *
  * Scope — the uncompressed profiles that constitute essentially all
  * BMP payloads in bulk web data: BITMAPINFOHEADER (40-byte) and the
  * larger V4/V5 headers with BI_RGB compression, 24-bit true color and
  * 8-bit paletted, bottom-up and top-down (negative height) row order,
  * 4-byte scanline padding. RLE4/RLE8, 16/32-bit bitfield and 1/4-bit
  * profiles return None and fall through to the caller's next decoder
  * (javax.imageio) — on a 100 TB corpus an unsupported profile must
  * degrade, not throw.
  *
  * Mirrors the reference's posture of doing real work on binary columns
  * (peskas.malawi.data.pipeline R/export.R:18-60 treats tracks as opaque
  * typed payloads); the format is implemented from the public Windows
  * BMP file-format documentation (BITMAPFILEHEADER/BITMAPINFOHEADER
  * layouts, BGR byte order, DWORD row alignment).
  *
  * Determinism contract (the q_mm_bmp_pixels gate relies on it): BMP is
  * uncompressed, so decode(encode(px)) == px byte-exactly and a DuckDB
  * oracle recomputes every decoded RGB byte from the fixture's closed
  * form.
  */
object Bmp {

  /** Encode 24-bit BI_RGB (channels must be 3, row-major RGB in, BGR
    * bottom-up on disk — the canonical writer layout).
    */
  def encode(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h * 3)
    val rowBytes = (w * 3 + 3) & ~3
    val dataSize = rowBytes * h
    val out = new Array[Byte](14 + 40 + dataSize)
    def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def le32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length)
    le32(10, 54) // pixel data offset
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, w)
    le32(22, h)  // positive = bottom-up
    le16(26, 1)  // planes
    le16(28, 24) // bpp
    le32(30, 0)  // BI_RGB
    le32(34, dataSize)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // bottom-up
      var x = 0
      while (x < w) {
        val s = (srcRow * w + x) * 3
        val d = 54 + y * rowBytes + x * 3
        out(d) = px(s + 2); out(d + 1) = px(s + 1); out(d + 2) = px(s) // BGR
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode BI_RGB 24-bit or 8-bit-paletted BMP to row-major RGB.
    * None, never a throw, outside the documented scope; `maxBytes`
    * bounds the decoded allocation against untrusted dimension fields.
    */
  def decode(p: Array[Byte], maxBytes: Long = 64L << 20): Option[(Int, Int, Int, Array[Byte])] =
    try decodeImpl(p, maxBytes)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  private def decodeImpl(p: Array[Byte], maxBytes: Long): Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int): Int =
      (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) | ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    val dataOff = le32(10)
    val hdrSize = le32(14)
    // 40 = BITMAPINFOHEADER; 52/56/108/124 = V2–V5 extensions, all of
    // which keep the core fields at the same offsets
    if (hdrSize != 40 && hdrSize != 52 && hdrSize != 56 && hdrSize != 108 && hdrSize != 124) return None
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (le16(26) != 1) return None
    val bpp = le16(28)
    if (le32(30) != 0) return None // BI_RGB only
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > maxBytes) return None
    val out = new Array[Byte](w * h * 3)
    if (bpp == 24) {
      val rowBytes = (w * 3 + 3) & ~3
      if (dataOff.toLong + rowBytes.toLong * h > p.length) return None
      var y = 0
      while (y < h) {
        val dstRow = if (topDown) y else h - 1 - y
        var x = 0
        while (x < w) {
          val s = dataOff + y * rowBytes + x * 3
          val d = (dstRow * w + x) * 3
          out(d) = p(s + 2); out(d + 1) = p(s + 1); out(d + 2) = p(s)
          x += 1
        }
        y += 1
      }
    } else if (bpp == 8) {
      val used = le32(46)
      val nColors = if (used != 0) used else 256
      if (nColors < 0 || nColors > 256) return None
      val palOff = 14 + hdrSize
      if (palOff + 4 * nColors > p.length) return None
      val rowBytes = (w + 3) & ~3
      if (dataOff.toLong + rowBytes.toLong * h > p.length) return None
      var y = 0
      while (y < h) {
        val dstRow = if (topDown) y else h - 1 - y
        var x = 0
        while (x < w) {
          val idx = p(dataOff + y * rowBytes + x) & 0xff
          if (idx >= nColors) return None
          val pe = palOff + idx * 4 // BGRA quad
          val d = (dstRow * w + x) * 3
          out(d) = p(pe + 2); out(d + 1) = p(pe + 1); out(d + 2) = p(pe)
          x += 1
        }
        y += 1
      }
    } else return None
    Some((w, h, 3, out))
  }

  /** Deterministic fixture (closed form mirrors [[Gif.gifFixture]]'s
    * posture): RGB gradient with group-dependent slopes, odd widths so
    * the DWORD row padding is load-bearing in every gate run.
    */
  private[ops] def bmpFixture(id: Long): Array[Byte] = {
    val g = math.floorMod(id, 50L).toInt
    val w = 13 + g % 7 // 13..19: never a multiple of 4 pixels→bytes
    val h = 6 + g % 5
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px((y * w + x) * 3 + c) =
            math.floorMod(x * (11L + g) + y * (17L + 2L * g) + c * 41L + id / 50L, 256L).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encode(px, w, h)
  }
}
