package graft.ops

/** BMP codec: lossless round trips, cross-validation against
  * javax.imageio in both directions, the 8-bit paletted and top-down
  * decode-only paths via hand-assembled files, fixture↔closed-form
  * agreement, and rejection of out-of-scope profiles.
  */
class BmpSpec extends graft.SparkTestBase {

  test("24-bit round trip across widths 1..9 (every row-padding phase)") {
    for (w <- 1 to 9; h <- Seq(1, 3, 5)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 7 + w * 13 + h) % 256).toByte)
      val dec = Bmp.decode(Bmp.encode(px, w, h))
      assert(dec.isDefined, s"w=$w h=$h rejected")
      val (dw, dh, ch, out) = dec.get
      assert(dw == w && dh == h && ch == 3)
      assert(java.util.Arrays.equals(out, px), s"w=$w h=$h pixels differ")
    }
  }

  test("cross-validation: our encoder → javax.imageio decoder") {
    for (id <- 0L until 60L) {
      val bytes = Bmp.bmpFixture(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"imageio rejected fixture id=$id")
      val (w, h, _, px) = Bmp.decode(bytes).get
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val base = (y * w + x) * 3
        assert(((rgb >> 16) & 0xff) == (px(base) & 0xff) &&
          ((rgb >> 8) & 0xff) == (px(base + 1) & 0xff) &&
          (rgb & 0xff) == (px(base + 2) & 0xff), s"id=$id ($x,$y)")
      }
    }
  }

  test("cross-validation: javax.imageio encoder → our decoder") {
    val w = 21; val h = 13
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 57) << 16 | (x * 11) << 8 | (y * 19 + 3))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val dec = Bmp.decode(bos.toByteArray)
    assert(dec.isDefined, "our decoder rejected an imageio BMP")
    val (dw, dh, _, px) = dec.get
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == (px(base) & 0xff) &&
        ((rgb >> 8) & 0xff) == (px(base + 1) & 0xff) &&
        (rgb & 0xff) == (px(base + 2) & 0xff), s"($x,$y)")
    }
  }

  /** Hand-assemble an 8-bit paletted BMP (optionally top-down). */
  private def paletted(w: Int, h: Int, nColors: Int, topDown: Boolean,
                       idx: (Int, Int) => Int, pal: Int => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (w + 3) & ~3
    val dataOff = 14 + 40 + 4 * nColors
    val out = new Array[Byte](dataOff + rowBytes * h)
    def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
    def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff) }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length); le32(10, dataOff); le32(14, 40)
    le32(18, w); le32(22, if (topDown) -h else h)
    le16(26, 1); le16(28, 8); le32(30, 0); le32(46, nColors)
    for (p <- 0 until nColors) {
      val (r, g, b) = pal(p)
      val o = 14 + 40 + p * 4
      out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
    }
    for (fy <- 0 until h; x <- 0 until w) {
      val imgY = if (topDown) fy else h - 1 - fy
      out(dataOff + fy * rowBytes + x) = idx(x, imgY).toByte
    }
    out
  }

  test("8-bit paletted and top-down decode (hand-assembled)") {
    val pal = (p: Int) => ((p * 37) % 256, (p * 59) % 256, (p * 83) % 256)
    val idx = (x: Int, y: Int) => (x * 3 + y * 5) % 16
    for (topDown <- Seq(false, true)) {
      val bytes = paletted(10, 7, 16, topDown, idx, pal)
      // imageio agrees on the hand-assembled file → the assembly is valid
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      val dec = Bmp.decode(bytes)
      assert(dec.isDefined, s"paletted topDown=$topDown rejected")
      val (dw, dh, _, px) = dec.get
      assert(dw == 10 && dh == 7)
      for (y <- 0 until 7; x <- 0 until 10) {
        val (r, g, b) = pal(idx(x, y))
        val base = (y * 10 + x) * 3
        assert((px(base) & 0xff) == r && (px(base + 1) & 0xff) == g && (px(base + 2) & 0xff) == b,
          s"topDown=$topDown ($x,$y)")
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == r && ((rgb >> 8) & 0xff) == g && (rgb & 0xff) == b,
          s"imageio disagrees topDown=$topDown ($x,$y)")
      }
    }
  }

  test("fixture agrees with the closed form (gate premise)") {
    for (id <- 0L until 100L) {
      val g = math.floorMod(id, 50L).toInt
      val w = 13 + g % 7
      val h = 6 + g % 5
      val (dw, dh, ch, px) = Bmp.decode(Bmp.bmpFixture(id)).get
      assert(dw == w && dh == h && ch == 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val expect = math.floorMod(x * (11L + g) + y * (17L + 2L * g) + c * 41L + id / 50L, 256L).toInt
        assert((px((y * w + x) * 3 + c) & 0xff) == expect, s"id=$id ($x,$y,$c)")
      }
    }
  }

  test("out-of-scope and malformed reject without throwing") {
    val good = Bmp.bmpFixture(1)
    assert(Bmp.decode(good).isDefined)
    assert(Bmp.decode(Array.emptyByteArray).isEmpty)
    assert(Bmp.decode(Array.fill(100)(0x42.toByte)).isEmpty)
    assert(Bmp.decode(good.take(40)).isEmpty)
    assert(Bmp.decode(good.take(good.length - 10)).isEmpty, "truncated data accepted")
    // 16-bpp profile → None (imageio fallback territory)
    val b16 = good.clone(); b16(28) = 16
    assert(Bmp.decode(b16).isEmpty)
    // RLE8 compression → None
    val rle = good.clone(); rle(30) = 1
    assert(Bmp.decode(rle).isEmpty)
    // absurd dimensions must not allocate
    val big = good.clone()
    big(18) = 0xff.toByte; big(19) = 0xff.toByte; big(20) = 0x7f.toByte
    assert(Bmp.decode(big).isEmpty)
  }
}
