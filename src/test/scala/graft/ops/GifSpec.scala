package graft.ops

/** GIF codec: lossless round trips (sequential + interlaced, palette
  * sizes 2..256, dictionary-overflow streams), cross-validation against
  * javax.imageio in BOTH directions, fixture↔closed-form agreement (the
  * q_mm_gif_pixels gate's premise), and graceful rejection of malformed
  * streams.
  */
class GifSpec extends graft.SparkTestBase {

  private def mkPalette(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n * 3)(i => ((i * 31 + seed * 7) % 256).toByte)

  private def rt(idx: Array[Byte], w: Int, h: Int, pal: Array[Byte],
                 interlace: Boolean): Unit = {
    val enc = Gif.encode(idx, w, h, pal, interlace)
    val dec = Gif.decode(enc)
    assert(dec.isDefined, s"decode failed w=$w h=$h interlace=$interlace")
    val (dw, dh, ch, px) = dec.get
    assert(dw == w && dh == h && ch == 3)
    for (i <- 0 until w * h) {
      val p = (idx(i) & 0xff) * 3
      assert(px(i * 3) == pal(p) && px(i * 3 + 1) == pal(p + 1) && px(i * 3 + 2) == pal(p + 2),
        s"pixel $i differs (interlace=$interlace)")
    }
  }

  test("round trip: palette sizes 2..256, sequential and interlaced") {
    for (bits <- 1 to 8; interlace <- Seq(false, true)) {
      val n = 1 << bits
      val w = 23; val h = 17
      val idx = Array.tabulate(w * h)(i => (i % n).toByte)
      rt(idx, w, h, mkPalette(n, bits), interlace)
    }
  }

  test("round trip survives dictionary growth to 4096 and mid-stream clear") {
    // large, high-entropy image: the LZW table must fill and reset
    val w = 200; val h = 200
    val rnd = new java.util.Random(42)
    val idx = Array.fill(w * h)((rnd.nextInt(256)).toByte)
    rt(idx, w, h, mkPalette(256, 1), interlace = false)
    rt(idx, w, h, mkPalette(256, 1), interlace = true)
    // highly repetitive image: long matches, early width growth
    val idx2 = Array.tabulate(w * h)(i => ((i / 97) % 4).toByte)
    rt(idx2, w, h, mkPalette(4, 2), interlace = false)
  }

  test("cross-validation: our encoder → javax.imageio decoder") {
    for (id <- 0L until 60L) {
      val bytes = Gif.gifFixture(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"imageio rejected fixture id=$id")
      val ours = Gif.decode(bytes).get
      assert(img.getWidth == ours._1 && img.getHeight == ours._2)
      for (y <- 0 until ours._2; x <- 0 until ours._1) {
        val rgb = img.getRGB(x, y)
        val base = (y * ours._1 + x) * 3
        assert(((rgb >> 16) & 0xff) == (ours._4(base) & 0xff) &&
          ((rgb >> 8) & 0xff) == (ours._4(base + 1) & 0xff) &&
          (rgb & 0xff) == (ours._4(base + 2) & 0xff),
          s"id=$id ($x,$y): imageio disagrees")
      }
    }
  }

  test("cross-validation: javax.imageio encoder → our decoder") {
    val w = 31; val h = 19
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // few distinct colors so the imageio GIF writer's palette is exact
      val c = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff, 0xffffff)((x / 7 + y / 5) % 5)
      img.setRGB(x, y, c)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val dec = Gif.decode(bos.toByteArray)
    assert(dec.isDefined, "our decoder rejected an imageio GIF")
    val (dw, dh, _, px) = dec.get
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == (px(base) & 0xff) &&
        ((rgb >> 8) & 0xff) == (px(base + 1) & 0xff) &&
        (rgb & 0xff) == (px(base + 2) & 0xff), s"($x,$y) differs")
    }
  }

  test("fixture agrees with the closed form (gate premise)") {
    for (id <- 0L until 100L) {
      val g = math.floorMod(id, 50L).toInt
      val w = 11 + g % 8
      val h = 7 + g % 5
      val nColors = 4 << (g % 3)
      val (dw, dh, ch, px) = Gif.decode(Gif.gifFixture(id)).get
      assert(dw == w && dh == h && ch == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val p = math.floorMod(x * 7L + y * 11L + id / 50L + g, nColors.toLong).toInt
        val base = (y * w + x) * 3
        assert((px(base) & 0xff) == (p * 37 + g * 11) % 256, s"id=$id ($x,$y) R")
        assert((px(base + 1) & 0xff) == (p * 59 + g * 13) % 256, s"id=$id ($x,$y) G")
        assert((px(base + 2) & 0xff) == (p * 83 + g * 17) % 256, s"id=$id ($x,$y) B")
      }
    }
  }

  test("partial frame with offsets composes onto a background-filled screen") {
    // hand-assemble: 10×8 screen, 4×3 frame at (3,2), GCT of 4 colors
    val pal = mkPalette(4, 9)
    val inner = Array.tabulate(12)(i => ((i % 3) + 1).toByte)
    val full = Gif.encode(inner, 4, 3, pal)
    // splice new screen dims + descriptor offsets into the encoded bytes
    val out = new java.io.ByteArrayOutputStream()
    out.write(full, 0, 6)
    out.write(10); out.write(0); out.write(8); out.write(0) // screen 10×8
    out.write(full, 10, 3 + 12) // packed/bg/aspect + GCT(4×3)
    out.write(0x2c)
    out.write(3); out.write(0); out.write(2); out.write(0) // left=3, top=2
    out.write(4); out.write(0); out.write(3); out.write(0) // 4×3
    // copy from the original image descriptor's packed byte onward
    val imgOff = 6 + 7 + 12 + 1 + 8 // header+lsd+gct+sep+descriptor fields
    out.write(full, imgOff, full.length - imgOff)
    val dec = Gif.decode(out.toByteArray)
    assert(dec.isDefined, "partial-frame stream rejected")
    val (dw, dh, _, px) = dec.get
    assert(dw == 10 && dh == 8)
    for (y <- 0 until 8; x <- 0 until 10) {
      val base = (y * 10 + x) * 3
      val expectIdx =
        if (x >= 3 && x < 7 && y >= 2 && y < 5) (((y - 2) * 4 + (x - 3)) % 3) + 1
        else 0 // background
      val p = expectIdx * 3
      assert(px(base) == pal(p) && px(base + 1) == pal(p + 1) && px(base + 2) == pal(p + 2),
        s"($x,$y)")
    }
  }

  test("malformed streams reject without throwing") {
    val good = Gif.gifFixture(1)
    assert(Gif.decode(good).isDefined)
    assert(Gif.decode(Array.emptyByteArray).isEmpty)
    assert(Gif.decode("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode(Array.fill(200)(0x77.toByte)).isEmpty)
    assert(Gif.decode(good.take(good.length / 2)).isEmpty, "truncated accepted")
    // no color table at all: strip the GCT flag
    val noCt = good.clone(); noCt(10) = (noCt(10) & 0x7f).toByte
    assert(Gif.decode(noCt).isEmpty, "missing color table accepted")
    // absurd dimensions must not allocate
    val big = good.clone()
    big(6) = 0xff.toByte; big(7) = 0xff.toByte; big(8) = 0xff.toByte; big(9) = 0xff.toByte
    assert(Gif.decode(big).isEmpty)
  }

  test("extension blocks are skipped (graphic control + comment)") {
    val pal = mkPalette(4, 3)
    val idx = Array.tabulate(20)(i => (i % 4).toByte)
    val plain = Gif.encode(idx, 5, 4, pal)
    // inject a GCE and a comment extension between GCT and image descriptor
    val gctEnd = 6 + 7 + 12
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, gctEnd)
    out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)) // GCE
    out.write(Array[Byte](0x21, 0xfe.toByte, 3, 'h', 'i', '!', 0)) // comment
    out.write(plain, gctEnd, plain.length - gctEnd)
    val dec = Gif.decode(out.toByteArray)
    assert(dec.isDefined, "extensions broke the decoder")
    assert(java.util.Arrays.equals(dec.get._4, Gif.decode(plain).get._4))
  }
}
