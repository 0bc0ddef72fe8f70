package graft.ops

/** Baseline JPEG codec: fixture exactness (the q_mm_jpeg_pixels gate's
  * premise), cross-validation against javax.imageio in BOTH directions
  * (our encoder → their decoder, their encoder → our decoder), and
  * graceful rejection of unsupported profiles.
  */
class JpegSpec extends graft.SparkTestBase {

  /** The decoded pixels the fixture closed form promises (the Scala twin
    * of the q_mm_jpeg_pixels oracle SQL). */
  private def expectedPixels(id: Long): (Int, Int, Int, Array[Int]) = {
    val (w, h, ch) = Jpeg.fixtureGeometry(id)
    val out = new Array[Int](w * h * (if (ch == 1) 1 else 3))
    for (y <- 0 until h; x <- 0 until w) {
      val bx = x / 8; val by = y / 8
      if (ch == 1) out(y * w + x) = Jpeg.fixtureBlockVal(id, bx, by, 0)
      else {
        val yv = Jpeg.fixtureBlockVal(id, bx, by, 0).toDouble
        val cb = Jpeg.fixtureBlockVal(id, bx, by, 1).toDouble
        val cr = Jpeg.fixtureBlockVal(id, bx, by, 2).toDouble
        def clamp(d: Double): Int = {
          val v = math.floor(d + 0.5).toInt
          if (v < 0) 0 else if (v > 255) 255 else v
        }
        val base = (y * w + x) * 3
        out(base) = clamp(yv + 1.402 * (cr - 128.0))
        out(base + 1) = clamp(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
        out(base + 2) = clamp(yv + 1.772 * (cb - 128.0))
      }
    }
    (w, h, if (ch == 1) 1 else 3, out)
  }

  test("fixture round-trip is integer-exact for 150 consecutive ids " +
    "(every geometry/channel group three times)") {
    for (id <- 0L until 150L) {
      val (ew, eh, ech, epx) = expectedPixels(id)
      val decoded = Jpeg.decode(Jpeg.jpegFixture(id))
      assert(decoded.isDefined, s"id=$id: fixture failed to decode")
      val (w, h, ch, px) = decoded.get
      assert((w, h, ch) == ((ew, eh, ech)), s"id=$id geometry")
      val diffs = px.indices.filter(i => (px(i) & 0xff) != epx(i))
      assert(diffs.isEmpty,
        s"id=$id: ${diffs.length} pixel diffs, first at ${diffs.headOption} " +
          s"(got ${diffs.headOption.map(i => px(i) & 0xff)}, " +
          s"want ${diffs.headOption.map(epx)})")
    }
  }

  private def imageioDecode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "imageio could not read the payload")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Int](w * h * 3)
    val gray = img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    for (y <- 0 until h; x <- 0 until w) {
      if (gray) {
        // raster sample, NOT getRGB: getRGB on TYPE_BYTE_GRAY runs the
        // linear-gray -> sRGB color transform and gamma-shifts every value
        val v = img.getRaster.getSample(x, y, 0)
        out((y * w + x) * 3) = v
        out((y * w + x) * 3 + 1) = v
        out((y * w + x) * 3 + 2) = v
      } else {
        val rgb = img.getRGB(x, y)
        out((y * w + x) * 3) = (rgb >> 16) & 0xff
        out((y * w + x) * 3 + 1) = (rgb >> 8) & 0xff
        out((y * w + x) * 3 + 2) = rgb & 0xff
      }
    }
    (w, h, out)
  }

  /** Smooth deterministic test image (no block edges → small codec
    * disagreement bounds). */
  private def gradient(w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      val p = i / ch; val c = i % ch
      val x = p % w; val y = p / w
      ((x * 3 + y * 2 + c * 40 + (x * y) / 16) % 256).toByte
    }

  test("our encoder → imageio decoder: general color image agrees within ±1") {
    val (w, h) = (40, 24)
    val px = gradient(w, h, 3)
    val bytes = Jpeg.encode(px, w, h, 3) // standard lossy tables, 4:4:4
    val ours = Jpeg.decode(bytes).get
    val (iw, ih, theirs) = imageioDecode(bytes)
    assert((iw, ih) == ((w, h)) && (ours._1, ours._2, ours._3) == ((w, h, 3)))
    // two conformant IDCTs are each allowed ±1 per sample (T.81 Annex A
    // accuracy), so they may differ by 2 on the rare value that lands on
    // a rounding boundary — but only rarely, and never by more
    val diffs = ours._4.indices.map(i => math.abs((ours._4(i) & 0xff) - theirs(i)))
    assert(diffs.max <= 2, s"max deviation ${diffs.max}")
    assert(diffs.count(_ == 2) <= diffs.length / 50,
      s"${diffs.count(_ == 2)}/${diffs.length} samples at the ±2 bound")
  }

  test("our encoder → imageio decoder: grayscale agrees within ±1") {
    val (w, h) = (33, 17) // non-multiple-of-8 edges exercise replication
    val px = gradient(w, h, 1)
    val bytes = Jpeg.encode(px, w, h, 1)
    val ours = Jpeg.decode(bytes).get
    val (iw, ih, theirs) = imageioDecode(bytes) // imageio promotes gray→RGB
    assert((iw, ih) == ((w, h)) && ours._3 == 1)
    val diffs = (0 until w * h).map { i =>
      math.abs((ours._4(i) & 0xff) - theirs(i * 3))
    }
    assert(diffs.max <= 2, s"max deviation ${diffs.max}")
    assert(diffs.count(_ == 2) <= diffs.length / 50,
      s"${diffs.count(_ == 2)}/${diffs.length} samples at the ±2 bound")
  }

  test("imageio encoder → our decoder: grayscale agrees with their own decode ±1") {
    val (w, h) = (37, 21)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = gradient(w, h, 1)
    for (y <- 0 until h; x <- 0 until w) // raster, not setRGB: see imageioDecode
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    val ours = Jpeg.decode(bytes)
    assert(ours.isDefined, "our decoder rejected an imageio baseline JPEG")
    val (ow, oh, och, opx) = ours.get
    val (_, _, theirs) = imageioDecode(bytes)
    assert((ow, oh, och) == ((w, h, 1)))
    val diffs = (0 until w * h).map { i =>
      math.abs((opx(i) & 0xff) - theirs(i * 3))
    }
    assert(diffs.max <= 2, s"max deviation ${diffs.max}")
    assert(diffs.count(_ == 2) <= diffs.length / 50,
      s"${diffs.count(_ == 2)}/${diffs.length} samples at the ±2 bound")
  }

  test("imageio encoder → our decoder: 4:2:0 color decodes with small deviation") {
    val (w, h) = (48, 32)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val px = gradient(w, h, 3)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      img.setRGB(x, y, ((px(base) & 0xff) << 16) | ((px(base + 1) & 0xff) << 8)
        | (px(base + 2) & 0xff))
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    val ours = Jpeg.decode(bytes)
    assert(ours.isDefined, "our decoder rejected an imageio 4:2:0 JPEG")
    val (ow, oh, och, opx) = ours.get
    assert((ow, oh, och) == ((w, h, 3)))
    // their decoder applies smooth chroma upsampling, ours box-replicates:
    // values differ on chroma gradients, but on a smooth image the mean
    // gap must stay small and the luma structure identical
    val (_, _, theirs) = imageioDecode(bytes)
    val meanAbs = opx.indices.map(i => math.abs((opx(i) & 0xff) - theirs(i))).sum
      .toDouble / opx.length
    assert(meanAbs < 5.0, s"mean abs deviation $meanAbs vs imageio")
  }

  test("restart intervals: DRI/RSTn round-trip decodes identically to the " +
    "marker-free stream, and imageio agrees") {
    for (ch <- Seq(1, 3)) {
      val (w, h) = (40, 24) // 15 MCUs -> 7 RST markers at interval 2
      val px = gradient(w, h, ch)
      val plain = Jpeg.encode(px, w, h, ch)
      val rst = Jpeg.encode(px, w, h, ch, restartInterval = 2)
      assert(rst.length > plain.length, "RST markers must actually be present")
      // same quant tables, same blocks -> byte-identical decoded pixels;
      // only the entropy stream framing differs
      val a = Jpeg.decode(plain).get
      val b = Jpeg.decode(rst).get
      assert((b._1, b._2, b._3) == ((w, h, ch)))
      assert(java.util.Arrays.equals(a._4, b._4),
        s"ch=$ch: restart-interval decode diverged from plain decode")
      // imageio (an independent conformant decoder) accepts the DRI
      // stream and matches our decode at the usual accuracy bound
      val (iw, ih, theirs) = imageioDecode(rst)
      assert((iw, ih) == ((w, h)))
      val diffs = (0 until w * h).map { i =>
        if (ch == 1) math.abs((b._4(i) & 0xff) - theirs(i * 3))
        else math.abs((b._4(i * 3) & 0xff) - theirs(i * 3))
      }
      assert(diffs.max <= 2, s"ch=$ch: max deviation ${diffs.max} vs imageio")
    }
  }

  test("unsupported or corrupt payloads are rejected, not thrown") {
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode("not a jpeg at all".getBytes).isEmpty)
    val good = Jpeg.jpegFixture(7L)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty ||
      Jpeg.decode(good.take(good.length / 2)).isDefined) // truncation: no throw
    // flipping SOF0 to SOF2 (progressive) must be rejected outright
    val prog = good.clone()
    val sofIdx = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofIdx + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  test("decodeImagePixels dispatches JPEG payloads through the hand-rolled path") {
    // a fixture JPEG through the DataFrame API yields the closed-form stats
    import spark.implicits._
    val df = Seq((3L, Jpeg.jpegFixture(3L)), (4L, Jpeg.jpegFixture(4L)))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeImagePixels(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val (w, h, ch, epx) = expectedPixels(id)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == ch)
      assert(r.getLong(4) == epx.map(_.toLong).sum, s"id=$id sum")
      assert(r.getLong(5) == epx.zipWithIndex.map { case (v, i) =>
        (v + 1L) * (i + 1L) }.sum, s"id=$id checksum")
    }
  }
}
