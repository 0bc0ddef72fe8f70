package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Multimodal plumbing: binary payload schema, mapPartitions decode
  * (stubbed codec, real Spark plumbing), frame sampling shape.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val payloads = Seq((1L, "fake-image-bytes-aaa"), (2L, "fake-image-bytes-bbb"))
    .toDF("id", "s")
    .select(col("id"), col("s").cast("binary").as("payload"))

  test("decodeImages emits typed metadata deterministically") {
    val out1 = Multimodal.decodeImages(payloads, "id", "payload")
      .orderBy("id").collect().map(_.toSeq)
    val out2 = Multimodal.decodeImages(payloads, "id", "payload")
      .orderBy("id").collect().map(_.toSeq)
    assert(out1.toSeq == out2.toSeq) // stub is deterministic per payload
    val r = Multimodal.decodeImages(payloads, "id", "payload")
      .orderBy("id").select("id", "n_bytes", "meta.width", "meta.height", "meta.channels", "meta.format")
      .collect().head
    assert(r.getLong(1) == "fake-image-bytes-aaa".length.toLong)
    assert(r.getInt(2) >= 64 && r.getInt(3) >= 64 && r.getInt(4) == 3)
    assert(Set("jpeg", "png").contains(r.getString(5)))
  }

  test("decodeImages reads true PNG and JPEG geometry via javax.imageio") {
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8800) // non-trivial pixel
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val images = Seq(
      (1L, encode("png", 17, 9)),
      (2L, encode("jpg", 31, 23))).toDF("id", "payload")
    val out = Multimodal.decodeImages(images, "id", "payload")
      .orderBy("id")
      .select("id", "meta.width", "meta.height", "meta.channels", "meta.format")
      .collect()
    assert(out(0).toSeq == Seq(1L, 17, 9, 3, "png"))
    assert(out(1).getInt(1) == 31 && out(1).getInt(2) == 23 && out(1).getString(4) == "jpeg")
  }

  test("decodeImages: a corrupt payload with valid magic bytes falls back to the stub, not an exception") {
    // valid JPEG SOI magic so an ImageIO reader claims it, then garbage —
    // getWidth throws inside the reader; the op must survive (one bad row
    // must never fail a full-corpus job)
    val corrupt = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++
      Array.fill[Byte](20)(0x42)
    val df = Seq((1L, corrupt)).toDF("id", "payload")
    val r = Multimodal.decodeImages(df, "id", "payload")
      .select("meta.width", "meta.height", "meta.format").collect().head
    assert(r.getInt(0) >= 64 && r.getInt(1) >= 64) // stub geometry
    assert(Set("jpeg", "png").contains(r.getString(2)))
  }

  test("decodeImages/decodeAudio: a NULL payload takes the stub path with n_bytes=0, not an NPE") {
    val df = Seq((1L, Some("real".getBytes)), (2L, Option.empty[Array[Byte]]))
      .toDF("id", "payload")
    val img = Multimodal.decodeImages(df, "id", "payload")
      .orderBy("id").select("n_bytes", "meta.width").collect()
    assert(img(1).getLong(0) == 0L && img(1).getInt(1) >= 64)
    val aud = Multimodal.decodeAudio(df, "id", "payload")
      .orderBy("id").select("n_bytes", "meta.format").collect()
    assert(aud(1).getLong(0) == 0L && aud(1).getString(1) == "stub")
  }

  test("decodeAudio reads golden WAV geometry via the pure-JVM RIFF parse") {
    // hand-built canonical header, NOT via wavPayload — catches a writer
    // and parser that agree on the same wrong layout
    val golden = java.nio.ByteBuffer.allocate(44 + 64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(36 + 64).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1)
      .putShort(2).putInt(44100).putInt(44100 * 2 * 2).putShort(4).putShort(16)
      .put("data".getBytes).putInt(64).put(Array.fill[Byte](64)(7))
      .array()
    // and one via the writer at a different geometry
    val written = Multimodal.wavPayload(Array.fill[Byte](16000)(3), 8000, 1, 16)
    val df = Seq((1L, golden), (2L, written)).toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "id", "payload")
      .orderBy("id")
      .select("id", "meta.sample_rate", "meta.channels", "meta.bits_per_sample",
        "meta.duration_ms", "meta.format")
      .collect()
    assert(out(0).toSeq == Seq(1L, 44100, 2, 16, 64 * 1000.0 / (44100 * 4), "wav"))
    // 16000 bytes at 8kHz mono 16-bit = 16000 B/s byte rate → exactly 1 s
    assert(out(1).toSeq == Seq(2L, 8000, 1, 16, 1000.0, "wav"))
  }

  test("decodeAudio: truncated and non-WAV payloads take the deterministic stub") {
    val truncated = Multimodal.wavPayload(Array.fill[Byte](100)(1), 16000, 1, 16).take(30)
    val garbage = "not audio at all".getBytes
    val df = Seq((1L, truncated), (2L, garbage), (3L, garbage)).toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "id", "payload")
      .orderBy("id").select("meta.format", "meta.sample_rate").collect()
    assert(out.forall(_.getString(0) == "stub"))
    assert(out(1).toSeq == out(2).toSeq) // deterministic per payload
  }

  test("parseWavHeader honors the declared data size on a mid-data truncation") {
    // header-only contract: data CONTENT truncation must not change the
    // reported duration (the declared size is the source of truth)
    val full = Multimodal.wavPayload(Array.fill[Byte](32000)(1), 16000, 1, 16)
    val cut = full.take(44 + 100)
    val parsed = Multimodal.parseWavHeader(cut)
    assert(parsed.contains((16000, 1, 16, 1000.0, "wav")))
  }

  test("decodeAudio reads golden MP3 frame-header geometry (tag skip + sync scan)") {
    // hand-built, NOT via mp3Payload — catches a writer and parser that
    // agree on the same wrong layout. ID3v2 tag with syncsafe size 200
    // (requires two syncsafe digits: 200 = 0x01<<7 | 0x48), then a
    // 160kbps 32kHz mono MPEG1 Layer III frame + 1996 dummy bytes.
    val golden = java.nio.ByteBuffer.allocate(210 + 4 + 1996)
    golden.put("ID3".getBytes).put(3.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0x01.toByte).put(0x48.toByte) // syncsafe 200
    golden.position(210)
    golden.put(0xff.toByte)
      .put((0xe0 | (3 << 3) | (1 << 1)).toByte) // MPEG1, Layer III
      .put(((10 << 4) | (2 << 2)).toByte) // bitrate idx 10 = 160kbps, rate idx 2 = 32kHz
      .put(0xc0.toByte) // mono
    val df = Seq((1L, golden.array())).toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "id", "payload")
      .select("meta.sample_rate", "meta.channels", "meta.bits_per_sample",
        "meta.duration_ms", "meta.format")
      .collect()
    // 2000 bytes after sync at 160kbps: 2000*8*1000/160000 = 100 ms
    assert(out(0).toSeq == Seq(32000, 1, 0, 100.0, "mp3"))
  }

  test("mp3Payload round-trips through parseMp3Header; garbage and reserved headers do not") {
    val p = Multimodal.mp3Payload(Array.fill[Byte](1020)(5), 128, 44100)
    // (4 + 1020) bytes at 128kbps = 64 ms
    assert(Multimodal.parseMp3Header(p).contains((44100, 2, 0, 64.0, "mp3")))
    // sync bytes present but reserved version bits (0xe8 -> verBits=1): no parse
    val reserved = Array[Byte](0xff.toByte, 0xeb.toByte, 0x90.toByte, 0x00)
    reserved(1) = (0xe0 | (1 << 3) | (1 << 1)).toByte
    assert(Multimodal.parseMp3Header(reserved).isEmpty)
    assert(Multimodal.parseMp3Header("no sync here at all".getBytes).isEmpty)
    // truncated ID3 tag claiming more bytes than the payload: no parse, no throw
    val lying = Multimodal.mp3Payload(Array.fill[Byte](100)(1)).take(20)
    assert(Multimodal.parseMp3Header(lying).isEmpty)
  }

  test("decodeVideo reads golden MP4 mvhd duration (v0 and v1 layouts, header-only)") {
    val v0 = Multimodal.mp4Payload(Array.fill[Byte](1200)(9), timescale = 600)
    // hand-built v1 mvhd: 64-bit times/duration, timescale 1000, duration 2500
    val mvhdSz = 8 + 4 + 28 + 80
    val moovSz = 8 + mvhdSz
    val v1 = java.nio.ByteBuffer.allocate(16 + moovSz)
    v1.putInt(16).put("ftyp".getBytes).put("mp42".getBytes).putInt(0)
    v1.putInt(moovSz).put("moov".getBytes)
    v1.putInt(mvhdSz).put("mvhd".getBytes)
      .put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // version 1
      .putLong(0L).putLong(0L) // ctime, mtime (64-bit)
      .putInt(1000).putLong(2500L) // timescale, duration (64-bit)
    val df = Seq((1L, v0), (2L, v1.array())).toDF("id", "payload")
    val out = Multimodal.decodeVideo(df, "id", "payload")
      .orderBy("id")
      .select("meta.duration_ms", "meta.timescale", "meta.major_brand", "meta.format")
      .collect()
    assert(out(0).toSeq == Seq(1200 * 1000.0 / 600, 600, "isom", "mp4"))
    assert(out(1).toSeq == Seq(2500.0, 1000, "mp42", "mp4"))
  }

  test("decodeVideo: corrupt box sizes and non-MP4 payloads take the stub, never throw") {
    val good = Multimodal.mp4Payload(Array.fill[Byte](64)(1))
    val corruptSize = good.clone()
    corruptSize(20) = 0; corruptSize(21) = 0; corruptSize(22) = 0; corruptSize(23) = 3 // moov size 3 < header
    val garbage = "definitely not a movie".getBytes
    val truncated = good.take(30)
    val df = Seq((1L, corruptSize), (2L, garbage), (3L, truncated), (4L, garbage))
      .toDF("id", "payload")
    val out = Multimodal.decodeVideo(df, "id", "payload")
      .orderBy("id").select("meta.format").collect()
    assert(out.forall(_.getString(0) == "stub"))
    val stubs = Multimodal.decodeVideo(df, "id", "payload")
      .orderBy("id").select("meta.duration_ms").collect()
    assert(stubs(1).getDouble(0) == stubs(3).getDouble(0)) // deterministic per payload
  }

  test("parseMp4SampleTable reads golden stsz/stts/stss tables (per-entry and fixed-size)") {
    // 150 bytes at 64-byte chunks → 3 samples (64, 64, 22); durations
    // 100, 100, 100 + 150 % 100 = 150; keyframes every 5th → sample 1
    val p = Multimodal.mp4PayloadWithSamples(Array.fill[Byte](150)(7),
      timescale = 600, chunkBytes = 64, keyEvery = 5)
    val Some(s) = Multimodal.parseMp4SampleTable(p)
    assert(s.timescale == 600)
    assert(s.sizes.toSeq == Seq(64L, 64L, 22L))
    assert(s.durations.toSeq == Seq(100L, 100L, 150L))
    assert(s.syncSamples.contains(Set(1L)))
    // fixed-size stsz form (sample_size != 0, no entry table): patch the
    // per-entry box into the fixed form in place — stsz content is at a
    // known offset only in a hand-built payload, so rebuild a minimal one
    val fixedStsz = {
      val bb = java.nio.ByteBuffer.allocate(16 + 8 + 32 + 8 + 8 + 8 + 8 + 20 + 8 + 24)
      val stszSz = 8 + 12 // fixed-size form: no table
      val sttsSz = 8 + 8 + 8
      val stblSz = 8 + stszSz + sttsSz
      val minfSz = 8 + stblSz
      val mdhdSz = 8 + 24
      val mdiaSz = 8 + mdhdSz + minfSz
      val trakSz = 8 + mdiaSz
      val moovSz = 8 + trakSz
      bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
      bb.putInt(moovSz).put("moov".getBytes)
      bb.putInt(trakSz).put("trak".getBytes)
      bb.putInt(mdiaSz).put("mdia".getBytes)
      bb.putInt(mdhdSz).put("mdhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(90000).putInt(1200).putInt(0)
      bb.putInt(minfSz).put("minf".getBytes)
      bb.putInt(stblSz).put("stbl".getBytes)
      bb.putInt(stszSz).put("stsz".getBytes).putInt(0).putInt(512).putInt(4)
      bb.putInt(sttsSz).put("stts".getBytes).putInt(0).putInt(1).putInt(4).putInt(300)
      bb.array()
    }
    val Some(f) = Multimodal.parseMp4SampleTable(fixedStsz)
    assert(f.timescale == 90000)
    assert(f.sizes.toSeq == Seq(512L, 512L, 512L, 512L))
    assert(f.durations.toSeq == Seq(300L, 300L, 300L, 300L))
    assert(f.syncSamples.isEmpty) // no stss → every sample sync
    // corrupt/truncated payloads parse to None, never throw
    assert(Multimodal.parseMp4SampleTable(p.take(40)).isEmpty)
    assert(Multimodal.parseMp4SampleTable("not a movie".getBytes).isEmpty)
    val underCover = p.clone() // stts covering fewer samples than stsz
    // flip the stts entry_count from 2 to 1 (locate the tag by pattern —
    // offset arithmetic is what the parser is for): the surviving run
    // covers 2 of the 3 stsz samples, which must be rejected
    val i = underCover.indexOfSlice("stts".getBytes)
    underCover(i + 11) = 1
    assert(Multimodal.parseMp4SampleTable(underCover).isEmpty)
  }

  test("decodeVideoSamples emits the schedule; sampleFrames picks every-th sample") {
    val data1 = Array.fill[Byte](150)(3) // 3 samples
    val data2 = Array.fill[Byte](64)(4)  // 1 sample
    val df = Seq((1L, data1), (2L, data2), (3L, "garbage".getBytes))
      .toDF("id", "payload")
    val env = Multimodal.synthesizeMp4WithSamples(df.filter(col("id") < 3L), "id", "payload")
      .union(df.filter(col("id") === 3L)) // id 3 stays unparseable
    val out = Multimodal.decodeVideoSamples(env, "id", "payload")
      .orderBy("id", "sample_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(out.count(_._1 == 1L) == 3 && out.count(_._2 == 1L) == 2)
    assert(out.filter(_._1 == 3L).isEmpty) // unparseable → zero rows
    val s2 = out.filter(t => t._1 == 1L && t._2 == 2L).head
    assert(s2._3 == 64L && s2._4 == 100L && s2._5 == 100L &&
      math.abs(s2._6 - 100 * 1000.0 / 600) < 1e-9 && !s2._7)
    val last = out.filter(_._1 == 1L).last
    assert(last._4 == 150L && last._5 == 200L) // 100 + 150 % 100; dts cumsum
    // frame sampling: every 2nd sample, so samples 1 and 3 for id 1
    val frames = Multimodal.sampleFrames(env, "id", "payload", maxFrames = 10, every = 2)
      .select("id", "sample_no", "frame_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(frames == Set((1L, 1L, 0), (1L, 3L, 1), (2L, 1L, 0)))
  }

  test("flacPayload round-trips through parseFlacHeader; garbage does not") {
    val body = Array.tabulate(4410)(_.toByte) // 4410 "samples" at 44.1k = 100 ms
    val p = Multimodal.flacPayload(body, 44100, 2, 16)
    val Some((rate, ch, bits, durMs, fmt)) = Multimodal.parseFlacHeader(p)
    assert(rate == 44100 && ch == 2 && bits == 16 && fmt == "flac")
    assert(math.abs(durMs - 100.0) < 1e-9)
    // odd geometry exercises every bit boundary in the packed fields
    val q = Multimodal.flacPayload(Array.fill(7)(1.toByte), 96000, 7, 24)
    val Some((r2, c2, b2, d2, _)) = Multimodal.parseFlacHeader(q)
    assert(r2 == 96000 && c2 == 7 && b2 == 24)
    assert(math.abs(d2 - 7000.0 / 96000.0) < 1e-9)
    assert(Multimodal.parseFlacHeader("fLaX garbage".getBytes).isEmpty)
    assert(Multimodal.parseFlacHeader(p.take(20)).isEmpty) // truncated STREAMINFO
  }

  test("webpPayload round-trips through parseWebpHeader; VP8/VP8L layouts parse") {
    val p = Multimodal.webpPayload(Array.fill(5)(9.toByte), 640, 360, alpha = true)
    assert(Multimodal.parseWebpHeader(p).contains((640, 360, 4, "webp")))
    val noAlpha = Multimodal.webpPayload(Array.emptyByteArray, 1, 1, alpha = false)
    assert(Multimodal.parseWebpHeader(noAlpha).contains((1, 1, 3, "webp")))
    // hand-built lossy VP8 chunk: keyframe start code then 14-bit dims
    val vp8 = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(24).put("WEBP".getBytes)
      .put("VP8 ".getBytes).putInt(12)
      .put(Array[Byte](0, 0, 0)).put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
      .putShort(320.toShort).putShort(240.toShort).array()
    assert(Multimodal.parseWebpHeader(vp8).contains((320, 240, 3, "webp")))
    // hand-built lossless VP8L: signature 0x2f + packed 14-bit dims + alpha bit
    val bits = (799L & 0x3fff) | ((599L & 0x3fff) << 14) | (1L << 28)
    val vp8l = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes).putInt(17).put("WEBP".getBytes)
      .put("VP8L".getBytes).putInt(5)
      .put(0x2f.toByte).putInt(bits.toInt).array()
    assert(Multimodal.parseWebpHeader(vp8l).contains((800, 600, 4, "webp")))
    assert(Multimodal.parseWebpHeader("RIFFxxxxWAVE".getBytes).isEmpty)
    // decodeImages routes WebP through the real parse, not the stub
    val enveloped = Multimodal.synthesizeWebp(payloads, "id", "payload")
    val out = Multimodal.decodeImages(enveloped, "id", "payload")
      .select("meta.format").collect().map(_.getString(0))
    assert(out.forall(_ == "webp"))
  }

  // ---- PNG codec: real pixels end to end ----

  private def gradientPx(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      px((y * w + x) * ch + c) = (f(x, y, c) & 0xff).toByte
    px
  }

  test("PNG round-trip: every filter type x every channel count recovers exact pixels") {
    for (ch <- Seq(1, 3, 4); f <- 0 to 4) {
      val w = 13; val h = 7
      val px = gradientPx(w, h, ch)((x, y, c) => x * 41 + y * 59 + c * 17 + f * 3)
      val parsed = Multimodal.parsePng(Multimodal.pngPayload(px, w, h, ch, _ => f))
      assert(parsed.isDefined, s"ch=$ch f=$f")
      val (pw, ph, pch, out) = parsed.get
      assert((pw, ph, pch) == ((w, h, ch)))
      assert(out.toSeq == px.toSeq, s"ch=$ch f=$f")
    }
  }

  test("PNG cross-validation against the JDK's independent imageio codec, both directions") {
    // our encoder -> JDK decoder
    val w = 19; val h = 11
    val px = gradientPx(w, h, 3)((x, y, c) => x * 7 + y * 13 + c * 29)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.pngPayload(px, w, h, 3)))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == (px(base) & 0xff) &&
        ((rgb >> 8) & 0xff) == (px(base + 1) & 0xff) &&
        (rgb & 0xff) == (px(base + 2) & 0xff), s"($x,$y)")
    }
    // JDK encoder -> our decoder (independent filter choices exercise de-filtering)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y,
        (((x * 7 + y * 13) & 0xff) << 16) | (((x * 3) & 0xff) << 8) | ((y * 5) & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val parsed = Multimodal.parsePng(bos.toByteArray)
    assert(parsed.isDefined)
    val (pw, ph, pch, out) = parsed.get
    assert(pw == w && ph == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = bi.getRGB(x, y)
      val base = (y * w + x) * pch
      assert((out(base) & 0xff) == ((rgb >> 16) & 0xff) &&
        (out(base + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (out(base + 2) & 0xff) == (rgb & 0xff), s"($x,$y)")
    }
  }

  test("parsePng rejects corruption: truncation, bit flips (CRC), garbage, hostile geometry") {
    val px = gradientPx(9, 5, 3)((x, y, c) => x + y + c)
    val good = Multimodal.pngPayload(px, 9, 5, 3)
    assert(Multimodal.parsePng(good).isDefined)
    assert(Multimodal.parsePng(good.take(good.length - 7)).isEmpty) // truncated IEND
    assert(Multimodal.parsePng(good.take(30)).isEmpty)              // truncated IHDR
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x01).toByte
    assert(Multimodal.parsePng(flipped).isEmpty) // CRC catches payload corruption
    assert(Multimodal.parsePng("not a png at all".getBytes).isEmpty)
    // conformant-looking header claiming a 2^30-pixel canvas: must refuse,
    // not allocate
    val hostile = good.clone()
    // IHDR width field lives at bytes 16..19 (sig 8 + len 4 + type 4)
    hostile(16) = 0x40.toByte; hostile(17) = 0; hostile(18) = 0; hostile(19) = 0
    assert(Multimodal.parsePng(hostile).isEmpty) // (also fails CRC — either guard suffices)
  }

  test("decodeImagePixels: stats match a hand computation; garbage row yields null stats") {
    val w = 4; val h = 3
    val px = gradientPx(w, h, 1)((x, y, _) => x + 10 * y)
    val df = Seq((1L, Multimodal.pngPayload(px, w, h, 1)),
      (2L, "junk-not-an-image".getBytes)).toDF("id", "payload")
    val rows = Multimodal.decodeImagePixels(df, "id", "payload").orderBy("id").collect()
    val vals = (0 until w * h).map(i => px(i) & 0xff)
    assert(rows(0).getInt(1) == w && rows(0).getInt(2) == h && rows(0).getInt(3) == 1)
    assert(rows(0).getLong(4) == vals.sum.toLong)
    assert(rows(0).getLong(5) ==
      vals.zipWithIndex.map { case (v, i) => (v + 1L) * (i + 1L) }.sum)
    assert(rows(0).getInt(6) == vals.min && rows(0).getInt(7) == vals.max)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(4) && rows(1).isNullAt(6))
  }

  test("decodeImagePixels reads JPEG pixels via the imageio fallback") {
    val bi = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) bi.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val r = Multimodal.decodeImagePixels(df, "id", "payload").collect().head
    assert(r.getInt(1) == 8 && r.getInt(2) == 6 && r.getInt(3) == 3)
    // JPEG is lossy: a flat gray image decodes to values near 0x80
    val mean = r.getLong(4).toDouble / (8 * 6 * 3)
    assert(math.abs(mean - 128.0) < 8.0)
  }

  test("resizeImages nearest: 2x2 -> 4x4 block-replicates; bilinear constant stays constant") {
    val px2 = Array[Byte](10, 20, 30, 40) // 2x2 gray
    val df = Seq((1L, Multimodal.pngPayload(px2, 2, 2, 1))).toDF("id", "payload")
    val up = Multimodal.resizeImages(df, "id", "payload", 4, 4, "nearest")
    val parsed = Multimodal.parsePng(up.collect().head.getAs[Array[Byte]]("payload")).get
    assert(parsed._1 == 4 && parsed._2 == 4 && parsed._3 == 1)
    val expect = Seq(10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40)
    assert(parsed._4.map(_ & 0xff).toSeq == expect)
    val const = Array.fill[Byte](6 * 4)(77)
    val dfc = Seq((1L, Multimodal.pngPayload(const, 6, 4, 1))).toDF("id", "payload")
    val bl = Multimodal.resizeImages(dfc, "id", "payload", 5, 3, "bilinear")
    val parsedBl = Multimodal.parsePng(bl.collect().head.getAs[Array[Byte]]("payload")).get
    assert(parsedBl._4.forall(b => (b & 0xff) == 77))
    // undecodable input -> null payload through, row survives
    val bad = Seq((9L, "zzz".getBytes)).toDF("id", "payload")
    assert(Multimodal.resizeImages(bad, "id", "payload", 4, 4).collect().head.isNullAt(1))
  }

  test("imageDHash: gradient directions give all-ones/all-zeros signatures") {
    val w = 18; val h = 16
    val inc = gradientPx(w, h, 1)((x, _, _) => x * 10)
    val dec = gradientPx(w, h, 1)((x, _, _) => 250 - x * 10)
    val df = Seq((1L, Multimodal.pngPayload(inc, w, h, 1)),
      (2L, Multimodal.pngPayload(dec, w, h, 1)),
      (3L, "garbage".getBytes)).toDF("id", "payload")
    val sigs = Multimodal.imageDHash(df, "id", "payload").orderBy("id").collect()
    assert(sigs(0).getLong(1) == -1L) // right neighbor always brighter: all 64 bits
    assert(sigs(1).getLong(1) == 0L)
    assert(sigs(2).isNullAt(1))
  }

  test("pngFixture same-group images are near-duplicates, cross-group are not") {
    val df = Seq(7L, 57L, 107L, 8L).toDF("id") // 7,57,107 share group id%50=7
    val pngs = Multimodal.synthesizePng(df, "id", "payload")
    val sigs = Multimodal.imageDHash(pngs, "id", "payload").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(7L, 57L) <= 8 && ham(7L, 107L) <= 8 && ham(57L, 107L) <= 8)
    assert(ham(7L, 8L) > 12)
  }

  test("hammingPairs over explicit signatures: radius respected, null sigs drop") {
    val sigs = Seq(
      (1L, java.lang.Long.valueOf(0L)),
      (2L, java.lang.Long.valueOf(0xffL)), // hamming 8 from id 1
      (3L, java.lang.Long.valueOf(0x7fL)), // hamming 7 from 1, 1 from 2
      (4L, null.asInstanceOf[java.lang.Long])).toDF("id", "sig")
    val pairs = Dedup.hammingPairs(sigs, "sig", "id", maxHamming = 8)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 8), (1L, 3L, 7), (2L, 3L, 1)))
  }
}
