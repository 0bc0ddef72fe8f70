package graft.ops

import graft.ops.Flac.FlacAudio

/** FLAC codec: lossless round trips through every stereo decorrelation
  * mode and subframe type the encoder emits, hand-built bitstream
  * vectors for the decode-only paths (LPC, rice2, wasted bits), CRC /
  * MD5 integrity rejection, and the fixture↔closed-form agreement the
  * q_mm_flac_pcm gate's oracle relies on.
  */
class FlacSpec extends graft.SparkTestBase {

  private def rt(a: FlacAudio, blockSize: Int = 1024): FlacAudio = {
    val enc = Flac.encode(a, blockSize)
    val dec = Flac.decode(enc)
    assert(dec.isDefined, s"round trip failed: rate=${a.sampleRate} ch=${a.channels} n=${a.numSamples}")
    dec.get
  }

  private def assertSame(a: FlacAudio, b: FlacAudio): Unit = {
    assert(b.sampleRate == a.sampleRate && b.channels == a.channels &&
      b.bitsPerSample == a.bitsPerSample && b.numSamples == a.numSamples)
    for (c <- 0 until a.channels)
      assert(java.util.Arrays.equals(a.samples(c), b.samples(c)), s"channel $c differs")
  }

  private def seededNoise(seed: Long, n: Int, amp: Int): Array[Int] = {
    val rnd = new java.util.Random(seed)
    Array.fill(n)(rnd.nextInt(2 * amp + 1) - amp)
  }

  test("mono round trip: ramp+noise, pure noise (verbatim regime), constant") {
    val n = 3000
    val ramp = Array.tabulate(n)(i => 2 * i - n + (i % 7) - 3)
    assertSame(FlacAudio(44100, 1, 16, Array(ramp)), rt(FlacAudio(44100, 1, 16, Array(ramp))))
    val noise = seededNoise(7, n, 30000)
    assertSame(FlacAudio(48000, 1, 16, Array(noise)), rt(FlacAudio(48000, 1, 16, Array(noise))))
    val const = Array.fill(n)(-12345)
    assertSame(FlacAudio(8000, 1, 16, Array(const)), rt(FlacAudio(8000, 1, 16, Array(const))))
  }

  test("stereo round trip across correlation regimes (drives all four channel modes)") {
    val n = 2048
    // near-identical channels → mid/side or left/side wins
    val l1 = Array.tabulate(n)(i => 100 + 3 * i % 20000)
    val r1 = Array.tabulate(n)(i => 102 + 3 * i % 20000)
    assertSame(FlacAudio(44100, 2, 16, Array(l1, r1)), rt(FlacAudio(44100, 2, 16, Array(l1, r1))))
    // one quiet channel → left/side or right/side
    val l2 = seededNoise(1, n, 20000)
    val r2 = Array.tabulate(n)(i => i % 5)
    assertSame(FlacAudio(44100, 2, 16, Array(l2, r2)), rt(FlacAudio(44100, 2, 16, Array(l2, r2))))
    assertSame(FlacAudio(44100, 2, 16, Array(r2, l2)), rt(FlacAudio(44100, 2, 16, Array(r2, l2))))
    // independent loud noise → independent
    val l3 = seededNoise(2, n, 30000)
    val r3 = seededNoise(3, n, 30000)
    assertSame(FlacAudio(44100, 2, 16, Array(l3, r3)), rt(FlacAudio(44100, 2, 16, Array(l3, r3))))
  }

  test("multichannel, odd block sizes, tail frames, bps 8 and 24") {
    // 4 channels, n not a multiple of blockSize → tail frame
    val n = 1000
    val chans4 = Array.tabulate(4)(c => Array.tabulate(n)(i => (c + 1) * i % 3000 - 1500))
    assertSame(FlacAudio(16000, 4, 16, chans4), rt(FlacAudio(16000, 4, 16, chans4), blockSize = 192))
    // bps 8: small amplitudes
    val a8 = FlacAudio(22050, 1, 8, Array(Array.tabulate(777)(i => i % 200 - 100)))
    assertSame(a8, rt(a8, blockSize = 256))
    // bps 24: large amplitudes
    val a24 = FlacAudio(96000, 2, 24, Array(
      Array.tabulate(900)(i => 40000 * (i % 300) - 6000000),
      Array.tabulate(900)(i => 40000 * (i % 300) - 5999000)))
    assertSame(a24, rt(a24, blockSize = 576))
    // non-table rate → sample-rate code 0 (STREAMINFO) header path
    val aOdd = FlacAudio(11025, 1, 16, Array(Array.tabulate(500)(i => 5 * i - 1250)))
    assertSame(aOdd, rt(aOdd, blockSize = 4096))
  }

  test("fixture agrees with the closed form and round-trips exactly (gate premise)") {
    for (id <- 0L until 100L) {
      val a = Multimodal.audioPcmFixture(id)
      val g = math.floorMod(id, 50L).toInt
      assert(a.sampleRate == Array(8000, 16000, 22050, 44100, 11025)(g % 5))
      assert(a.channels == 1 + g % 2)
      assert(a.numSamples == 400 + g * 13)
      val slope = g % 7 - 3
      val base = math.floorMod(id, 997L).toInt - 498
      for (c <- 0 until a.channels; i <- Seq(0, 1, a.numSamples / 2, a.numSamples - 1)) {
        val expect = slope * i + base +
          math.floorMod(id * 31L + c * 7919L + i * 104729L, 23L).toInt - 11
        assert(a.samples(c)(i) == expect, s"id=$id c=$c i=$i")
      }
      val dec = Flac.decode(Flac.encode(a, blockSize = 256))
      assert(dec.isDefined, s"id=$id fixture stream failed decode")
      assertSame(a, dec.get)
    }
  }

  test("fixture streams genuinely compress (FIXED+Rice actually engaged, not verbatim)") {
    // linear-ramp signal: if every subframe fell back to VERBATIM the
    // stream would be >= 2 bytes/sample; FIXED order>=1 + Rice must
    // beat half that comfortably
    val sizes = (0L until 50L).map { id =>
      val a = Multimodal.audioPcmFixture(id)
      val raw = a.numSamples * a.channels * 2
      Flac.encode(a, blockSize = 256).length.toDouble / raw
    }
    assert(sizes.max < 0.75, s"worst compression ratio ${sizes.max} — Rice path not engaged?")
  }

  // ------------------------------------------------------ hand-built decode-only paths

  /** Minimal stream builder for decode-only paths: STREAMINFO + one
    * frame whose subframe bits are supplied by `body` (already including
    * the subframe header). CRCs are computed over the assembled bytes —
    * the hand-built frames are CRC-valid by construction.
    */
  private def handStream(rate: Int, channels: Int, bps: Int, n: Int,
                         md5OfPcm: Option[Array[Array[Int]]],
                         bodyBits: Seq[(Long, Int)]): Array[Byte] = {
    val bits = new scala.collection.mutable.ArrayBuffer[(Long, Int)]
    def put(v: Long, b: Int): Unit = bits += ((v, b))
    // frame header: sync, fixed blocking, 16-bit-1 blocksize, rate code 0,
    // independent channels, bps from STREAMINFO, frame 0
    put(0x3ffe, 14); put(0, 1); put(0, 1)
    put(7, 4)          // blocksize: 16-bit at end
    put(0, 4)          // rate: STREAMINFO
    put(channels - 1, 4)
    put(0, 3)          // bps: STREAMINFO
    put(0, 1)
    put(0, 8)          // UTF-8 frame number 0
    put(n - 1, 16)     // blocksize-1
    // assemble header bytes to CRC them
    def assemble(bs: Seq[(Long, Int)]): Array[Byte] = {
      var acc = 0L; var nb = 0
      val out = new scala.collection.mutable.ArrayBuffer[Byte]
      for ((v, b) <- bs) {
        acc = (acc << b) | (v & ((1L << b) - 1)); nb += b
        while (nb >= 8) { nb -= 8; out += ((acc >>> nb) & 0xff).toByte }
      }
      if (nb > 0) out += ((acc << (8 - nb)) & 0xff).toByte
      out.toArray
    }
    val header = assemble(bits.toSeq)
    def crc8(p: Array[Byte]): Int = {
      var c = 0
      for (b <- p) { c = c ^ (b & 0xff); for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff }
      c
    }
    val withCrc8 = bits.toSeq :+ ((crc8(header).toLong, 8))
    // body + byte-align pad
    val all = withCrc8 ++ bodyBits
    val totalBits = all.map(_._2).sum
    val pad = (8 - totalBits % 8) % 8
    val padded = if (pad > 0) all :+ ((0L, pad)) else all
    val frameNoCrc = assemble(padded)
    def crc16(p: Array[Byte]): Int = {
      var c = 0
      for (b <- p) { c = c ^ ((b & 0xff) << 8); for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff }
      c
    }
    val frame = frameNoCrc ++ Array(((crc16(frameNoCrc) >> 8) & 0xff).toByte, (crc16(frameNoCrc) & 0xff).toByte)
    // STREAMINFO envelope
    val si = new Array[Byte](8 + 34)
    "fLaC".getBytes("US-ASCII").copyToArray(si, 0)
    si(4) = 0x80.toByte; si(7) = 34
    val o = 8
    si(o) = 0x10; si(o + 2) = 0x10 // min/max block 4096 (frames self-describe)
    si(o + 10) = ((rate >> 12) & 0xff).toByte
    si(o + 11) = ((rate >> 4) & 0xff).toByte
    si(o + 12) = (((rate & 0xf) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4)).toByte
    si(o + 13) = ((((bps - 1) & 0xf) << 4) | 0).toByte
    si(o + 14) = 0; si(o + 15) = 0
    si(o + 16) = ((n >> 8) & 0xff).toByte
    si(o + 17) = (n & 0xff).toByte
    md5OfPcm.foreach { pcm =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytesPer = (bps + 7) / 8
      for (i <- 0 until n; c <- pcm.indices; b <- 0 until bytesPer)
        md.update(((pcm(c)(i) >> (8 * b)) & 0xff).toByte)
      md.digest().copyToArray(si, o + 18)
    }
    si ++ frame
  }

  test("hand-built LPC subframe decodes to the closed-form prediction") {
    // order-2 LPC: coef = [3, -1], shift = 1  →  x[i] = r[i] + ((3·x[i-1] − x[i-2]) >> 1)
    val n = 32
    val warm = Array(100, 103)
    val res = Array.tabulate(n - 2)(i => (i % 5) - 2)
    val expected = new Array[Int](n)
    expected(0) = 100; expected(1) = 103
    for (i <- 2 until n)
      expected(i) = res(i - 2) + ((3 * expected(i - 1) - expected(i - 2)) >> 1)
    val body = Seq[(Long, Int)](
      (0, 1), (0x21, 6), (0, 1),      // LPC order 2 (100000|1), no wasted bits
      (warm(0), 16), (warm(1), 16),   // warmup
      (3, 4),                          // precision-1 = 3 → 4 bits
      (1, 5),                          // shift = 1
      (3, 4), (-1 & 0xf, 4)            // coefficients, 4-bit signed
    ) ++ {
      // residual: method 0, partition order 0, rice k=2
      Seq[(Long, Int)]((0, 2), (0, 4), (2, 4)) ++ res.flatMap { r =>
        val z = (r << 1) ^ (r >> 31)
        val q = z >>> 2
        Seq[(Long, Int)]((1, q + 1), (z & 3, 2)) // unary(q) then 2 low bits
      }
    }
    val stream = handStream(44100, 1, 16, n, Some(Array(expected)), body)
    val dec = Flac.decode(stream)
    assert(dec.isDefined, "LPC stream rejected")
    assert(java.util.Arrays.equals(dec.get.samples(0), expected))
  }

  test("hand-built rice2 (5-bit params) and wasted-bits subframes decode") {
    val n = 16
    // verbatim subframe with 2 wasted bits: coded at bps-2, output <<2
    val vals = Array.tabulate(n)(i => (i - 8) * 4) // all divisible by 4
    val body = Seq[(Long, Int)](
      (0, 1), (1, 6),          // VERBATIM
      (1, 1), (1, 2)           // wasted-bits flag, unary 1 zero + stop → wasted = 2
    ) ++ vals.map(v => ((v >> 2).toLong, 14))
    val stream = handStream(8000, 1, 16, n, Some(Array(vals)), body)
    val dec = Flac.decode(stream)
    assert(dec.isDefined, "wasted-bits stream rejected")
    assert(java.util.Arrays.equals(dec.get.samples(0), vals))

    // FIXED order 0 with rice2 method: residuals ARE the samples
    val vals2 = Array.tabulate(n)(i => i - 8)
    val body2 = Seq[(Long, Int)](
      (0, 1), (0x08, 6), (0, 1), // FIXED order 0
      (1, 2), (0, 4), (1, 5)     // method 1 (rice2), po 0, k=1 in 5 bits
    ) ++ vals2.flatMap { r =>
      val z = (r << 1) ^ (r >> 31)
      Seq[(Long, Int)]((1, (z >>> 1) + 1), (z & 1, 1))
    }
    val stream2 = handStream(8000, 1, 16, n, Some(Array(vals2)), body2)
    val dec2 = Flac.decode(stream2)
    assert(dec2.isDefined, "rice2 stream rejected")
    assert(java.util.Arrays.equals(dec2.get.samples(0), vals2))
  }

  test("integrity: corrupt CRCs, wrong MD5, truncation and garbage all reject (no throw)") {
    val a = Multimodal.audioPcmFixture(3)
    val good = Flac.encode(a, blockSize = 256)
    assert(Flac.decode(good).isDefined)
    // flip a bit in the middle of the first frame's residuals → CRC-16 mismatch
    val bad1 = good.clone(); bad1(60) = (bad1(60) ^ 0x10).toByte
    assert(Flac.decode(bad1).isEmpty, "corrupt frame body accepted")
    // corrupt the STREAMINFO MD5 → stream decodes but MD5 gate rejects
    val bad2 = good.clone(); bad2(8 + 20) = (bad2(8 + 20) ^ 0xff).toByte
    assert(Flac.decode(bad2).isEmpty, "wrong MD5 accepted")
    // truncate mid-frame
    assert(Flac.decode(good.take(good.length / 2)).isEmpty, "truncated stream accepted")
    // garbage and empty
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
    assert(Flac.decode(Array.fill(100)(0x5a.toByte)).isEmpty)
    // huge declared totalSamples on a tiny payload must reject, not allocate
    val tiny = good.take(42).clone()
    tiny(8 + 13) = 0x0f.toByte; tiny(8 + 14) = 0xff.toByte // totalSamples huge
    assert(Flac.decode(tiny).isEmpty)
  }

  test("encoded streams parse with the header-only STREAMINFO reader (geometry agreement)") {
    for (id <- 0L until 20L) {
      val a = Multimodal.audioPcmFixture(id)
      val enc = Flac.encode(a, blockSize = 256)
      val meta = Multimodal.parseFlacHeader(enc)
      assert(meta.isDefined)
      val (rate, ch, bits, durMs, fmt) = meta.get
      assert(rate == a.sampleRate && ch == a.channels && bits == 16 && fmt == "flac")
      assert(math.abs(durMs - a.numSamples * 1000.0 / a.sampleRate) < 1e-6)
    }
  }

  test("parseWavPcm round-trips the WAV fixture and rejects non-PCM") {
    for (id <- 0L until 20L) {
      val a = Multimodal.audioPcmFixture(id)
      val bytes = new Array[Byte](a.numSamples * a.channels * 2)
      for (i <- 0 until a.numSamples; c <- 0 until a.channels) {
        val v = a.samples(c)(i); val o = (i * a.channels + c) * 2
        bytes(o) = (v & 0xff).toByte; bytes(o + 1) = ((v >> 8) & 0xff).toByte
      }
      val wav = Multimodal.wavPayload(bytes, a.sampleRate, a.channels, 16)
      val dec = Multimodal.parseWavPcm(wav)
      assert(dec.isDefined)
      assertSame(FlacAudio(a.sampleRate, a.channels, 16, a.samples), dec.get)
    }
    // 8-bit WAV → None (16-bit-only subset)
    val wav8 = Multimodal.wavPayload(Array[Byte](1, 2, 3, 4), 8000, 1, 8)
    assert(Multimodal.parseWavPcm(wav8).isEmpty)
  }

  test("resampleAudio: WAV in → nearest 4 kHz → FLAC out matches the index closed form") {
    val df = spark.range(0, 30).toDF("doc_id")
    val wavs = Multimodal.synthesizeWavPcm(df, "doc_id", "payload")
    val res = Multimodal.resampleAudio(wavs, "doc_id", "payload", dstRate = 4000)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for (id <- 0L until 30L) {
      val a = Multimodal.audioPcmFixture(id)
      val dec = Flac.decode(res(id))
      assert(dec.isDefined, s"id=$id resampled stream undecodable")
      val b = dec.get
      val m = (a.numSamples.toLong * 4000 / a.sampleRate).toInt
      assert(b.sampleRate == 4000 && b.channels == a.channels && b.numSamples == m)
      for (c <- 0 until a.channels; i <- 0 until m) {
        val si = math.min(a.numSamples - 1, (i.toLong * a.sampleRate / 4000).toInt)
        assert(b.samples(c)(i) == a.samples(c)(si), s"id=$id c=$c i=$i")
      }
    }
  }

  test("decodeAudioPcm over a DataFrame: FLAC and WAV fixtures produce identical stats") {
    val df = spark.range(0, 40).toDF("doc_id")
    val viaFlac = Multimodal.decodeAudioPcm(
      Multimodal.synthesizeFlacPcm(df, "doc_id", "payload"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    val viaWav = Multimodal.decodeAudioPcm(
      Multimodal.synthesizeWavPcm(df, "doc_id", "payload"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(viaFlac.length == 40 && viaWav.length == 40)
    for ((f, w) <- viaFlac.zip(viaWav)) {
      assert(f.getInt(1) == w.getInt(1))   // sample_rate
      assert(f.getInt(2) == w.getInt(2))   // channels
      assert(f.getLong(4) == w.getLong(4)) // n_samples
      assert(f.getLong(5) == w.getLong(5)) // sum_val
      assert(f.getLong(6) == w.getLong(6)) // sample_checksum
      assert(f.getInt(7) == w.getInt(7) && f.getInt(8) == w.getInt(8))
    }
  }
}
