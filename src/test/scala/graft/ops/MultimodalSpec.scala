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

  test("frameSampleStub explodes sampled frame indices per payload") {
    val out = Multimodal.frameSampleStub(payloads, "id", maxFrames = 10, every = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSet == Set(1L, 2L).flatMap(id => Seq(0, 3, 6, 9).map(f => (id, f))))
  }
}
