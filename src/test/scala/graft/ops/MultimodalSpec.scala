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

  test("frameSampleStub explodes sampled frame indices per payload") {
    val out = Multimodal.frameSampleStub(payloads, "id", maxFrames = 10, every = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSet == Set(1L, 2L).flatMap(id => Seq(0, 3, 6, 9).map(f => (id, f))))
  }
}
