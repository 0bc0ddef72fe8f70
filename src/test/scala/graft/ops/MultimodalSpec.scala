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

  test("frameSampleStub explodes sampled frame indices per payload") {
    val out = Multimodal.frameSampleStub(payloads, "id", maxFrames = 10, every = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSet == Set(1L, 2L).flatMap(id => Seq(0, 3, 6, 9).map(f => (id, f))))
  }
}
