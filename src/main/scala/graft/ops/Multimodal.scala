package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed batch-wise with mapPartitions.
  *
  * The container has no codec libraries, so the DECODE step itself is a
  * deterministic stub (clearly marked) — everything around it is real and
  * load-bearing: the schema contract, per-partition batching, encoder
  * round-trip, and partition sizing are exactly what a production decode
  * (libjpeg/ffmpeg via JNI, or mapInPandas on PySpark) plugs into.
  *
  * Scale: payloads never shuffle through these ops — mapPartitions is
  * narrow; keep `spark.sql.files.maxPartitionBytes` at 128-256 MB so a
  * partition of payloads fits executor memory.
  */
object Multimodal {

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("format", StringType)))

  /** Image metadata decode. REAL for formats the JDK's javax.imageio
    * recognizes (PNG, JPEG, GIF, BMP — header-only read: width/height/
    * component count come from the stream metadata, the pixel payload is
    * never decoded, so cost is O(header) not O(pixels)); payloads no
    * reader claims fall back to the deterministic pseudo-metadata stub
    * (kept so non-image test payloads and exotic codecs — which would
    * need native libs absent from this container — still flow through
    * the pipeline deterministically).
    */
  private def decodeOne(payload: Array[Byte]): (Int, Int, Int, String) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val types = r.getImageTypes(0)
          val channels =
            if (types != null && types.hasNext) types.next().getNumComponents else 3
          (w, h, channels, r.getFormatName.toLowerCase)
        } finally r.dispose()
      } else {
        // deterministic stub for unrecognized payloads (FNV-1a over bytes)
        val hsh = payload.foldLeft(1469598103934665603L)((a, b) => (a ^ (b & 0xff)) * 1099511628211L)
        val w = 64 + math.floorMod(hsh, 1024).toInt
        val ht = 64 + math.floorMod(hsh >> 16, 1024).toInt
        (w, ht, 3, if (math.floorMod(hsh, 2) == 0) "jpeg" else "png")
      }
    } finally iis.close()
  }

  /** Attach decoded metadata to a (id, payload) frame. Batch shape: one
    * decode call per row inside a single partition iterator — no
    * per-row task or encoder setup cost.
    */
  def decodeImages(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("n_bytes", LongType),
      StructField("meta", imageMetaType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, c, fmt) = decodeOne(payload)
        Row(r.get(idIdx), payload.length.toLong, Row(w, h, c, fmt))
      }
    }(enc)
  }

  /** STUB resize: emits the target geometry (a real impl transforms the
    * payload); demonstrates metadata-preserving payload transforms.
    */
  def resizeStub(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame =
    df.withColumn("resize_target", struct(lit(w).as("width"), lit(h).as("height")))

  /** Frame sampling plumbing for video payloads: emit every `every`-th
    * frame index up to `maxFrames` as (id, frame_no) rows — the schema and
    * explode shape a real ffmpeg sampler produces.
    */
  def frameSampleStub(df: DataFrame, idCol: String, maxFrames: Int, every: Int): DataFrame =
    df.select(col(idCol),
      explode(sequence(lit(0), lit(maxFrames - 1), lit(every))).as("frame_no"))
}
