package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed batch-wise with mapPartitions.
  *
  * Decode is REAL where no native codec is needed: image geometry via
  * javax.imageio header reads (PNG/JPEG/GIF/BMP) and audio geometry via
  * a pure-JVM RIFF/WAVE chunk parse. Compressed codecs (mp3/flac/video)
  * would need native libs absent from this container, so those payloads
  * take a clearly-marked deterministic stub — everything around it is
  * real and load-bearing: the schema contract, per-partition batching,
  * encoder round-trip, and partition sizing are exactly what a
  * production decode (libjpeg/ffmpeg via JNI, or mapInPandas on
  * PySpark) plugs into.
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

  /** FNV-1a over the payload bytes — the seed for every deterministic
    * stub below, so unrecognized payloads still flow through the pipeline
    * reproducibly.
    */
  private def fnv1a(payload: Array[Byte]): Long =
    payload.foldLeft(1469598103934665603L)((a, b) => (a ^ (b & 0xff)) * 1099511628211L)

  private def imageStub(payload: Array[Byte]): (Int, Int, Int, String) = {
    val hsh = fnv1a(payload)
    val w = 64 + math.floorMod(hsh, 1024).toInt
    val ht = 64 + math.floorMod(hsh >> 16, 1024).toInt
    (w, ht, 3, if (math.floorMod(hsh, 2) == 0) "jpeg" else "png")
  }

  /** Image metadata decode. REAL for formats the JDK's javax.imageio
    * recognizes (PNG, JPEG, GIF, BMP — header-only read: width/height/
    * component count come from the stream metadata, the pixel payload is
    * never decoded, so cost is O(header) not O(pixels)); payloads no
    * reader claims — and payloads a reader claims by magic bytes but then
    * chokes on (truncated/corrupt files are a fact of life in a messy
    * corpus, and one bad row must not fail a 100 TB job) — fall back to
    * the deterministic pseudo-metadata stub. The input stream is a
    * MemoryCacheImageInputStream: the ImageIO factory default writes a
    * disk-cache temp file PER ROW, pure overhead for byte-array payloads.
    */
  private def decodeOne(payload: Array[Byte]): (Int, Int, Int, String) = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
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
        } catch {
          case scala.util.control.NonFatal(_) => imageStub(payload)
        } finally r.dispose()
      } else imageStub(payload)
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
        // null payloads are as much a fact of a messy corpus as corrupt
        // ones: route them through the same deterministic-stub path
        // (seeded from the empty array, n_bytes=0) instead of NPE-ing
        // the whole job on one bad row.
        val raw = r.getAs[Array[Byte]](payloadIdx)
        val payload = if (raw == null) Array.emptyByteArray else raw
        val (w, h, c, fmt) = decodeOne(payload)
        Row(r.get(idIdx), payload.length.toLong, Row(w, h, c, fmt))
      }
    }(enc)
  }

  val audioMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("format", StringType)))

  /** Pure-JVM RIFF/WAVE header parse — no codec libraries involved, so
    * this modality is REAL in this container (unlike mp3/flac/video,
    * which need native decoders). Walks the chunk list for `fmt ` and
    * `data`; cost is O(header), the sample payload is never touched.
    * Returns (sampleRate, channels, bitsPerSample, durationMs, "wav"),
    * or None when the payload is not a parseable PCM WAV (wrong magic,
    * truncated fmt chunk, zero byte rate) — never throws on garbage.
    */
  private[ops] def parseWavHeader(p: Array[Byte]): Option[(Int, Int, Int, Double, String)] = {
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(p, o, 4, "US-ASCII")
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var fmt: Option[(Int, Int, Int, Long)] = None // channels, rate, bits, byteRate
    var dataSize: Option[Long] = None
    while (off + 8 <= p.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val o = off.toInt
      val id = tag(o)
      val sz = le32(o + 4)
      if (id == "fmt " && o + 24 <= p.length)
        fmt = Some((le16(o + 10), le32(o + 12).toInt, le16(o + 22), le32(o + 16)))
      // data size comes from the header, so a payload truncated mid-data
      // still reports its declared duration (header-only contract)
      if (id == "data") dataSize = Some(sz)
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    for {
      (ch, rate, bits, byteRate) <- fmt
      ds <- dataSize
      if byteRate > 0
    } yield (rate, ch, bits, ds * 1000.0 / byteRate, "wav")
  }

  private def audioStub(payload: Array[Byte]): (Int, Int, Int, Double, String) = {
    val hsh = fnv1a(payload)
    val rates = Array(8000, 16000, 22050, 44100)
    (rates(math.floorMod(hsh, 4).toInt), 1 + math.floorMod(hsh >> 8, 2).toInt,
      16, (500 + math.floorMod(hsh >> 16, 60000)).toDouble, "stub")
  }

  /** Attach decoded audio metadata to a (id, payload) frame: REAL
    * header-only parse for RIFF/WAVE via [[parseWavHeader]];
    * deterministic stub for compressed codecs absent from this
    * container. Same mapPartitions batch shape as [[decodeImages]].
    */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("n_bytes", LongType),
      StructField("meta", audioMetaType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        // same null contract as decodeImages: stub seeded from empty bytes
        val raw = r.getAs[Array[Byte]](payloadIdx)
        val payload = if (raw == null) Array.emptyByteArray else raw
        val (rate, ch, bits, durMs, fmt) =
          parseWavHeader(payload).getOrElse(audioStub(payload))
        Row(r.get(idIdx), payload.length.toLong, Row(rate, ch, bits, durMs, fmt))
      }
    }(enc)
  }

  /** Canonical 44-byte PCM WAV writer (header + raw data). A fixture
    * generator for the golden-geometry tests and the `q_mm_wav_meta`
    * oracle gate — the gate wraps arbitrary bytes in a real WAV envelope
    * on the Spark side, parses it back with [[parseWavHeader]], and
    * DuckDB independently recomputes the expected duration arithmetic.
    */
  def wavPayload(data: Array[Byte], sampleRate: Int, channels: Int,
                 bitsPerSample: Int): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val blockAlign = channels * bitsPerSample / 8
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** Wrap a binary column in a PCM WAV envelope row-by-row — the fixture
    * half of the `q_mm_wav_meta` gate (see [[wavPayload]]).
    */
  def synthesizeWav(df: DataFrame, idCol: String, payloadCol: String,
                    sampleRate: Int, channels: Int, bitsPerSample: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("payload", BinaryType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val raw = r.getAs[Array[Byte]](payloadIdx)
        val data = if (raw == null) Array.emptyByteArray else raw
        Row(r.get(idIdx), wavPayload(data, sampleRate, channels, bitsPerSample))
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
