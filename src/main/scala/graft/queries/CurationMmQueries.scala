package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ops.{Bpe, Corpus, Dedup, Graph, Layout, Multimodal, Similarity, Text, Unigram}

/** Multimodal gates: binary metadata, image codecs (PNG/JPEG/GIF/BMP/WebP) + resize/dHash/near-dup, audio (WAV/FLAC/MP3) + PCM/resample/features, MP4 metadata/samples.
  *
  * Split from CurationQueries (round 13) for navigation only — gate
  * bodies are verbatim; the aggregator preserves the original catalog
  * order.
  */
private[graft] object CurationMmQueries {
  /** Multimodal plumbing: text treated as an opaque binary payload column
    * with typed metadata (byte length + sha256) — the decode/feature steps
    * ride on this schema via mapPartitions (graft.ops.Multimodal; decode
    * itself is a deterministic stub, container has no codec libs).
    */
  val mmBinary = Q("q_mm_binary_meta",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        col("text").cast(BinaryType).as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          sha2(col("payload"), 256).as("sha256"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
              SHA256(text) AS sha256
            FROM documents ORDER BY doc_id"""))

  /** Audio modality, REAL end to end: each document's bytes are wrapped
    * in a PCM WAV envelope (fixture half), then the pure-JVM RIFF parser
    * recovers geometry and duration from the binary header
    * (graft.ops.Multimodal.parseWavHeader). DuckDB never sees the WAV —
    * it independently recomputes the expected numbers arithmetically
    * (duration = bytes × 1000 / byteRate, same operation order for IEEE
    * bit parity), so a parser that misreads any header field fails the
    * gate.
    */
  val mmWav = Q("q_mm_wav_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val wavved = Multimodal.synthesizeWav(docs, "doc_id", "payload",
        sampleRate = 16000, channels = 1, bitsPerSample = 16)
      Multimodal.decodeAudio(wavved, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.bits_per_sample").as("bits_per_sample"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              16000 AS sample_rate,
              1 AS channels,
              16 AS bits_per_sample,
              CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) * 1000.0 / 32000.0 AS duration_ms
            FROM documents ORDER BY doc_id"""))

  /** MP3 modality, REAL header decode end to end: document bytes wrapped
    * in an ID3v2 tag + MPEG1 Layer III frame envelope (fixture half),
    * then the pure-JVM frame-header parser recovers sample rate, channel
    * mode and the CBR duration estimate. DuckDB recomputes the expected
    * numbers arithmetically — (bytes + 4 header bytes) × 8 / bitrate,
    * identical operation order for IEEE bit parity — so a parser that
    * mis-skips the tag or misreads any header field fails the gate.
    */
  val mmMp3 = Q("q_mm_mp3_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeMp3(docs, "doc_id", "payload",
        bitrateKbps = 128, sampleRate = 44100)
      Multimodal.decodeAudio(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.format").as("format"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              44100 AS sample_rate,
              2 AS channels,
              'mp3' AS format,
              CAST(OCTET_LENGTH(ENCODE(text)) + 4 AS DOUBLE) * 8.0 * 1000.0 / 128000.0 AS duration_ms
            FROM documents ORDER BY doc_id"""))

  /** MP4 modality, REAL header decode end to end: document bytes carried
    * as the mdat body of a minimal ftyp+moov/mvhd container whose mvhd
    * duration field is data.length ticks at timescale 600 (fixture
    * half); the ISO BMFF box walk recovers duration/timescale/brand from
    * the header alone. DuckDB recomputes duration = bytes × 1000 / 600
    * independently — a parser that read the mdat body (or the wrong
    * box) could not produce these numbers.
    */
  val mmMp4 = Q("q_mm_mp4_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeMp4(docs, "doc_id", "payload", timescale = 600)
      Multimodal.decodeVideo(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("n_bytes"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.timescale").as("timescale"),
          col("meta.major_brand").as("major_brand"),
          col("meta.format").as("format"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(OCTET_LENGTH(ENCODE(text)) + 144 AS BIGINT) AS n_bytes,
              CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) * 1000.0 / 600.0 AS duration_ms,
              600 AS timescale,
              'isom' AS major_brand,
              'mp4' AS format
            FROM documents ORDER BY doc_id"""))

  /** Per-sample MP4 metadata, REAL `stbl` parse end to end: document
    * bytes ride as mdat inside an envelope whose stsz/stts/stss tables
    * are arithmetic functions of the byte length (64-byte chunks,
    * 100-tick durations with a len%100 remainder on the last sample,
    * every-5th keyframes — see Multimodal.mp4PayloadWithSamples). DuckDB
    * recomputes every emitted sample row from OCTET_LENGTH alone, so the
    * gate proves the parser walks moov/trak/mdia/minf/stbl and expands
    * the run-length tables correctly — a parser reading the mdat body or
    * inventing a schedule cannot produce these rows.
    */
  val mmMp4Samples = Q("q_mm_mp4_samples",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeMp4WithSamples(docs, "doc_id", "payload",
        timescale = 600, chunkBytes = 64, keyEvery = 5)
      Multimodal.decodeVideoSamples(enveloped, "doc_id", "payload")
        .orderBy("doc_id", "sample_no")
    },
    Some("""WITH d AS (SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS len FROM documents),
            s AS (SELECT doc_id, len,
                         UNNEST(RANGE(1, CAST(CEIL(len / 64.0) AS BIGINT) + 1)) AS i
                  FROM d WHERE len > 0)
            SELECT doc_id,
                   i AS sample_no,
                   CAST(CASE WHEN i * 64 <= len THEN 64 ELSE len - (i - 1) * 64 END AS BIGINT) AS size_bytes,
                   CAST(CASE WHEN i = CAST(CEIL(len / 64.0) AS BIGINT) THEN 100 + len % 100 ELSE 100 END AS BIGINT) AS duration_ticks,
                   CAST((i - 1) * 100 AS BIGINT) AS dts_ticks,
                   (i - 1) * 100 * 1000.0 / 600 AS time_ms,
                   (i - 1) % 5 = 0 AS keyframe
            FROM s ORDER BY doc_id, sample_no"""))

  /** FLAC modality, REAL STREAMINFO decode end to end: document bytes
    * ride as the unread frame section of a fLaC envelope whose
    * total-samples field is data.length; the bit-packed STREAMINFO parse
    * recovers rate/channels/bits/duration from the header alone. DuckDB
    * recomputes duration = bytes × 1000 / 44100 independently.
    */
  val mmFlac = Q("q_mm_flac_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeFlac(docs, "doc_id", "payload",
        sampleRate = 44100, channels = 2, bitsPerSample = 16)
      Multimodal.decodeAudio(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.bits_per_sample").as("bits_per_sample"),
          col("meta.format").as("format"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              44100 AS sample_rate,
              2 AS channels,
              16 AS bits_per_sample,
              'flac' AS format,
              CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) * 1000.0 / 44100.0 AS duration_ms
            FROM documents ORDER BY doc_id"""))

  /** WebP modality, REAL VP8X header decode end to end: canvas
    * dimensions and the alpha flag are derived from the payload length
    * in the fixture and recovered by the RIFF chunk parse; DuckDB
    * recomputes the same arithmetic from OCTET_LENGTH.
    */
  val mmWebp = Q("q_mm_webp_meta",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      val enveloped = Multimodal.synthesizeWebp(docs, "doc_id", "payload")
      Multimodal.decodeImages(enveloped, "doc_id", "payload")
        .select(col("doc_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.channels").as("channels"),
          col("meta.format").as("format"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(100 + OCTET_LENGTH(ENCODE(text)) % 1000 AS INTEGER) AS width,
              CAST(50 + OCTET_LENGTH(ENCODE(text)) % 500 AS INTEGER) AS height,
              CAST(CASE WHEN OCTET_LENGTH(ENCODE(text)) % 2 = 0 THEN 4 ELSE 3 END AS INTEGER) AS channels,
              'webp' AS format
            FROM documents ORDER BY doc_id"""))

  /** PNG modality, REAL pixels end to end: each document gets a
    * spec-conformant PNG whose geometry, channel count and every byte
    * are closed-form functions of doc_id (Multimodal.pngFixture —
    * scanline filters cycle through all five types), written by the
    * hand-rolled encoder (deflate + filter + CRC) and read back by the
    * hand-rolled decoder (CRC check + inflate + de-filter). DuckDB never
    * sees a PNG — it recomputes the integer pixel aggregates
    * arithmetically from doc_id, so a single mis-filtered byte anywhere
    * in either codec direction moves the position-weighted checksum and
    * fails the gate.
    */
  val mmPngPixels = Q("q_mm_png_pixels",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(pngs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, w * h * ch)) AS i
              FROM dims),
            vals AS (
              SELECT doc_id, w, h, ch, i,
                (g * 7919 + (i // (ch * w)) * (104729 + 2 * g) + ((i // ch) % w) * (131 + 2 * g) + (i % ch) * 17
                 + CASE WHEN ((doc_id // 50) + ((i // ch) % w) * 13 + (i // (ch * w)) * 7) % 89 = 0
                        THEN 128 ELSE 0 END) % 256 AS v
              FROM px)
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   CAST(ch AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, w, h, ch ORDER BY doc_id"""))

  /** JPEG modality, REAL pixels end to end through the hand-rolled
    * baseline codec (Jpeg.scala — FDCT + Huffman entropy coding one way,
    * marker parse + Huffman decode + dequant + IDCT + JFIF color
    * conversion the other). Every fixture image is BLOCK-CONSTANT, which
    * makes the lossy codec exact by construction: constant 8×8 tiles
    * have DC-only DCT coefficients and the fixture quant table's DC step
    * of 8 divides them out losslessly (see Jpeg scaladoc). DuckDB never
    * sees a JPEG — it recomputes each decoded pixel from the per-block
    * closed form, including the floor(x+0.5) JFIF YCbCr→RGB arithmetic
    * for the color half of the corpus, so a one-bit Huffman slip or an
    * IDCT scaling error anywhere moves the position-weighted checksum.
    */
  val mmJpegPixels = Q("q_mm_jpeg_pixels",
    (s, dir) => {
      val jpgs = Multimodal.synthesizeJpeg(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(jpgs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     8 * (2 + (doc_id % 50) % 3) AS w,
                     8 * (1 + (doc_id % 50) % 2) AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, w * h * ch)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, ch, i,
                     (i // ch) % w AS x, i // (ch * w) AS y, i % ch AS c
              FROM px),
            bv AS (
              SELECT doc_id, g, ch, i, c,
                     CAST((g*37 + (doc_id // 50)*31 + (x // 8)*(19 + 2*g)
                           + (y // 8)*(29 + 2*g)) % 256 AS DOUBLE) AS yv,
                     CAST((g*37 + (doc_id // 50)*31 + (x // 8)*(19 + 2*g)
                           + (y // 8)*(29 + 2*g) + 41) % 256 AS DOUBLE) AS cb,
                     CAST((g*37 + (doc_id // 50)*31 + (x // 8)*(19 + 2*g)
                           + (y // 8)*(29 + 2*g) + 82) % 256 AS DOUBLE) AS cr
              FROM m),
            vals AS (
              SELECT doc_id, ch, i,
                     CASE WHEN ch = 1 THEN CAST(yv AS INTEGER)
                          WHEN c = 0 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.402::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          WHEN c = 1 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv - (0.344136::DOUBLE) * (cb - 128.0)
                               - (0.714136::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.772::DOUBLE) * (cb - 128.0) + 0.5) AS INTEGER)))
                     END AS v
              FROM bv),
            dims2 AS (SELECT doc_id, w, h, ch FROM dims)
            SELECT d.doc_id,
                   CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
                   CAST(d.ch AS INTEGER) AS channels,
                   CAST(SUM(v.v) AS BIGINT) AS sum_val,
                   CAST(SUM((v.v + 1) * (v.i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v.v) AS INTEGER) AS min_val,
                   CAST(MAX(v.v) AS INTEGER) AS max_val
            FROM dims2 d JOIN vals v ON d.doc_id = v.doc_id
            GROUP BY d.doc_id, d.w, d.h, d.ch ORDER BY d.doc_id"""))

  /** CROSS-CODEC resize: decode the block-constant JPEG fixture through
    * the hand-rolled baseline decoder → nearest-resample to 10×7 →
    * re-encode as PNG → decode again for the stats — one row round-trips
    * BOTH image codecs with the resample arithmetic in between. Exact
    * because the JPEG leg is lossless on block-constant fixtures and the
    * PNG leg is lossless always; DuckDB recomputes each resized byte
    * from the source block at (sx·8⁻¹, sy·8⁻¹) including the JFIF color
    * conversion the decoder applied before the resample.
    */
  val mmJpegResize = Q("q_mm_jpeg_resize",
    (s, dir) => {
      val jpgs = Multimodal.synthesizeJpeg(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val resized = Multimodal.resizeImages(jpgs, "doc_id", "payload",
        outW = 10, outH = 7, method = "nearest")
      Multimodal.decodeImagePixels(resized, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     8 * (2 + (doc_id % 50) % 3) AS w,
                     8 * (1 + (doc_id % 50) % 2) AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 10 * 7 * ch)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, ch, i,
                     ((i // ch) % 10 * w) // 10 AS sx,
                     (i // (ch * 10) * h) // 7 AS sy,
                     i % ch AS c
              FROM px),
            bv AS (
              SELECT doc_id, g, ch, i, c,
                     CAST((g*37 + (doc_id // 50)*31 + (sx // 8)*(19 + 2*g)
                           + (sy // 8)*(29 + 2*g)) % 256 AS DOUBLE) AS yv,
                     CAST((g*37 + (doc_id // 50)*31 + (sx // 8)*(19 + 2*g)
                           + (sy // 8)*(29 + 2*g) + 41) % 256 AS DOUBLE) AS cb,
                     CAST((g*37 + (doc_id // 50)*31 + (sx // 8)*(19 + 2*g)
                           + (sy // 8)*(29 + 2*g) + 82) % 256 AS DOUBLE) AS cr
              FROM m),
            vals AS (
              SELECT doc_id, ch, i,
                     CASE WHEN ch = 1 THEN CAST(yv AS INTEGER)
                          WHEN c = 0 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.402::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          WHEN c = 1 THEN LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv - (0.344136::DOUBLE) * (cb - 128.0)
                               - (0.714136::DOUBLE) * (cr - 128.0) + 0.5) AS INTEGER)))
                          ELSE LEAST(255, GREATEST(0, CAST(FLOOR(
                            yv + (1.772::DOUBLE) * (cb - 128.0) + 0.5) AS INTEGER)))
                     END AS v
              FROM bv)
            SELECT d.doc_id,
                   10 AS width, 7 AS height, CAST(d.ch AS INTEGER) AS channels,
                   CAST(SUM(v.v) AS BIGINT) AS sum_val,
                   CAST(SUM((v.v + 1) * (v.i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v.v) AS INTEGER) AS min_val,
                   CAST(MAX(v.v) AS INTEGER) AS max_val
            FROM dims d JOIN vals v ON d.doc_id = v.doc_id
            GROUP BY d.doc_id, d.ch ORDER BY d.doc_id"""))

  /** REAL GIF decode through the hand-rolled LZW codec
    * (`ops/Gif.scala`): the palette-indexed fixture — half the corpus
    * interlaced — is decoded by [[Multimodal.decodeImagePixels]], and
    * DuckDB recomputes every RGB byte as palette arithmetic over the
    * closed-form index arithmetic, never seeing a GIF byte. A one-bit
    * LZW slip, a width-growth off-by-one, or a deinterlace error moves
    * the position-weighted checksum.
    */
  val mmGifPixels = Q("q_mm_gif_pixels",
    (s, dir) => {
      val gifs = Multimodal.synthesizeGif(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(gifs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     11 + (doc_id % 50) % 8 AS w,
                     7 + (doc_id % 50) % 5 AS h,
                     CASE (doc_id % 50) % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 16 END AS nc
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, nc, UNNEST(RANGE(0, w * h * 3)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, nc, i,
                     (i // 3) % w AS x, i // (3 * w) AS y, i % 3 AS c
              FROM px),
            pv AS (
              SELECT doc_id, g, w, h, i, c,
                     (x * 7 + y * 11 + doc_id // 50 + g) % nc AS p
              FROM m),
            vals AS (
              SELECT doc_id, w, h, i,
                     CASE c WHEN 0 THEN (p * 37 + g * 11) % 256
                            WHEN 1 THEN (p * 59 + g * 13) % 256
                            ELSE (p * 83 + g * 17) % 256 END AS v
              FROM pv)
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, w, h ORDER BY doc_id"""))

  /** REAL BMP decode through the hand-rolled DIB codec
    * (`ops/Bmp.scala`): 24-bit BI_RGB fixtures with odd widths (DWORD
    * row padding load-bearing), decoded by
    * [[Multimodal.decodeImagePixels]]; DuckDB recomputes every RGB byte
    * from the gradient closed form. A BGR swap, a padding slip, or a
    * bottom-up row-order error moves the position-weighted checksum.
    */
  val mmBmpPixels = Q("q_mm_bmp_pixels",
    (s, dir) => {
      val bmps = Multimodal.synthesizeBmp(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeImagePixels(bmps, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     13 + (doc_id % 50) % 7 AS w,
                     6 + (doc_id % 50) % 5 AS h
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, UNNEST(RANGE(0, w * h * 3)) AS i
              FROM dims),
            vals AS (
              SELECT doc_id, w, h, i,
                     ((i // 3) % w * (11 + g) + i // (3 * w) * (17 + 2 * g)
                      + (i % 3) * 41 + doc_id // 50) % 256 AS v
              FROM px)
            SELECT doc_id,
                   CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
                   CAST(3 AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, w, h ORDER BY doc_id"""))

  /** CROSS-CODEC audio resample: the WAV fixture decodes through the
    * PCM path, nearest-resamples to 4 kHz on integer index arithmetic
    * (out[i] = src[(i·srcRate)/4000], m = n·4000/srcRate samples), is
    * re-encoded by the FLAC encoder, and decodes AGAIN for the stats —
    * one row round-trips both audio codecs with the resample in
    * between, the audio twin of q_mm_jpeg_resize. DuckDB recomputes
    * every resampled sample from the fixture closed form at the source
    * index.
    */
  val mmAudioResample = Q("q_mm_audio_resample",
    (s, dir) => {
      val wavs = Multimodal.synthesizeWavPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val resampled = Multimodal.resampleAudio(wavs, "doc_id", "payload", dstRate = 4000)
      Multimodal.decodeAudioPcm(resampled, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH geo AS (
       |  SELECT doc_id, doc_id % 50 AS g,
       |         CASE (doc_id % 50) % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 11025 END AS rate,
       |         1 + (doc_id % 50) % 2 AS ch,
       |         400 + (doc_id % 50) * 13 AS n,
       |         (doc_id % 50) % 7 - 3 AS slope,
       |         doc_id % 997 - 498 AS base
       |  FROM documents),
       |res AS (
       |  SELECT doc_id, rate, ch, n, slope, base,
       |         (n * 4000) // rate AS m
       |  FROM geo),
       |idxs AS (
       |  SELECT doc_id, rate, ch, n, m, slope, base, UNNEST(RANGE(0, m * ch)) AS j
       |  FROM res),
       |src AS (
       |  SELECT doc_id, rate, ch, n, m, slope, base, j,
       |         LEAST(n - 1, ((j // ch) * rate) // 4000) AS si
       |  FROM idxs),
       |vals AS (
       |  SELECT doc_id, ch, m, j,
       |         slope * si + base
       |           + (doc_id * 31 + (j % ch) * 7919 + si * 104729) % 23 - 11 AS v
       |  FROM src)
       |SELECT doc_id,
       |       CAST(4000 AS INTEGER) AS sample_rate,
       |       CAST(ch AS INTEGER) AS channels,
       |       CAST(16 AS INTEGER) AS bits_per_sample,
       |       CAST(m AS BIGINT) AS n_samples,
       |       CAST(SUM(v) AS BIGINT) AS sum_val,
       |       CAST(SUM((v + 32769) * (j + 1)) AS BIGINT) AS sample_checksum,
       |       CAST(MIN(v) AS INTEGER) AS min_val,
       |       CAST(MAX(v) AS INTEGER) AS max_val
       |FROM vals GROUP BY doc_id, ch, m ORDER BY doc_id""".stripMargin))

  /** REAL audio feature extraction through the FLAC codec: energy,
    * per-channel zero crossings, peak amplitude — the cheap audio
    * quality signals a curation pipeline filters on. Integer-exact, so
    * DuckDB recomputes all three from the fixture closed form (the
    * zero-crossing count needs LAG over the reconstructed per-channel
    * sample sequence — an off-by-one in channel de-interleaving or
    * sample order shows up immediately).
    */
  val mmAudioFeatures = Q("q_mm_audio_features",
    (s, dir) => {
      val flacs = Multimodal.synthesizeFlacPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.audioFeatures(flacs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH geo AS (
       |  SELECT doc_id, doc_id % 50 AS g,
       |         CASE (doc_id % 50) % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 11025 END AS rate,
       |         1 + (doc_id % 50) % 2 AS ch,
       |         400 + (doc_id % 50) * 13 AS n,
       |         (doc_id % 50) % 7 - 3 AS slope,
       |         doc_id % 997 - 498 AS base
       |  FROM documents),
       |idxs AS (
       |  SELECT doc_id, rate, ch, n, slope, base, UNNEST(RANGE(0, n * ch)) AS j
       |  FROM geo),
       |vals AS (
       |  SELECT doc_id, rate, ch, n,
       |         j % ch AS c, j // ch AS i,
       |         slope * (j // ch) + base
       |           + (doc_id * 31 + (j % ch) * 7919 + (j // ch) * 104729) % 23 - 11 AS v
       |  FROM idxs),
       |lagd AS (
       |  SELECT doc_id, rate, ch, n, c, i, v,
       |         LAG(v) OVER (PARTITION BY doc_id, c ORDER BY i) AS pv
       |  FROM vals)
       |SELECT doc_id,
       |       CAST(rate AS INTEGER) AS sample_rate,
       |       CAST(ch AS INTEGER) AS channels,
       |       CAST(n AS BIGINT) AS n_samples,
       |       CAST(SUM(v * v) AS BIGINT) AS energy,
       |       CAST(SUM(CASE WHEN pv IS NOT NULL AND (v < 0) <> (pv < 0)
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       |       CAST(MAX(ABS(v)) AS INTEGER) AS peak_abs
       |FROM lagd GROUP BY doc_id, rate, ch, n ORDER BY doc_id""".stripMargin))

  /** REAL lossless audio decode: the hand-rolled FLAC codec
    * (`ops/Flac.scala` — FIXED+Rice frames, stereo decorrelation,
    * CRC-8/CRC-16/MD5 verified) encodes a closed-form PCM fixture per
    * document and [[Multimodal.decodeAudioPcm]] decodes it back for
    * per-row sample stats. FLAC is lossless by construction, so DuckDB
    * recomputes every decoded sample from the fixture arithmetic
    * without ever seeing a FLAC byte — a one-bit Rice slip, predictor
    * error, or channel-decorrelation mistake anywhere moves the
    * position-and-channel-weighted checksum.
    */
  private val audioPcmOracle: String =
    """WITH geo AS (
       |  SELECT doc_id, doc_id % 50 AS g,
       |         CASE (doc_id % 50) % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 11025 END AS rate,
       |         1 + (doc_id % 50) % 2 AS ch,
       |         400 + (doc_id % 50) * 13 AS n,
       |         (doc_id % 50) % 7 - 3 AS slope,
       |         doc_id % 997 - 498 AS base
       |  FROM documents),
       |idxs AS (
       |  SELECT doc_id, rate, ch, n, slope, base, UNNEST(RANGE(0, n * ch)) AS j
       |  FROM geo),
       |vals AS (
       |  SELECT doc_id, rate, ch, n, j,
       |         slope * (j // ch) + base
       |           + (doc_id * 31 + (j % ch) * 7919 + (j // ch) * 104729) % 23 - 11 AS v
       |  FROM idxs)
       |SELECT doc_id,
       |       CAST(rate AS INTEGER) AS sample_rate,
       |       CAST(ch AS INTEGER) AS channels,
       |       CAST(16 AS INTEGER) AS bits_per_sample,
       |       CAST(n AS BIGINT) AS n_samples,
       |       CAST(SUM(v) AS BIGINT) AS sum_val,
       |       CAST(SUM((v + 32769) * (j + 1)) AS BIGINT) AS sample_checksum,
       |       CAST(MIN(v) AS INTEGER) AS min_val,
       |       CAST(MAX(v) AS INTEGER) AS max_val
       |FROM vals GROUP BY doc_id, rate, ch, n ORDER BY doc_id""".stripMargin

  val mmFlacPcm = Q("q_mm_flac_pcm",
    (s, dir) => {
      val flacs = Multimodal.synthesizeFlacPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeAudioPcm(flacs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some(audioPcmOracle))

  /** Same PCM fixture through the 16-bit WAV path of
    * [[Multimodal.decodeAudioPcm]] — the two codecs share one oracle,
    * so a FLAC-vs-WAV disagreement can only be a codec bug, never a
    * fixture ambiguity (FlacSpec asserts their equality row-by-row).
    */
  val mmWavPcm = Q("q_mm_wav_pcm",
    (s, dir) => {
      val wavs = Multimodal.synthesizeWavPcm(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.decodeAudioPcm(wavs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some(audioPcmOracle))

  /** REAL image resize: decode → nearest-neighbor resample to 10×7 →
    * re-encode as PNG → decode AGAIN for the stats, so every row
    * round-trips the codec twice and the resample arithmetic sits in
    * between. DuckDB recomputes each resized byte from the source-pixel
    * closed form at sx=(x·w)//10, sy=(y·h)//7 — integer-exact, no
    * sampling convention ambiguity.
    */
  val mmPngResize = Q("q_mm_png_resize",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val resized = Multimodal.resizeImages(pngs, "doc_id", "payload",
        outW = 10, outH = 7, method = "nearest")
      Multimodal.decodeImagePixels(resized, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            px AS (
              SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 10 * 7 * ch)) AS i
              FROM dims),
            m AS (
              SELECT doc_id, g, w, h, ch, i,
                     (i // ch) % 10 AS x, i // (ch * 10) AS y, i % ch AS c
              FROM px),
            vals AS (
              SELECT doc_id, ch, i,
                (g * 7919 + ((y * h) // 7) * (104729 + 2 * g) + ((x * w) // 10) * (131 + 2 * g) + c * 17
                 + CASE WHEN ((doc_id // 50) + ((x * w) // 10) * 13 + ((y * h) // 7) * 7) % 89 = 0
                        THEN 128 ELSE 0 END) % 256 AS v
              FROM m)
            SELECT doc_id,
                   10 AS width, 7 AS height, CAST(ch AS INTEGER) AS channels,
                   CAST(SUM(v) AS BIGINT) AS sum_val,
                   CAST(SUM((v + 1) * (i + 1)) AS BIGINT) AS px_checksum,
                   CAST(MIN(v) AS INTEGER) AS min_val,
                   CAST(MAX(v) AS INTEGER) AS max_val
            FROM vals GROUP BY doc_id, ch ORDER BY doc_id"""))

  /** Perceptual image hash (dHash), fully oracled: gray values (integer
    * (r+g+b)/3) nearest-sampled on the 9×8 grid, bit y·8+x set when the
    * right neighbor is strictly brighter. DuckDB rebuilds the 64-bit
    * signature from the pixel closed form (HUGEINT bit sum, two's-
    * complement-folded to BIGINT) — decoder, gray conversion, sampling
    * and bit packing all verified byte-exactly.
    */
  val mmImageDhash = Q("q_mm_image_dhash",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      Multimodal.imageDHash(pngs, "doc_id", "payload")
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            r8 AS (SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 8)) AS gy FROM dims),
            grid AS (SELECT doc_id, g, w, h, ch, gy, UNNEST(RANGE(0, 9)) AS gx FROM r8),
            samp AS (SELECT doc_id, g, ch, gx, gy,
                            (gx * w) // 9 AS sx, (gy * h) // 8 AS sy
                     FROM grid),
            chanv AS (SELECT doc_id, g, ch, gx, gy, sx, sy, UNNEST(RANGE(0, ch)) AS c
                      FROM samp),
            cv AS (SELECT doc_id, ch, gx, gy,
                     (g * 7919 + sy * (104729 + 2 * g) + sx * (131 + 2 * g) + c * 17
                      + CASE WHEN ((doc_id // 50) + sx * 13 + sy * 7) % 89 = 0
                             THEN 128 ELSE 0 END) % 256 AS v
                   FROM chanv),
            gray AS (SELECT doc_id, gx, gy, SUM(v) // MAX(ch) AS gv
                     FROM cv GROUP BY doc_id, gx, gy),
            bits AS (SELECT a.doc_id,
                       CASE WHEN b.gv > a.gv
                            THEN POWER(2, a.gy * 8 + a.gx)::HUGEINT
                            ELSE 0::HUGEINT END AS bit
                     FROM gray a JOIN gray b
                       ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
                     WHERE a.gx < 8),
            sig AS (SELECT doc_id, SUM(bit) AS s FROM bits GROUP BY doc_id)
            SELECT doc_id,
                   CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                             THEN s - 18446744073709551616::HUGEINT
                             ELSE s END AS BIGINT) AS dhash
            FROM sig ORDER BY doc_id"""))

  /** Image near-duplicate pairs: dHash signatures through the same
    * chunk-pigeonhole pairing as SimHash (Dedup.hammingPairs — 9 disjoint
    * chunks for radius 8, recall-complete, never all-pairs). The fixture
    * makes id%50 groups near-identical (sparse 1-in-89 pixel
    * perturbation keyed on id//50) while group-dependent gradient slopes
    * keep cross-group images dissimilar, so the radius-8 screen finds
    * exactly the same-group pairs plus a thin tail. DuckDB rebuilds every
    * signature and takes exact all-pairs at ≤ 8 — candidate-generation
    * recall and verify both gated.
    */
  val mmImageNearDup = Q("q_mm_image_neardup",
    (s, dir) => {
      val pngs = Multimodal.synthesizePng(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id", "payload")
      val sigs = Multimodal.imageDHash(pngs, "doc_id", "payload")
      Dedup.hammingPairs(sigs, "dhash", "doc_id", maxHamming = 8)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH dims AS (
              SELECT doc_id, doc_id % 50 AS g,
                     16 + (doc_id % 50) % 9 AS w,
                     12 + (doc_id % 50) % 7 AS h,
                     CASE WHEN (doc_id % 50) % 2 = 0 THEN 1 ELSE 3 END AS ch
              FROM documents),
            r8 AS (SELECT doc_id, g, w, h, ch, UNNEST(RANGE(0, 8)) AS gy FROM dims),
            grid AS (SELECT doc_id, g, w, h, ch, gy, UNNEST(RANGE(0, 9)) AS gx FROM r8),
            samp AS (SELECT doc_id, g, ch, gx, gy,
                            (gx * w) // 9 AS sx, (gy * h) // 8 AS sy
                     FROM grid),
            chanv AS (SELECT doc_id, g, ch, gx, gy, sx, sy, UNNEST(RANGE(0, ch)) AS c
                      FROM samp),
            cv AS (SELECT doc_id, ch, gx, gy,
                     (g * 7919 + sy * (104729 + 2 * g) + sx * (131 + 2 * g) + c * 17
                      + CASE WHEN ((doc_id // 50) + sx * 13 + sy * 7) % 89 = 0
                             THEN 128 ELSE 0 END) % 256 AS v
                   FROM chanv),
            gray AS (SELECT doc_id, gx, gy, SUM(v) // MAX(ch) AS gv
                     FROM cv GROUP BY doc_id, gx, gy),
            bits AS (SELECT a.doc_id,
                       CASE WHEN b.gv > a.gv
                            THEN POWER(2, a.gy * 8 + a.gx)::HUGEINT
                            ELSE 0::HUGEINT END AS bit
                     FROM gray a JOIN gray b
                       ON b.doc_id = a.doc_id AND b.gy = a.gy AND b.gx = a.gx + 1
                     WHERE a.gx < 8),
            sig AS (SELECT doc_id, SUM(bit) AS s FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(BIT_COUNT(XOR(a.s, b.s)) AS INTEGER) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE BIT_COUNT(XOR(a.s, b.s)) <= 8
            ORDER BY id_a, id_b"""))

  val all: Seq[Q] = Seq(mmBinary, mmWav, mmMp3, mmMp4, mmMp4Samples, mmFlac, mmWebp, mmPngPixels, mmJpegPixels, mmJpegResize, mmGifPixels, mmBmpPixels, mmAudioResample, mmAudioFeatures, mmFlacPcm, mmWavPcm, mmPngResize, mmImageDhash, mmImageNearDup)
}
