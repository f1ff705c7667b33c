package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Multimodal-column plumbing (SURVEY §2.9 [EXT]): images/audio/video ride
  * as opaque `binary` columns with typed metadata beside them. Container
  * HEADER decode (PNG/JPEG/GIF format + dimensions) is real byte-layout
  * parsing ([[decodeDims]]); only pixel-level decode is a clearly-marked
  * deterministic STUB (no image/audio codec libs in this container).
  * Everything Spark-side — schema, batch iteration, partition-level
  * processing, output encoding — is real and tested.
  *
  * Scale notes: at 100 TB media payloads dominate row size. Keep them in
  * their own column (parquet stores it in a separate chunk, so metadata
  * queries never read the bytes — column pruning), process per-partition
  * with bounded batches, and never collect payloads to the driver.
  */
object Multimodal {

  /** A decoded media feature row: the stub emits a deterministic
    * fixed-width feature vector per payload.
    */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  /** Synthesize an opaque binary payload per document (md5 bytes of the
    * text). A real deployment reads these via the binaryFile source or a
    * parquet binary column; the engine only sees `binary`, so the
    * synthesis is an adequate stand-in for the plumbing.
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", unhex(md5(col("text"))))

  /** Typed metadata from the payload header, as pure column expressions
    * (no decode): fake width/height/frame-count parsed from leading bytes.
    */
  def extractMeta(withPayload: DataFrame): DataFrame = {
    val hexCol = hex(col("payload"))
    def hv(i: Int) = TextFns.hexVal(lower(substring(hexCol, i, 1)))
    withPayload
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("width", (hv(1) * 16 + hv(2) + 1).cast("long"))
      .withColumn("height", (hv(3) * 16 + hv(4) + 1).cast("long"))
      .withColumn("n_frames", (hv(5) % 8 + 1).cast("long"))
  }

  /** Decode payloads to feature vectors, partition-at-a-time.
    *
    * STUB DECODER: a real implementation would hand each partition's
    * payload batch to an image/audio codec (that library is absent here).
    * The stub derives a deterministic 8-float vector from the payload
    * bytes. The Spark plumbing — mapPartitions over a typed Dataset,
    * Array[Float] output schema, no driver materialization — is the real
    * contract and is what the tests pin.
    */
  def decodeFeatures(withPayload: DataFrame): Dataset[MediaFeatures] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val feats = bytes.take(8).map(b => (b & 0xff) / 255.0f)
          MediaFeatures(id, bytes.length, feats)
        }
      }
  }

  /** A real-header decode row: container format sniffed from magic bytes
    * plus the pixel dimensions parsed from the format's own header
    * layout. `fmt` is "png" / "jpeg" / "gif" / "unknown"; unknown rows
    * carry width = height = -1 rather than being dropped, so corrupt
    * payloads stay visible to downstream quality gates.
    */
  final case class MediaDims(doc_id: Long, fmt: String, width: Long, height: Long)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Parse (format, width, height) from real image container headers —
    * pure bytes-in, no codec library:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    *    (PNG spec §11.2.2), so width/height are the two big-endian u32s
    *    at offsets 16 and 20.
    *  - JPEG: FF D8 SOI, then marker segments, each FF <type> <u16 len>;
    *    dimensions live in the first SOFn frame header (FF C0..CF minus
    *    C4/C8/CC which are huffman/arithmetic/extension): u8 precision,
    *    u16 height, u16 width after the length.
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    *    little-endian u16 width/height at offsets 6 and 8.
    *
    * Truncated or malformed payloads return None, never throw — a 100 TB
    * crawl always contains garbage bytes.
    */
  private[operators] def parseDims(b: Array[Byte]): Option[(String, Long, Long)] = {
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length >= 24 && b.startsWith(pngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(b, 16), be32(b, 20)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // walk marker segments to the first SOFn
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // lost sync: not a marker
        val m = b(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill byte before a marker
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= b.length) return None // truncated SOF
          return Some(("jpeg", be16(b, i + 7).toLong, be16(b, i + 5).toLong))
        } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else if (m == 0xd9) {
          return None // EOI before any SOF
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return None
          i += 2 + len
        }
      }
      None
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
               b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", le16(b, 6).toLong, le16(b, 8).toLong))
    else None
  }

  /** Decode REAL container headers partition-at-a-time: the non-stub half
    * of the decode story. Format sniffing and dimension parsing are the
    * genuine PNG/JPEG/GIF byte layouts ([[parseDims]]); only pixel-level
    * decode (which needs a codec library this container doesn't ship)
    * remains behind [[decodeFeatures]]'s stub. Same plumbing contract:
    * typed Dataset out of mapPartitions, payload bytes never leave the
    * executors.
    */
  def decodeDims(withPayload: DataFrame): Dataset[MediaDims] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          parseDims(bytes) match {
            case Some((fmt, w, h)) => MediaDims(id, fmt, w, h)
            case None              => MediaDims(id, "unknown", -1L, -1L)
          }
        }
      }
  }

  /** Decoded audio container metadata (header-level, no codec). */
  final case class AudioMeta(doc_id: Long, fmt: String, sample_rate: Long,
                             channels: Long, duration_ms: Long)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse (format, sampleRate, channels, durationMs) from real audio
    * container headers — pure byte layout, no codec library:
    *
    *  - WAV: "RIFF" <u32le size> "WAVE", then tagged chunks
    *    (<4cc> <u32le len> payload, word-aligned). The "fmt " chunk
    *    carries u16le audio format + channels, u32le sample rate and
    *    byte rate; the "data" chunk's length over the byte rate is the
    *    duration (RIFF/WAVE spec layout).
    *  - FLAC: "fLaC", then metadata blocks (<1B flags|type> <u24be len>);
    *    STREAMINFO (type 0, mandatory first) packs sample rate in 20
    *    bits at byte offsets 18-20, channels-1 in the next 3 bits, and
    *    the 36-bit total-sample count whose ratio to the rate is the
    *    duration (FLAC format spec §STREAMINFO).
    *
    * Truncated/malformed payloads return None, never throw.
    */
  private[operators] def parseAudioMeta(b: Array[Byte])
      : Option[(String, Long, Long, Long)] = {
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') {
      var i = 12
      var rate = -1L; var ch = -1L; var byteRate = -1L; var dataLen = -1L
      while (i + 8 <= b.length && (rate < 0 || dataLen < 0)) {
        val tag = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val len = le32(b, i + 4)
        if (tag == "fmt " && i + 24 <= b.length) {
          ch = le16(b, i + 10).toLong
          rate = le32(b, i + 12)
          byteRate = le32(b, i + 16)
        } else if (tag == "data") {
          dataLen = len
        }
        i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
      }
      if (rate > 0 && ch > 0 && byteRate > 0 && dataLen >= 0)
        Some(("wav", rate, ch, dataLen * 1000L / byteRate))
      else None
    } else if (b.length >= 26 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
               b(3) == 'C' && (b(4) & 0x7f) == 0) { // STREAMINFO first
      val rate = ((b(18) & 0xffL) << 12) | ((b(19) & 0xffL) << 4) |
        ((b(20) & 0xf0L) >> 4)
      val ch = ((b(20) >> 1) & 0x7L) + 1
      val totalSamples = ((b(21) & 0x0fL) << 32) | be32(b, 22)
      if (rate > 0) Some(("flac", rate, ch, totalSamples * 1000L / rate))
      else None
    } else None
  }

  /** Decode REAL audio container headers partition-at-a-time — the audio
    * sibling of [[decodeDims]]: WAV/FLAC sniffing and header layout are
    * genuine; only waveform decode (codec) stays stubbed. Payload bytes
    * never leave the executors.
    */
  def decodeAudioMeta(withPayload: DataFrame): Dataset[AudioMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          parseAudioMeta(bytes) match {
            case Some((fmt, sr, ch, ms)) => AudioMeta(id, fmt, sr, ch, ms)
            case None => AudioMeta(id, "unknown", -1L, -1L, -1L)
          }
        }
      }
  }

  /** Frame sampling for "video" payloads: every `stride`-th byte index is
    * a frame handle. Pure expressions: sequence + filter HOF; at scale
    * this is how per-frame fan-out stays inside codegen instead of a UDF.
    */
  def sampleFrames(withPayload: DataFrame, stride: Int): DataFrame =
    withPayload.withColumn("frame_idx",
      filter(sequence(lit(0), length(col("payload")) - 1),
        i => i % stride === 0))

  /** Per-frame fan-out: one row per sampled frame with the frame's
    * leading byte (what a real pipeline would hand to the decoder). The
    * explode keeps fan-out relational — downstream decode batches by
    * partition, never by driver loop.
    */
  def explodeFrames(withPayload: DataFrame, stride: Int): DataFrame = {
    val hexCol = hex(col("payload"))
    withPayload
      .select(col("doc_id"), col("payload"),
        explode(filter(sequence(lit(0), length(col("payload")) - 1),
          i => i % stride === 0)).as("frame_idx"))
      .withColumn("frame_byte",
        (TextFns.hexVal(lower(substring(hexCol, col("frame_idx") * 2 + 1, lit(1)))) * 16 +
          TextFns.hexVal(lower(substring(hexCol, col("frame_idx") * 2 + 2, lit(1)))))
          .cast("long"))
      .drop("payload")
  }

  /** Fit (width, height) into a square box, preserving aspect ratio —
    * integer arithmetic only (exact on both engines), minimum 1 px. The
    * resize itself is metadata math; a real pixel resample would plug in
    * at decodeFeatures' partition batches.
    */
  def resizeMeta(withMeta: DataFrame, box: Int): DataFrame =
    withMeta
      .withColumn("new_w",
        when(col("width") >= col("height"), lit(box.toLong))
          .otherwise(greatest(lit(1L),
            floor(col("width") * box / col("height")).cast("long"))))
      .withColumn("new_h",
        when(col("width") >= col("height"),
          greatest(lit(1L), floor(col("height") * box / col("width")).cast("long")))
          .otherwise(lit(box.toLong)))
}
