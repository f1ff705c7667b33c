package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq((0L, "an image of a cat"), (1L, "an image of a dog"))
    .toDF("doc_id", "text")

  test("attachPayload produces an opaque 16-byte binary column") {
    val out = Multimodal.attachPayload(docs)
    assert(out.schema("payload").dataType == BinaryType)
    val lens = out.select(length(col("payload"))).as[Int].collect()
    assert(lens.forall(_ == 16))
  }

  test("extractMeta derives typed header fields without decoding") {
    val out = Multimodal.extractMeta(Multimodal.attachPayload(docs))
    val row = out.filter(col("doc_id") === 0).select("byte_len", "width", "height", "n_frames")
      .as[(Long, Long, Long, Long)].head()
    assert(row._1 == 16L)
    assert(row._2 >= 1 && row._2 <= 256)
    assert(row._3 >= 1 && row._3 <= 256)
    assert(row._4 >= 1 && row._4 <= 8)
  }

  test("decodeFeatures: mapPartitions stub emits deterministic 8-float vectors") {
    val out = Multimodal.decodeFeatures(Multimodal.attachPayload(docs))
    assert(out.schema("features").dataType == ArrayType(FloatType, containsNull = false))
    val feats = out.collect().sortBy(_.doc_id)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(_.n_bytes == 16))
    assert(feats.forall(_.features.forall(f => f >= 0f && f <= 1f)))
    // determinism: same input -> same features
    val again = Multimodal.decodeFeatures(Multimodal.attachPayload(docs))
      .collect().sortBy(_.doc_id)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  // -------- real container-header parsing (crafted byte fixtures) -----

  /** Minimal PNG prefix: 8-byte signature, IHDR length+type, then
    * big-endian u32 width/height. Everything after is irrelevant to the
    * header parse.
    */
  private def pngBytes(w: Long, h: Long): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array(0x00, 0x00, 0x00, 0x0d, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt)
    def u32(v: Long) = Array((v >> 24).toInt, (v >> 16).toInt, (v >> 8).toInt, v.toInt)
    (sig ++ ihdr ++ u32(w) ++ u32(h) ++ Array(8, 6, 0, 0, 0)).map(_.toByte)
  }

  /** JPEG: SOI, an APP0 segment and a COM segment to force real marker
    * walking, then SOF0 with u16 height/width.
    */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def u16(v: Int) = Array(v >> 8, v & 0xff)
    val soi = Array(0xff, 0xd8)
    val app0 = Array(0xff, 0xe0) ++ u16(6) ++ Array(0x4a, 0x46, 0x49, 0x46)
    val com = Array(0xff, 0xfe) ++ u16(4) ++ Array('h'.toInt, 'i'.toInt)
    val sof0 = Array(0xff, 0xc0) ++ u16(11) ++ Array(8) ++ u16(h) ++ u16(w) ++
      Array(3, 1, 0x22, 0)
    (soi ++ app0 ++ com ++ sof0).map(_.toByte)
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes("US-ASCII").map(_.toInt) ++
      Array(w & 0xff, w >> 8, h & 0xff, h >> 8) ++ Array(0xf7, 0, 0))
      .map(_.toByte)

  test("parseDims reads real PNG/JPEG/GIF header layouts") {
    assert(Multimodal.parseDims(pngBytes(640, 480)) == Some(("png", 640L, 480L)))
    assert(Multimodal.parseDims(jpegBytes(456, 123)) == Some(("jpeg", 456L, 123L)))
    assert(Multimodal.parseDims(gifBytes(2, 3)) == Some(("gif", 2L, 3L)))
    // garbage, truncation, and a JPEG with EOI before any SOF all refuse
    assert(Multimodal.parseDims("not an image".getBytes) == None)
    assert(Multimodal.parseDims(pngBytes(640, 480).take(12)) == None)
    assert(Multimodal.parseDims(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == None)
  }

  test("decodeDims: mapPartitions parses headers; unknown payloads kept visible") {
    val payloads = Seq(
      (0L, pngBytes(1920L, 1080L)),
      (1L, jpegBytes(800, 600)),
      (2L, gifBytes(16, 16)),
      (3L, "garbage".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodeDims(payloads).collect().sortBy(_.doc_id)
    assert(out.map(d => (d.fmt, d.width, d.height)).toSeq == Seq(
      ("png", 1920L, 1080L), ("jpeg", 800L, 600L),
      ("gif", 16L, 16L), ("unknown", -1L, -1L)))
  }

  // --- audio fixtures: genuine WAV/FLAC header byte layouts ---

  private def u16le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32le(v: Long) = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def wavBytes(rate: Long, ch: Int, bytesPerSample: Int,
                       nSamples: Long): Array[Byte] = {
    val byteRate = rate * ch * bytesPerSample
    val dataLen = nSamples * ch * bytesPerSample
    val fmt = u16le(1) ++ u16le(ch) ++ u32le(rate) ++ u32le(byteRate) ++
      u16le(ch * bytesPerSample) ++ u16le(8 * bytesPerSample)
    val body = "fmt ".getBytes ++ u32le(fmt.length.toLong) ++ fmt ++
      "data".getBytes ++ u32le(dataLen) // header only; no payload bytes
    "RIFF".getBytes ++ u32le(4L + body.length) ++ "WAVE".getBytes ++ body
  }

  private def flacBytes(rate: Long, ch: Int, totalSamples: Long): Array[Byte] = {
    val si = new Array[Byte](34)
    si(10) = ((rate >> 12) & 0xff).toByte
    si(11) = ((rate >> 4) & 0xff).toByte
    si(12) = (((rate & 0xf) << 4) | ((ch - 1) << 1)).toByte
    si(13) = ((totalSamples >> 32) & 0x0f).toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
  }

  test("parseAudioMeta reads real WAV/FLAC header layouts") {
    // 2ch 16-bit 44.1k, one second of samples -> 1000 ms
    assert(Multimodal.parseAudioMeta(wavBytes(44100, 2, 2, 44100)) ==
      Some(("wav", 44100L, 2L, 1000L)))
    // FLAC 48k mono, half a second
    assert(Multimodal.parseAudioMeta(flacBytes(48000, 1, 24000)) ==
      Some(("flac", 48000L, 1L, 500L)))
    assert(Multimodal.parseAudioMeta("not audio".getBytes) == None)
    assert(Multimodal.parseAudioMeta(wavBytes(44100, 2, 2, 44100).take(16)) == None)
  }

  test("decodeAudioMeta: mapPartitions parses headers; unknown kept visible") {
    val payloads = Seq(
      (0L, wavBytes(16000, 1, 2, 8000)),
      (1L, flacBytes(44100, 2, 441000)),
      (2L, "garbage".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudioMeta(payloads).collect().sortBy(_.doc_id)
    assert(out.map(a => (a.fmt, a.sample_rate, a.channels, a.duration_ms)).toSeq
      == Seq(("wav", 16000L, 1L, 500L), ("flac", 44100L, 2L, 10000L),
        ("unknown", -1L, -1L, -1L)))
  }

  test("sampleFrames yields every stride-th byte index") {
    val out = Multimodal.sampleFrames(Multimodal.attachPayload(docs), stride = 4)
    val idx = out.filter(col("doc_id") === 0).select("frame_idx").as[Seq[Int]].head()
    assert(idx == Seq(0, 4, 8, 12))
  }

  // -------- REAL codec decode (JDK javax.imageio / javax.sound.sampled)

  test("encodePngPayload -> decodePixelStats: lossless codec round-trip matches the closed form") {
    val ids = Seq(0L, 1L, 9L, 63L, 12345L).toDF("doc_id")
    val out = Multimodal.decodePixelStats(Multimodal.encodePngPayload(ids))
      .collect().sortBy(_.doc_id)
    out.foreach { p =>
      val id = p.doc_id
      val w = 8 + id % 9
      val h = 8 + (id / 9) % 7
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0L until h; x <- 0L until w) {
        sr += (id * 31 + x * 7 + y * 13) % 256
        sg += (id * 17 + x * 11 + y * 3) % 256
        sb += (id * 23 + x * 5 + y * 19) % 256
      }
      assert((p.fmt, p.width, p.height, p.n_pixels, p.sum_r, p.sum_g, p.sum_b)
        == ("png", w, h, w * h, sr, sg, sb), s"doc $id")
    }
  }

  test("decodePixelStats decodes JPEG and GIF via the JDK codecs; garbage stays visible") {
    // JPEG: lossy, so assert format + dims + plausible sums, not exact values.
    val img = new java.awt.image.BufferedImage(6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, (x * 40 << 16) | (y * 60 << 8) | 128)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val payloads = Seq((0L, enc("jpeg")), (1L, enc("gif")), (2L, "not an image".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodePixelStats(payloads).collect().sortBy(_.doc_id)
    assert(out(0).fmt == "jpeg" && out(0).width == 6 && out(0).height == 4
      && out(0).n_pixels == 24 && out(0).sum_r > 0)
    assert(out(1).fmt == "gif" && out(1).width == 6 && out(1).height == 4
      && out(1).n_pixels == 24)
    assert(out(2).fmt == "unknown" && out(2).width == -1L && out(2).height == -1L)
  }

  test("JPEG decode is deterministic: same bytes, two executions, equal stats") {
    // Lossy codecs have no closed-form oracle, but the decode must still
    // be a FUNCTION of the bytes — if two executions of the same payload
    // could disagree (codec version, thread-local state, float paths),
    // every downstream hash/group over decoded features would be
    // nondeterministic at scale. Decode the same corpus twice through
    // separate executions (and partition layouts) and require identical
    // exact pixel sums.
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 16) << 8) | ((x + y) * 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val bytes = bos.toByteArray
    val payloads = (0L until 64L).map(i => (i, bytes))
    def statsOf(parts: Int): Seq[(Long, Long, Long, Long)] =
      Multimodal.decodePixelStats(
          payloads.toDF("doc_id", "payload").repartition(parts))
        .collect().sortBy(_.doc_id)
        .map(p => (p.doc_id, p.sum_r, p.sum_g, p.sum_b)).toSeq
    val a = statsOf(2)
    val b = statsOf(7)
    assert(a == b)
    // every copy of the same bytes decodes to the same sums within one
    // execution too (no per-row state leakage)
    assert(a.map(t => (t._2, t._3, t._4)).distinct.size == 1)
  }

  test("encodeFingerprintImage -> decodeAHash: equal fp => equal hash, distinct fp differ, garbage -> -1") {
    val fps = Seq((0L, "aaaa"), (1L, "aaaa"), (2L, "bbbb"), (3L, "cccc"))
      .toDF("doc_id", "fp")
    val out = Multimodal.decodeAHash(Multimodal.encodeFingerprintImage(fps))
      .collect().sortBy(_.doc_id).map(_.ahash)
    assert(out(0) == out(1))
    assert(Set(out(0), out(2), out(3)).size == 3)
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.decodeAHash(bad).head().ahash == -1L)
  }

  test("encodeWavPayload -> decodeAudioStats: the JDK WAV codec round-trip matches the closed form") {
    val ids = Seq(0L, 5L, 63L, 777L).toDF("doc_id")
    val out = Multimodal.decodeAudioStats(Multimodal.encodeWavPayload(ids))
      .collect().sortBy(_.doc_id)
    out.foreach { a =>
      val id = a.doc_id
      val n = (64 + id % 64).toInt
      val s = (0 until n).map(i => (id * 37 + i * 17) % 4001 - 2000)
      val zc = (1 until n).count(i => (s(i - 1) < 0) != (s(i) < 0))
      assert((a.n_samples, a.sum_s, a.sum_sq, a.min_s, a.max_s, a.zero_cross)
        == (n.toLong, s.sum, s.map(v => v * v).sum, s.min, s.max, zc.toLong),
        s"doc $id")
    }
    // the encoded container really is the RIFF/WAVE layout our header
    // walker understands — codec and byte-walker agree on the format
    val metaRow = Multimodal.decodeAudioMeta(
      Multimodal.encodeWavPayload(Seq(5L).toDF("doc_id"))).head()
    assert(metaRow.fmt == "wav" && metaRow.sample_rate == 8000L
      && metaRow.channels == 1L)
    val bad = Seq((9L, "nope".getBytes)).toDF("doc_id", "payload")
    assert(Multimodal.decodeAudioStats(bad).head().n_samples == -1L)
  }
}
