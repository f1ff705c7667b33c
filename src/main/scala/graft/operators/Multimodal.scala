package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Multimodal-column plumbing (SURVEY §2.9 [EXT]): images/audio/video ride
  * as opaque `binary` columns with typed metadata beside them. The decode
  * step is a clearly-marked deterministic STUB (no image/audio libs in
  * this container); everything Spark-side — schema, batch iteration,
  * partition-level processing, output encoding — is real and tested.
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
