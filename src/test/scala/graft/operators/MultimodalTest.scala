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

  test("sampleFrames yields every stride-th byte index") {
    val out = Multimodal.sampleFrames(Multimodal.attachPayload(docs), stride = 4)
    val idx = out.filter(col("doc_id") === 0).select("frame_idx").as[Seq[Int]].head()
    assert(idx == Seq(0, 4, 8, 12))
  }
}
