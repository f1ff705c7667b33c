package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Restart-recovery pins for the heavy stateful sinks under the
  * RocksDB state store provider with changelog checkpointing
  * (StreamingOps.withRocksDbState): stop a query mid-stream, restart
  * it from the same checkpoint, and assert the post-restart batch
  * folds onto RECOVERED state (not fresh state) — plus that the
  * checkpoint actually contains RocksDB changelog files, proving the
  * delta-upload path (the 100 TB checkpoint-cost property) was active,
  * and that the conf scope restores the session's previous provider.
  *
  * The memory sink refuses checkpoint recovery outside Complete mode,
  * so the Append/Update sinks drive foreachBatch into a driver-side
  * buffer — the same recovery surface a parquet/JDBC sink would use.
  */
class RocksDbStateRecoveryTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def changelogFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(dir).filter(_.getName.endsWith(".changelog"))
  }

  test("heavyHittersStream: MG sketches survive a RocksDB restart") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb_hh_").toFile
    val sink = RocksDbStateRecoveryTest.hhSink
    sink.clear()
    val mem = MemoryStream[String]
    mem.addData(Seq.fill(5)("hot") ++ Seq("cold1", "cold2"): _*)
    def startQuery() = StreamingOps.withRocksDbState(spark) {
      StreamingOps.heavyHittersStream(mem.toDF.toDF("token"),
          k = 8, buckets = 4)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("token", "est").as[(String, Long)].collect()
            .foreach(sink.add)
        }
        .start()
    }
    val sq1 = startQuery()
    sq1.processAllAvailable()
    sq1.stop()
    sink.clear()
    // restart from the same checkpoint; the new batch must fold ONTO
    // the recovered sketch (5 + 3 = 8), not onto empty state (3)
    mem.addData(Seq.fill(3)("hot"): _*)
    val sq2 = startQuery()
    sq2.processAllAvailable()
    sq2.stop()
    val hot = java.util.List.copyOf(sink).toArray.toSeq
      .collect { case (t: String, e: Long) if t == "hot" => e }
    assert(hot == Seq(8L),
      s"post-restart MG estimate must fold onto recovered counts, got $hot")
    assert(changelogFiles(ckpt).nonEmpty,
      "no .changelog files under the checkpoint — changelog checkpointing inactive")
    assert(spark.conf.getOption(providerKey) == before,
      "withRocksDbState must restore the previous provider conf")
  }

  test("dedupWithinWatermark: dedup state survives a RocksDB restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb_dedup_").toFile
    val sink = RocksDbStateRecoveryTest.dedupSink
    sink.clear()
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData((1L, ts(0)), (2L, ts(1)))
    def startQuery() = StreamingOps.withRocksDbState(spark) {
      StreamingOps.dedupWithinWatermark(
          mem.toDF.toDF("event_id", "ts"), watermark = "10 minutes")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("event_id").as[Long].collect().foreach(sink.add)
        }
        .start()
    }
    val sq1 = startQuery()
    sq1.processAllAvailable()
    sq1.stop()
    sink.clear()
    // event_id 1 re-arrives within the watermark horizon after the
    // restart: recovered state must suppress it; only 3 is new
    mem.addData((1L, ts(2)), (3L, ts(3)))
    val sq2 = startQuery()
    sq2.processAllAvailable()
    sq2.stop()
    val ids = java.util.List.copyOf(sink).toArray.toSeq
    assert(ids == Seq(3L),
      s"recovered dedup state must suppress the replayed id 1, got $ids")
    assert(changelogFiles(ckpt).nonEmpty,
      "no .changelog files under the checkpoint — changelog checkpointing inactive")
  }

  test("countMinStream: sketch state survives a RocksDB restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb_cms_").toFile
    val width = 16
    val mem = MemoryStream[Long]
    val b1 = (0L until 40L).map(_ % 7)
    mem.addData(b1: _*)
    def startQuery() = StreamingOps.withRocksDbState(spark) {
      StreamingOps.countMinStream(mem.toDF.toDF("key"), width)
        .writeStream.outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .format("memory").queryName("cms_rocks").start()
    }
    val sq1 = startQuery()
    sq1.processAllAvailable()
    sq1.stop()
    val b2 = Seq.fill(25)(3L)
    mem.addData(b2: _*)
    val sq2 = startQuery()
    sq2.processAllAvailable()
    sq2.stop()
    // Complete mode: the single output row is the running sketch; each
    // key increments one counter per hash row (depth = len/width), so
    // total mass equals depth x ALL rows seen iff state was recovered
    val sketch = spark.table("cms_rocks").select("sketch")
      .as[Seq[Long]].collect().head
    val depth = sketch.length / width
    assert(sketch.sum == (b1.size + b2.size).toLong * depth,
      s"sketch mass ${sketch.sum} != ${(b1.size + b2.size) * depth} — state lost on restart")
    assert(changelogFiles(ckpt).nonEmpty,
      "no .changelog files under the checkpoint — changelog checkpointing inactive")
  }
}

object RocksDbStateRecoveryTest {
  val hhSink = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  val dedupSink = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
}
