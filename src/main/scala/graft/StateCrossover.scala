package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, timestamp_seconds}

/** One arm of the state-store CROSSOVER measurement (round-15 task 6).
  *
  * The per-round bench entries (`streaming_state_*`, Bench.scala) price
  * the UNDER-heap regime honestly — at 2M keys the HDFS heap provider
  * wins ~1.7x because its state is a plain in-heap map. This main prices
  * the regime the RocksDB posture claim actually rests on: a keyspace
  * whose resident state EXCEEDS a bounded executor heap. It is run by
  * `scripts/state_crossover.sh` in its OWN JVM per provider arm with a
  * deliberately small -Xmx and -XX:+ExitOnOutOfMemoryError, so the
  * expected heap-provider failure is an exit code in the committed
  * artifact, not a hung bench: HDFSBackedStateStoreProvider must hold
  * every key's UnsafeRow pair on heap (~150-200 B/key -> 24M keys is
  * ~4 GB against a 3 GiB heap), while RocksDB keeps state in native
  * memory + local SST files and completes under the same bound.
  *
  * Workload is the same canonical unbounded-cardinality sink as the
  * bench: file micro-batches through dropDuplicatesWithinWatermark
  * (state = one entry per distinct key). args: provider(hdfs|rocksdb)
  * nKeys outJsonPath.
  */
object StateCrossover {
  def main(args: Array[String]): Unit = {
    val Array(prov, nKeysS, outPath) = args
    val nKeys = nKeysS.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nFiles = 6
    val perFile = nKeys / nFiles
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_xover_$prov").toString
    val in = s"$root/in"
    (0 until nFiles).foreach { i =>
      spark.range(i * perFile, (i + 1) * perFile)
        .select(col("id").as("k"),
          timestamp_seconds(lit(1700000000L) + col("id") % 3600).as("ts"))
        .coalesce(1).write.mode("append").parquet(in)
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("ts", "timestamp")

    def runOnce(): Double = {
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark("k")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val seen = q.recentProgress.map(_.numInputRows).sum
      require(seen == nFiles * perFile,
        s"crossover $prov saw $seen rows, expected ${nFiles * perFile}")
      (System.nanoTime() - t0) / 1e9
    }

    val sec =
      if (prov == "rocksdb")
        graft.streaming.StreamingOps.withRocksDbState(spark)(runOnce())
      else runOnce()
    val json = f"""{"provider":"$prov","n_keys":$nKeys,"sec":$sec%.1f,"max_heap_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)},"status":"ok"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
