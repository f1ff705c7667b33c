package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Stage-timing probe for audio_sample_stats on the 10x replica: 50 k
  * ~170-sample clips cost ~8.6 s wall at local[32] — ~5.5 ms CPU per
  * clip, 300x what a WAV container parse + PCM loop should cost. This
  * isolates encode (byte building), the JDK codec decode, a codec-free
  * manual PCM walk, and the final total-order sort, so the next
  * optimization targets the real stage.
  */
object ProfileMedia {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("tmp_sf1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // warm the scan + codegen paths
    SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    Tables.documents(spark, dir).select(col("doc_id"))
      .write.format("noop").mode("overwrite").save()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val enc = Multimodal.encodeWavPayload(Tables.documents(spark, dir))
      t("encode only")(
        enc.write.format("noop").mode("overwrite").save())
      t("encode+decode")(
        Multimodal.decodeAudioStats(enc).toDF()
          .write.format("noop").mode("overwrite").save())
      t("full query (with sort)")(
        SparkEntry.queries("audio_sample_stats")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
