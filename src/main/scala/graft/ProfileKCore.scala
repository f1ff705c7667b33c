package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only timing probe for kcore_docs' two stages (LSH pair gen vs
  * the h-index rounds) — isolates where the wall time goes at a given
  * SF. usage: runMain graft.ProfileKCore [sfDir]
  */
object ProfileKCore {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.Tables._
    import graft.operators.{Dedup, KCore}
    for (i <- 1 to 2) {
      val pairs = time(s"[$i] lsh pairs")(
        Dedup.minhashLshPairs(documents(spark, sfDir),
          n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
          maxDf = Some(20))
          .select(col("a"), col("b")).localCheckpoint(true))
      println("n_pairs=" + pairs.count())
      time(s"[$i] hindex rounds")(
        KCore.corenessHIndex(pairs, 4).write.format("noop")
          .mode("overwrite").save())
      time(s"[$i] peel rounds")(
        KCore.coreness(pairs).write.format("noop")
          .mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
