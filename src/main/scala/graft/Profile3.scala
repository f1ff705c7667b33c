package graft
import org.apache.spark.sql.SparkSession

object Profile3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
    val seq = Seq("ann_bruteforce_top5", "ann_bruteforce_top5", "ann_lsh_top3",
      "approx_distinct_parts", "change_stats", "change_stats", "cube_lineitem",
      "cube_lineitem", "change_stats")
    seq.foreach { name =>
      val t0 = System.nanoTime()
      run(name)
      println(f"SEQ $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
