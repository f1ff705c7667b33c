package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing of dedup_containment. */
object ProfileContain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/repo/tmp_sf1_organic")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, dir)
    t("docs-count")(docs.count())
    for (i <- 1 to 2) {
      t(s"full-$i")(SparkEntry.queries("dedup_containment")(spark, dir)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
