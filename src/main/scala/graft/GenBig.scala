package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an sf1-equivalent dataset (10x sf0.1) by
  * replicating the sf0.1 tables with FK-consistent key offsets, so
  * scaling behavior is measurable locally (the driver ships sf0.1 max).
  * Output is git-ignored scratch data, not test input.
  */
object GenBig {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/root/repo/tmp_sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val copies = 10

    def replicate(df: DataFrame, offsets: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        offsets.foldLeft(df) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + lit(i * base))
        }
      }.reduce(_ unionByName _)

    def write(name: String, df: DataFrame): Unit = {
      df.repartition(8).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $name")
    }

    val O = 1000000000L  // orderkey stride
    val C = 10000000L    // custkey stride
    val P = 1000000L     // partkey/suppkey stride

    write("region", Tables.region(spark, sf))
    write("nation", Tables.nation(spark, sf))
    write("customer", replicate(Tables.customer(spark, sf), Map("c_custkey" -> C)))
    write("supplier", replicate(Tables.supplier(spark, sf), Map("s_suppkey" -> P)))
    write("part", replicate(Tables.part(spark, sf), Map("p_partkey" -> P)))
    write("orders", replicate(Tables.orders(spark, sf),
      Map("o_orderkey" -> O, "o_custkey" -> C)))
    write("lineitem", replicate(Tables.lineitem(spark, sf),
      Map("l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> P)))
    write("documents", replicate(Tables.documents(spark, sf), Map("doc_id" -> 100000L)))
    write("embeddings", replicate(Tables.embeddings(spark, sf), Map("vec_id" -> 100000L)))
    // events: read the TIMESTAMP(NANOS) column as long (the loader
    // normalizes on read; a written LONG column round-trips unchanged).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    write("events", replicate(ev, Map("event_id" -> 10000000L, "user_id" -> 1000L)))
    spark.stop()
  }
}
