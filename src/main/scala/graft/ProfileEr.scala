package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing of er_clusters at sf0.1. */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // warm the JVM on an unrelated query
    SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val grp = c.groupBy(col("c_name")).agg(min(col("c_custkey")).as("rep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("grp")(grp.count())
    val chain = c.join(grp, Seq("c_name"))
      .filter(col("c_custkey") =!= col("rep"))
      .select(col("rep").as("a"), col("c_custkey").as("b"))
    val reps = grp.select(col("rep").as("c_custkey"), col("c_name"))
    val blk = reps.withColumn("blk", substring(col("c_name"), 15, 4))
    val bp = blk
      .select(col("blk"), col("c_custkey").as("a"), col("c_name").as("na"))
      .join(blk.select(col("blk"), col("c_custkey").as("b"),
        col("c_name").as("nb")), Seq("blk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("na"), col("b"), col("nb"))
    t("bp")(bp.count())
    val snmRaw = t("snm-build")(graft.operators.Blocking.sortedNeighborhood(
      reps, Seq(col("c_name"), col("c_custkey")), w = 3))
    val snm = snmRaw.select(
      least(col("c_custkey_a"), col("c_custkey_b")).as("a"),
      when(col("c_custkey_a") < col("c_custkey_b"), col("c_name_a"))
        .otherwise(col("c_name_b")).as("na"),
      greatest(col("c_custkey_a"), col("c_custkey_b")).as("b"),
      when(col("c_custkey_a") < col("c_custkey_b"), col("c_name_b"))
        .otherwise(col("c_name_a")).as("nb"))
    t("snm-count")(snm.count())
    val pairs = bp.unionByName(snm)
      .filter(levenshtein(col("na"), col("nb"), 2) =!= -1)
      .select(col("a"), col("b"))
      .unionByName(chain)
    val np = t("pairs")(pairs.count())
    println(s"pairs=$np")
    val cc = t("cc")(graft.operators.Dedup.componentsFromPairs(pairs))
    t("cc-count")(cc.count())
    graft.operators.Ckpt.releaseAll()
    spark.catalog.clearCache(); System.gc()
    (1 to 3).foreach { i =>
      t(s"full-query-$i")(SparkEntry.queries("er_clusters")(spark, dir)
        .write.format("noop").mode("overwrite").save())
      graft.operators.Ckpt.releaseAll()
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
