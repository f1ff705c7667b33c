package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for dedup_levenshtein on the 10x replica: the
  * round-10 bench pair showed 0.44 s → ~7 s for 10x data with the SAME
  * verify work (names are exact 10x copies, so the distinct-name stage
  * is scale-invariant) — this isolates whether the cost is the distinct,
  * the verify quadratic, the 1.17 M-row fan-out joins, or the final
  * total-order sort.
  */
object ProfileLev {
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
    // warm
    SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val names = c.select(col("c_name").as("na")).distinct()
      .withColumn("blk", substring(col("na"), 15, 4))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("distinct names")(names.count())
    val np = names
      .join(names.select(col("na").as("nb"),
        substring(col("nb"), 15, 4).as("blk")), Seq("blk"))
      .filter(col("na") <= col("nb"))
      .withColumn("lev", levenshtein(col("na"), col("nb"), 2))
      .filter(col("lev") =!= -1)
      .select(col("na"), col("nb"), col("lev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("block self-join + verify")(np.count())
    val fan = np
      .join(c.select(col("c_name").as("na"), col("c_custkey").as("ka")), "na")
      .join(c.select(col("c_name").as("nb"), col("c_custkey").as("kb")), "nb")
      .filter(col("na") < col("nb") || col("ka") < col("kb"))
      .select(least(col("ka"), col("kb")).as("a"),
        greatest(col("ka"), col("kb")).as("b"),
        col("lev").cast("long").as("lev"))
    t("fan-out joins (no sort)")(
      fan.write.format("noop").mode("overwrite").save())
    t("fan-out + total sort")(
      fan.orderBy(col("a"), col("b"))
        .write.format("noop").mode("overwrite").save())
    t("full query (2nd run)")(
      SparkEntry.queries("dedup_levenshtein")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
