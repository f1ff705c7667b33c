package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for communities_lpa on the organic 10x corpus:
  * splits the fixed edge-build cost (distinct over the fact table,
  * symmetrization, checkpoint) from the per-round join+vote cost so
  * the next cut targets the real dominator. Tooling only.
  */
object ProfileLpa {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("tmp_sf1_organic")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    graft.SparkEntry.queries("pagerank_bipartite")(spark, dir)
      .write.format("noop").mode("overwrite").save() // warm scans/codegen
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val li = graft.Tables.lineitem(spark, dir)
      println(s"  lineitem rows = ${li.count()}")
      val pairs = li.select((col("l_partkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b")).distinct()
      val p0 = t("pairs distinct + checkpoint")(
        pairs.localCheckpoint(eager = true))
      println(s"  distinct pairs = ${p0.count()}")
      // Mirrors LabelProp.communities' edge build (self-votes ride the
      // labels union there, not the edge table).
      val sym = p0.select(col("a").as("u"), col("b").as("v"))
        .unionByName(p0.select(col("b").as("u"), col("a").as("v")))
      val edges = t("sym + repart + ckpt")(
        sym.repartition(col("v")).localCheckpoint(eager = true))
      println(s"  edge rows = ${edges.count()}")
      // Release the attribution copies before timing the operator itself,
      // or the doubled checkpoint footprint forces eviction at 100x.
      edges.unpersist(blocking = true)
      p0.unpersist(blocking = true)
      t("3 LPA rounds + histogram")(
        LabelProp.communities(pairs, 3)
          .groupBy(col("lbl")).agg(count(lit(1)).as("community_size"))
          .groupBy(col("community_size"))
          .agg(count(lit(1)).as("n_communities"))
          .orderBy(col("community_size"))
          .write.format("noop").mode("overwrite").save())
      t("full query")(
        graft.SparkEntry.queries("communities_lpa")(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
