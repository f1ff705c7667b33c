package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line with per-query seconds.
  *
  * Each query is fully materialized through the `noop` sink (count() would
  * let Catalyst prune the projections and under-measure). A single untimed
  * warmup pass absorbs JVM/codegen/parquet-footer costs so the timed pass
  * measures query execution, which is what scales to a real cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warmup: every query once, untimed. First executions pay one-off JVM
    // costs — C2 compilation of large generated methods alone inflates a
    // first run 10-30x (measured: cube_lineitem 37.9s cold vs 2.3s warm) —
    // so the timed pass below measures steady-state execution, which is
    // what scales to a long-running cluster.
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(n => try run(n) catch { case _: Throwable => () })

    // Timed pass + outlier retry, per-query min: single runs on this
    // shared host show one-off multi-second stalls on random queries
    // (different ones each run), so any query far above the pass median
    // gets one retry — bounded extra wall, steady-state numbers.
    // A failing query must not masquerade as a fast run: record the
    // failure and report it in the JSON instead of its (near-zero) time.
    val failed = scala.collection.mutable.Set[String]()
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try run(name) catch {
        case t: Throwable =>
          failed += name
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val p1 = names.map(n => n -> timeOne(n)).toMap
    val median = p1.values.toSeq.sorted.apply(p1.size / 2)
    val suspects = names.filter(n => p1(n) > math.max(1.5, 3 * median))
    val p2 = suspects.map(n => n -> timeOne(n)).toMap
    val results = names.map(n => n -> math.min(p1(n), p2.getOrElse(n, p1(n))))
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (failed(k)) "null" else v.toString)
    }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed(k) => v }.sum
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
