package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    new java.io.File(outDir).mkdirs()
    // Dev-only subset: comma-separated query names. Driver sets nothing,
    // so the full dump always runs at the gate.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Fail fast on names that resolve to no query — a one-character typo
    // in SPARK_GRAFT_ONLY must not silently run nothing and (below)
    // delete every previous dump in outDir.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(
          s"[verify] unknown SPARK_GRAFT_ONLY names: ${unknown.toSeq.sorted.mkString(", ")}")
        spark.stop()
        sys.exit(2)
      }
    }
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    // When the subset filter is active, remove unselected queries' stale
    // parquet from a previous full run — otherwise check_oracle.py would
    // happily compare old Spark output against fresh oracle SQL and mask
    // a regression in a dev re-run.
    if (only.isDefined) {
      val keep = selected.keySet + "oracle_sql.json" + "guards.json"
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filterNot(f => keep.contains(f.getName))
        .foreach { f =>
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
            x.delete(); ()
          }
          rm(f)
        }
    }
    // Per-query physical-regime decisions (Guard registry), written as
    // guards.json next to the dumps: a scale gate's artifact can then
    // prove WHICH regime (adaptive LSH width, semdedup k, containment
    // tier) the hash-verified run actually exercised — the round-15
    // 30x gate's whole point is that those regimes differ from sf0.01.
    val guards = scala.collection.mutable.Map[String, Map[String, String]]()
    operators.Guard.clear()
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val g = operators.Guard.snapshot()
        if (g.nonEmpty) guards(name) = g
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        operators.Guard.clear()
        // Query-local persists are scoped to one query: without this, a
        // full 232-query dump accumulates every query's caches and ends
        // up relying on LRU eviction + disk spill at larger SFs. The
        // graph operators' result checkpoints are NOT CacheManager
        // entries — releaseAll is their clearCache analog (each result
        // is fully written out above, never re-read).
        operators.Ckpt.releaseAll()
        spark.catalog.clearCache()
      }
    }
    Files.writeString(Paths.get(s"$outDir/guards.json"),
      guards.toSeq.sortBy(_._1).map { case (q, m) =>
        s"${jsonStr(q)}: " + m.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}"))
    // Restrict the oracle list to the selected subset too, so a dev
    // subset run never asks the checker to compare queries it didn't dump.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private[graft] def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

/** Dumps the COMPLETE oracle map (no Spark session, no subset filter) so
  * `scripts/lint_oracle_types.py` can type-check every oracle's DuckDB
  * result schema — the HUGEINT-vs-BIGINT hash-slip class (q11, q12,
  * dup_rate_by_source) is invisible to value-level compares and needs a
  * lint over the full surface, including queries a dev subset skipped. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_all.json")
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Verify.jsonStr(k)}: ${Verify.jsonStr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to $out")
  }
}
