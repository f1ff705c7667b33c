package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Util._
import graft.Tables._
import graft.operators.{Dedup, Diff}

object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- cube_lineitem decomposition ----
    val li = lineitem(spark, sf)
    time("cube: plain groupBy 2 cols")(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("s")).collect())
    time("cube: cube count only")(
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")).collect())
    time("cube: cube + dsum")(
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("s")).collect())
    time("cube: cube + plain double sum")(
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s")).collect())

    // ---- change_stats decomposition ----
    val truth = li.filter(col("l_quantity") <= 45)
    val mirror = li.filter(col("l_discount") < 0.09)
    val diff = Diff.changedRows(truth, mirror, Seq("l_orderkey", "l_linenumber"))
    time("diff: count only")(diff.count())
    time("diff: groupBy status count")(
      diff.groupBy(col("status")).agg(count(lit(1))).collect())
    time("diff: changeStats (lit in groupBy)")(
      Diff.changeStats(diff, "Enrollment").collect())
    Diff.changeStats(diff, "Enrollment").explain()

    // ---- minhash decomposition ----
    val docs = documents(spark, sf).filter(col("doc_id") < 1500)
    val shingled = time("mh: shingleDocs count")(Dedup.shingleDocs(docs, 3)).count()
    println(s"shingled docs: $shingled")
    val sigs = Dedup.withMinhashSigs(Dedup.shingleDocs(docs, 3), 8)
    time("mh: sigs collect")(sigs.drop("sh").collect())
    val bandCols = (0 until 4).map { b =>
      md5(concat(col(s"sig${b * 2}"), col(s"sig${b * 2 + 1}")))
    }
    val banded = sigs.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
    time("mh: banded count")(banded.count())
    val l = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("a"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("b"))
    val cand = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("a") < col("b")).select(col("a"), col("b")).distinct()
    time("mh: cand count")(println("cand: " + cand.count()))
    // bucket skew
    banded.groupBy("band_idx", "band_hash").count()
      .orderBy(desc("count")).show(5, false)
    spark.stop()
  }
}
