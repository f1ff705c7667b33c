package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Equality pins for the round-11 distinct-value contractions: each
  * contracted query must emit bit-identical rows to the uncontracted
  * plan (kept inline here as the reference) on a replica-heavy corpus —
  * the regime the contraction exists for. The sf0.001 smoke corpus is
  * doubled with id-shifted copies, so every sequence group has >= 2
  * members and the expansion paths (self-exclusion, interleaved ids,
  * in-group ranks) are all exercised.
  */
class MiningContractionTest extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private lazy val replicatedEventsDir: String = {
    val base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // Uniform id shifts preserve each user's (ts, event_id) order, so a
    // replica user's sequence string is identical to its source's.
    val rep = base
      .withColumn("user_id", col("user_id") + lit(100000L))
      .withColumn("event_id", col("event_id") + lit(10000000L))
    val dir = java.nio.file.Files.createTempDirectory("graft-seqtopk").toString
    base.unionByName(rep).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  /** The pre-round-11 seq_topk_refblock plan, verbatim. */
  private def uncontractedSeqTopk(s: SparkSession, dir: String): DataFrame = {
    val seqs = graft.Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .groupBy(col("user_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("c")))),
        x => x.getField("c"))).as("fullseq"))
      .select(col("user_id"), substring(col("fullseq"), 1, 40).as("seq"))
      .persist()
    val refs = seqs.filter(col("user_id") < 8)
      .select(col("user_id").as("ref_id"), col("seq").as("rseq"))
    val rw = Window.partitionBy(col("user_id"))
      .orderBy(col("rdist"), col("ref_id"))
    val cells = seqs.crossJoin(broadcast(refs))
      .withColumn("rdist", levenshtein(col("seq"), col("rseq")).cast("long"))
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("seq"), col("ref_id").as("cell"))
      .persist()
    val probes = cells.filter(col("user_id") % 7 === 3)
      .select(col("user_id").as("probe"), col("seq").as("pseq"), col("cell"))
    val pw = Window.partitionBy(col("probe")).orderBy(col("dist"), col("cand"))
    probes.join(cells.select(col("user_id").as("cand"),
        col("seq").as("cseq"), col("cell")), Seq("cell"))
      .filter(col("cand") =!= col("probe"))
      .withColumn("dist", levenshtein(col("pseq"), col("cseq")).cast("long"))
      .withColumn("rnk", row_number().over(pw).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("probe"), col("rnk"), col("cand"), col("dist"))
      .orderBy(col("probe"), col("rnk"))
  }

  /** The pre-round-11 rfm_segments plan (unpartitioned ntile windows). */
  private def uncontractedRfm(s: SparkSession, dir: String): DataFrame = {
    val d2 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    val rfm = graft.Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("r"), count(lit(1)).as("f"),
        sum(d2(col("o_totalprice"))).as("m"))
    val seg = rfm
      .withColumn("rq", ntile(4).over(
        Window.orderBy(col("r").desc, col("o_custkey"))))
      .withColumn("fq", ntile(4).over(
        Window.orderBy(col("f").desc, col("o_custkey"))))
      .withColumn("mq", ntile(4).over(
        Window.orderBy(col("m").desc, col("o_custkey"))))
    seg.groupBy((col("rq") * 100 + col("fq") * 10 + col("mq"))
        .cast("long").as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m")).cast("double").as("monetary_total"))
      .orderBy(col("segment"))
  }

  test("rfm_segments distributed ntile equals the window ntile at every n mod 4") {
    import spark.implicits._
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val custs = orders.select(col("o_custkey")).distinct()
      .orderBy(col("o_custkey")).as[Long].collect()
    // Four corpora whose customer counts hit each n % 4 residue — the
    // ANSI tile rule's uneven-tail arithmetic differs at each.
    for (drop <- 0 until 4) {
      val keep = custs.dropRight(drop).toSet
      val dir = java.nio.file.Files.createTempDirectory(s"graft-rfm$drop").toString
      orders.filter(col("o_custkey").isInCollection(keep))
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val got = Mining.queries("rfm_segments")(spark, dir)
        .as[(Long, Long, Double)].collect().toSeq
      val want = uncontractedRfm(spark, dir)
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == want, s"n mod 4 residue case drop=$drop")
      spark.catalog.clearCache()
    }
  }

  test("revenue_concentration distributed rank equals the window rank") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val d2 = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
    val byCust = graft.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)" +
        " AS BIGINT)").as("cents"))
    val ranked = byCust
      .withColumn("i", row_number().over(
        Window.orderBy(col("cents"), col("o_custkey"))).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
    val want = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("cents")).as("total_cents"),
      sum(expr("CAST(i AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0))"))
        .as("iwx"),
      sum(when(col("i") > col("nn") - expr("nn div 5"), col("cents"))
        .otherwise(0L)).as("top20_cents"))
      .select(col("n"), col("total_cents"),
        expr("""CAST((CAST(1000 AS DECIMAL(38,0)) *
          |  (2 * iwx - (CAST(n AS DECIMAL(38,0)) + 1) *
          |    CAST(total_cents AS DECIMAL(38,0)))) div
          |  (CAST(n AS DECIMAL(38,0)) *
          |   CAST(total_cents AS DECIMAL(38,0))) AS BIGINT)"""
          .stripMargin).as("gini_permille"),
        expr("(1000 * top20_cents) div total_cents")
          .as("top20_share_permille"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val got = Mining.queries("revenue_concentration")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("seq_topk_refblock distinct-seq contraction equals uncontracted plan") {
    import spark.implicits._
    val dir = replicatedEventsDir
    val got = Mining.queries("seq_topk_refblock")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = uncontractedSeqTopk(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // Non-vacuous: replicas make dist-0 in-group matches, and singleton
    // probes exist too (original refs side).
    assert(want.nonEmpty && want.exists(_._4 == 0L))
    assert(got == want)
    spark.catalog.clearCache()
  }
}
