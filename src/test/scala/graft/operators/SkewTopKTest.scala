package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TopKAgg

class SkewTopKTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg equals plain aggregation (hot key spread over salts)") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    val salted = Skew.saltedAgg(df, col("key"),
        pmod(xxhash64(col("v")), lit(8)),
        partials = Seq(sum(col("v")).as("ps"), count(lit(1)).as("pn")),
        finals = Seq(sum(col("ps")).as("s"), sum(col("pn")).as("n")))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val fact = (1 to 500).map(i => (i % 7L, i.toLong)).toDF("fk", "v")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("fk", "name")
    val plain = fact.join(dim, "fk").select("fk", "v", "name")
      .orderBy("fk", "v").collect().toSeq
    val salted = Skew.saltedJoin(fact, dim, "fk", saltN = 4)
      .select("fk", "v", "name").orderBy("fk", "v").collect().toSeq
    assert(salted == plain)
  }

  test("rowSalt spreads a single hot key across multiple salt buckets") {
    // All rows share one join key: a key-derived salt would collapse to a
    // single bucket (the bug ADVICE flagged); the row-content salt must
    // fan the hot key out over >1 of the 4 buckets.
    val hot = (1 to 200).map(i => (42L, i.toLong)).toDF("fk", "v")
    val nSalts = hot.select(Skew.rowSalt(hot, 4)).distinct().count()
    assert(nSalts > 1, s"hot key collapsed to $nSalts salt bucket(s)")
  }

  test("AQE splits the skewed join partition at runtime; saltedJoin matches it statically") {
    // The two skew defenses and when each applies:
    //  - AQE skew join: RUNTIME split of an oversized shuffle partition,
    //    join-only, needs accurate map output stats, and re-plans only
    //    sort-merge/shuffled-hash joins — zero user code, first choice
    //    for plain equi-joins at 100 TB.
    //  - Skew.saltedJoin: STATIC spread via a row salt — also covers what
    //    AQE cannot re-plan (aggregation skew, forced repartitions,
    //    streaming state keyed by the hot key), at the cost of
    //    replicating the dim side saltN times.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      val pad = "x" * 64
      // one hot key (0) owns 30k of 40k rows — a single reducer's worth
      val fact = spark.range(40000).select(
        when(col("id") < 30000, 0L).otherwise(col("id")).as("fk"),
        concat(lit(pad), col("id")).as("v"))
      val dim = spark.range(40000).select(col("id").as("fk"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "fk")
      // execute joined's OWN QueryExecution (count() would plan a separate
      // aggregate QE and leave this one un-finalized)
      val n = joined.collect().length.toLong
      assert(n == 40000L)
      // the final adaptive plan of the executed run carries the skew split
      val aqe = joined.queryExecution.executedPlan.toString
      assert(aqe.contains("skew=true"), aqe)
      // the static salt yields the same join result without AQE's help
      val salted = Skew.saltedJoin(fact, dim, "fk", saltN = 8)
      assert(salted.count() == n)
      val nSalts = fact.filter(col("fk") === 0L)
        .select(Skew.rowSalt(fact, 8)).distinct().count()
      assert(nSalts > 1, "hot key not spread across salt buckets")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter injects on a selective join (row-level runtime pruning)") {
    // The third 100 TB join defense next to broadcast and AQE skew
    // split: when a selective dimension filter can't push into the fact
    // scan, Spark builds a bloom filter from the filtered creation side
    // and applies might_contain on the fact side BEFORE the shuffle —
    // rows that can't join never leave the mappers. Thresholds are
    // size-gated (10 GB application-side scan by default), so the test
    // zeroes them to make the tiny fixture eligible; the assertion is
    // the plan shape, which is what carries to real scans.
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val sf = "/root/testdata/sf0.001"
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_orderpriority"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p)
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("TopK aggregator keeps exact k best with deterministic ties") {
    val topk = udaf(TopKAgg.TopK(3), TopKAgg.entryEncoder)
    val df = Seq(
      ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("a", 1.0, 4L), ("a", 7.0, 5L),
      ("b", 2.0, 6L)
    ).toDF("grp", "score", "id")
    val got = df.groupBy("grp")
      .agg(topk(col("score"), col("id")).as("top"))
      .orderBy("grp")
      .as[(String, Seq[(Double, Long)])].collect().toSeq
    assert(got == Seq(
      ("a", Seq((9.0, 2L), (9.0, 3L), (7.0, 5L))),
      ("b", Seq((2.0, 6L)))))
  }

  test("TopK aggregator ranks NaN first, matching ORDER BY score DESC semantics") {
    // Spark and DuckDB both sort NaN as greater than any double; the
    // ranking-window formulation this aggregator replaces would rank a
    // NaN score (0/0 cosine of a zero vector) first, so the aggregator
    // must too — Ordering.by(-s) would silently rank it last.
    val agg = TopKAgg.TopK(2)
    val buf = List((1.0, 1L), (Double.NaN, 5L), (2.0, 2L))
      .foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf)
    assert(out.map(_._2) == List(5L, 2L))
    assert(out.head._1.isNaN)
  }
}
