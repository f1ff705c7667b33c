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
}
