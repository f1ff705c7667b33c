package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomGateTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("semiJoin equals the plain left-semi join (bloom only prunes)") {
    val build = (0L until 300L).filter(_ % 3 == 0).map(k => (k, s"b$k"))
      .toDF("k", "pay")
    val probe = (0L until 300L).map(k => (k, s"p$k")).toDF("k", "v")
    val want = probe.join(build.select("k").distinct(), Seq("k"), "left_semi")
      .select("k").as[Long].collect().sorted.toSeq
    val got = BloomGate.semiJoin(probe, build, "k",
      expectedItems = 100L, numBits = 1600L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == want)
  }

  test("bloom pre-filter prunes most disjoint-key probe rows pre-shuffle") {
    val build = (0L until 1000L).map(k => (k, "b")).toDF("k", "pay")
    val probe = (100000L until 101000L).map(k => (k, "p")).toDF("k", "v")
    val survivors = BloomGate.bloomPruned(probe, build, "k",
      expectedItems = 1000L, numBits = 8000L).count()
    // 8 bits/key ≈ 2% fpp: essentially all disjoint keys must be cut
    // before any shuffle. Generous bound to stay seed-robust.
    assert(survivors < 200, s"bloom pruned too little: $survivors/1000 survived")
  }
}
