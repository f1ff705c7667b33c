package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IvmTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("maintained join view equals full recompute under random splits") {
    val rnd = new Random(13)
    val facts = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(20) + 1).toLong, (rnd.nextInt(900) + 100).toLong))
    val dims = (1L to 20L).map(k => (k, s"g${k % 5}"))
    for (trial <- 1 to 3) {
      // random insert-only split of both sides, including lopsided ones
      val fCut = rnd.nextInt(facts.size + 1)
      val dCut = rnd.nextInt(dims.size + 1)
      val fShuf = rnd.shuffle(facts)
      val dShuf = rnd.shuffle(dims)
      val (f0, df) = fShuf.splitAt(fCut)
      val (d0, dd) = dShuf.splitAt(dCut)
      def fdf(xs: Seq[(Long, Long, Long)]) = xs.toDF("id", "ck", "v")
      def ddf(xs: Seq[(Long, String)]) = xs.toDF("ck", "g")
      val maintained = Ivm.maintainJoinAgg(
        fdf(f0), fdf(df), ddf(d0), ddf(dd), "ck", Seq("g"), col("v"), "s")
        .as[(String, Long)].collect().toMap
      val recomputed = fdf(facts).join(ddf(dims), "ck")
        .groupBy("g").agg(sum("v").as("s"))
        .as[(String, Long)].collect().toMap
      assert(maintained == recomputed, s"trial $trial fCut=$fCut dCut=$dCut")
    }
  }

  test("empty deltas: maintained view is the base view") {
    val f = Seq((1L, 1L, 10L), (2L, 1L, 5L)).toDF("id", "ck", "v")
    val d = Seq((1L, "a")).toDF("ck", "g")
    val empty_f = f.limit(0)
    val empty_d = d.limit(0)
    val m = Ivm.maintainJoinAgg(f, empty_f, d, empty_d, "ck",
      Seq("g"), col("v"), "s").as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 15L))
  }
}
