package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Intervals]] against a brute-force in-memory reference on
  * random keyed interval sets — the gaps-and-islands window dance is
  * exactly the kind of off-by-one-prone logic a property test catches
  * (touching vs overlapping, duplicate starts, containment, singleton
  * keys).
  */
class IntervalsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(30), Seed(77L + i)))

  /** Brute-force merge: sort by start, sweep with a running max end. */
  private def refMerge(iv: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = iv.sorted
    val out = collection.mutable.ListBuffer.empty[(Long, Long)]
    for ((s, e) <- sorted) {
      if (out.nonEmpty && s <= out.last._2)
        out(out.size - 1) = (out.last._1, math.max(out.last._2, e))
      else out += ((s, e))
    }
    out.toSeq
  }

  private val intervalsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(for {
      k <- Gen.choose(0L, 3L)
      s <- Gen.choose(0L, 50L)
      len <- Gen.choose(0L, 10L)
    } yield (k, s, s + len))

  test("mergedIslands matches brute-force sweep on random keyed intervals") {
    for ((rows, i) <- samples(intervalsGen, 8).zipWithIndex) {
      val df = rows.zipWithIndex
        .map { case ((k, s, e), id) => (k, s, e, id.toLong) }
        .toDF("k0", "st0", "en0", "id")
      val got = Intervals
        .mergedIslands(df, col("k0"), col("st0"), col("en0"), col("id"))
        .select(col("k"), col("ist"), col("ien"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = rows.groupBy(_._1).flatMap { case (k, iv) =>
        refMerge(iv.map(t => (t._2, t._3))).map { case (s, e) => (k, s, e) }
      }.toSet
      assert(got == want, s"sample $i: $rows")
    }
  }

  test("coverage sums island lengths and counts islands") {
    val df = Seq(
      (1L, 0L, 10L, 1L), (1L, 5L, 12L, 2L),   // overlap -> [0,12)
      (1L, 12L, 20L, 3L),                      // touching -> merges
      (1L, 30L, 31L, 4L),                      // separate island
      (2L, 0L, 1L, 5L)
    ).toDF("k0", "st0", "en0", "id")
    val got = Intervals
      .coverage(df, col("k0"), col("st0"), col("en0"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 21L), (2L, 1L, 1L)))
  }
}
