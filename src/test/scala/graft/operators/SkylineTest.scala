package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkylineTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { q =>
      !pts.exists(p => p._2 <= q._2 && p._3 <= q._3 &&
        (p._2 < q._2 || p._3 < q._3))
    }.map(_._1).toSet

  test("skylineMinMin matches the NOT EXISTS definition at any bucket count") {
    val rnd = new scala.util.Random(42)
    val pts = (0L until 200L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val want = brute(pts)
    val df = pts.toDF("id", "x", "y")
    // 1 bucket (pure within-bucket path), 7 (boundaries mid-range), 64
    // (more buckets than distinct x: every width clamps to 1).
    for (b <- Seq(1, 7, 64)) {
      val got = Skyline.skylineMinMin(df, "x", "y", buckets = b)
        .select("id").as[Long].collect().toSet
      assert(got == want, s"buckets=$b")
    }
  }

  test("skylineMinMin keeps both members of an exact tie on the frontier") {
    val df = Seq(
      (1L, 5L, 5L), (2L, 5L, 5L), // tied frontier pair
      (3L, 5L, 6L), // dominated: same x, worse y
      (4L, 6L, 5L), // dominated: worse x, same y
      (5L, 4L, 9L) // frontier: best x
    ).toDF("id", "x", "y")
    val got = Skyline.skylineMinMin(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 5L))
  }
}
