package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CountMinTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estimate(sk: Array[Long], x: Long, width: Int): Long =
    (0 until CountMin.DEPTH)
      .map(i => sk(i * width + CountMin.bucket(i, x, width))).min

  test("CMS never undercounts and is partition/merge-order independent") {
    val rnd = new Random(11)
    val stream = rnd.shuffle(
      (0L until 50L).flatMap(i => Seq.fill((2000 / (i + 1)).toInt)(i)))
    val truth = stream.groupBy(identity).map { case (x, xs) =>
      x -> xs.size.toLong
    }
    for (width <- Seq(8, 32, 128); trial <- 1 to 4) {
      val agg = new CountMinAgg(width)
      val nParts = 1 + rnd.nextInt(7)
      val parts = rnd.shuffle(
        stream.grouped(math.max(1, stream.size / nParts)).toSeq)
      val sk = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      // order independence: a straight sequential fold gives the same array
      val seq = stream.foldLeft(agg.zero)(agg.reduce)
      assert(sk.sameElements(seq), s"width=$width trial=$trial: order-dependent")
      truth.foreach { case (x, t) =>
        assert(estimate(sk, x, width) >= t, s"width=$width undercounts $x")
      }
      // total mass conservation per hash row
      assert((0 until CountMin.DEPTH).forall(i =>
        sk.slice(i * width, (i + 1) * width).sum == stream.size.toLong))
    }
  }

  test("wide sketch over distinct-ish keys is near-exact; narrow one collides") {
    val stream = (0L until 20L).flatMap(i => Seq.fill(10)(i))
    val wide = stream.foldLeft(new CountMinAgg(4096).zero)(
      new CountMinAgg(4096).reduce)
    assert((0L until 20L).forall(estimate(wide, _, 4096) == 10L))
    val narrow = stream.foldLeft(new CountMinAgg(4).zero)(
      new CountMinAgg(4).reduce)
    // 20 keys into 4 buckets: some estimate must exceed the true count
    assert((0L until 20L).exists(estimate(narrow, _, 4) > 10L))
  }

  test("distributed sketch over Spark equals the local fold exactly") {
    val keys = (0 until 3000).map(i => (i % 37).toLong)
    val width = 16
    val got = spark.createDataset(keys).repartition(8)
      .select(new CountMinAgg(width).toColumn).head()
    val want = keys.foldLeft(new CountMinAgg(width).zero)(
      new CountMinAgg(width).reduce)
    assert(got.sameElements(want))
  }

  test("width must be positive") {
    intercept[IllegalArgumentException](new CountMinAgg(0))
  }
}
