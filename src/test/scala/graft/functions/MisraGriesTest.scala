package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MisraGriesTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference MG run entirely off-Spark: fold a stream through reduce,
    * merging partition sketches in the given order.
    */
  private def sketchOf(agg: MisraGriesAgg,
      parts: Seq[Seq[String]]): Map[String, Long] =
    parts.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)

  test("MG guarantee holds under arbitrary partitioning and merge order") {
    val rnd = new Random(7)
    // Zipf-ish stream: token i appears ~ 3000/(i+1) times.
    val stream = rnd.shuffle(
      (0 until 40).flatMap(i => Seq.fill(3000 / (i + 1))(s"t$i")))
    val truth = stream.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val n = stream.size.toLong
    for (k <- Seq(4, 8, 16); trial <- 1 to 5) {
      val agg = new MisraGriesAgg(k)
      val nParts = 1 + rnd.nextInt(7)
      val parts = stream.grouped(
        math.max(1, stream.size / nParts)).toSeq
      val sk = sketchOf(agg, rnd.shuffle(parts))
      assert(sk.size <= k, s"k=$k trial=$trial: sketch over budget")
      sk.foreach { case (t, est) =>
        assert(est <= truth(t), s"k=$k $t overestimates")
        assert(truth(t) - est <= n / (k + 1),
          s"k=$k $t misses the n/(k+1) bound")
      }
      // Guaranteed survivors: every token heavier than n/(k+1).
      truth.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { t =>
        assert(sk.contains(t), s"k=$k heavy token $t evicted")
      }
    }
  }

  test("distributed sketch over Spark matches the MG contract") {
    val tokens = (0 until 2000).map(i => s"w${i % 25}") ++
      Seq.fill(600)("hot")
    val ds = spark.createDataset(tokens).repartition(8)
    val sk = ds.select(new MisraGriesAgg(8).toColumn).head()
    val n = tokens.size.toLong
    assert(sk.size <= 8)
    assert(sk.contains("hot"), "guaranteed survivor evicted")
    assert(sk("hot") <= 600L && 600L - sk("hot") <= n / 9)
  }

  test("k must be positive") {
    intercept[IllegalArgumentException](new MisraGriesAgg(0))
  }
}
