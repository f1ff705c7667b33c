package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Recall-ordering pin for the ANN tiers: brute force is exact; multi-
  * probe LSH dominates single-probe LSH (it probes a superset of
  * buckets); both are bounded above by brute force. Deterministic
  * synthetic vectors, no oracle needed.
  */
class SimilaritySearchTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DIMS = 8

  // deterministic pseudo-random unit-ish vectors
  private def vec(seed: Long): Seq[Float] =
    Seq.tabulate(DIMS)(i => (((seed * 31 + i * 17) % 19).toFloat - 9f) / 10f)

  private def embs = ((0L until 4L).map(q => (q, vec(q * 7 + 3))) ++
    (100L until 140L).map(c => (c, vec(c)))).toDF("vec_id", "embedding")

  private def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.filter(col("rnk") === 1).select(col("q_vec"), col("cos"))
      .as[(Long, Double)].collect().toMap

  test("multi-probe LSH recall sits between single-probe and brute force") {
    val q = embs.filter(col("vec_id") < 4)
    val c = embs.filter(col("vec_id") >= 4)
    val bf = top1(SimilaritySearch.bruteForceTopK(q, c, k = 1))
    val sp = top1(SimilaritySearch.lshTopK(q, c, k = 1, nBits = 3, dims = DIMS))
    val mp = top1(SimilaritySearch.lshMultiProbeTopK(q, c, k = 1, nBits = 3, dims = DIMS))
    assert(bf.size == 4)
    // multi-probe probes a superset of single-probe's buckets
    assert(sp.keySet.subsetOf(mp.keySet))
    sp.foreach { case (qv, cos) => assert(mp(qv) >= cos - 1e-12) }
    // and never beats the exact scan
    mp.foreach { case (qv, cos) => assert(cos <= bf(qv) + 1e-12) }
  }
}
