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

  test("PQ-ADC: codes are bounded, distances admissible-ish, output deterministic") {
    val q = embs.filter(col("vec_id") < 4)
    val c = embs.filter(col("vec_id") >= 104)
    val seeds = embs.filter(col("vec_id") >= 100 && col("vec_id") < 104)
      .select((col("vec_id") - 100).as("cid"), col("embedding"))
    val pq = SimilaritySearch.pqTopK(q, c, seeds, m = 2, dims = DIMS, k = 3)
      .collect()
    // k rows per query, ranks 1..k, adist >= 0 and non-decreasing in rank
    assert(pq.length == 4 * 3)
    pq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Number](1).longValue)
      assert(byRank.map(_.getAs[Number](1).longValue).toSeq == Seq(1L, 2L, 3L))
      val d = byRank.map(_.getLong(3))
      assert(d.forall(_ >= 0L))
      assert(d.sameElements(d.sorted))
    }
    // deterministic: a second run returns the identical ranking
    val pq2 = SimilaritySearch.pqTopK(q, c, seeds, m = 2, dims = DIMS, k = 3)
      .collect()
    assert(pq.map(_.toSeq).toSet == pq2.map(_.toSeq).toSet)
  }

  test("IVF-PQ: probed-list routing bounds the scored set; ranks are deterministic") {
    val q = embs.filter(col("vec_id") < 4)
    val coarse = embs.filter(col("vec_id") >= 100 && col("vec_id") < 104)
      .select(col("vec_id").as("ccid"), col("embedding"))
    val c = embs.filter(col("vec_id") >= 104)
    def run() = SimilaritySearch.ivfPqTopK(q, c, coarse,
      m = 2, dims = DIMS, ksub = 4, k = 3, nprobe = 2).collect()
    val r1 = run()
    // <= k rows per query (a probed list can hold fewer than k candidates),
    // adist >= 0 and non-decreasing in rank
    assert(r1.nonEmpty && r1.length <= 4 * 3)
    r1.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val d = rows.sortBy(_.getAs[Number](1).longValue).map(_.getLong(3))
      assert(d.forall(_ >= 0L))
      assert(d.sameElements(d.sorted))
    }
    assert(r1.map(_.toSeq).toSet == run().map(_.toSeq).toSet)
    // nprobe = all lists scores at least as many pairs as nprobe = 2
    val all = SimilaritySearch.ivfPqTopK(q, c, coarse,
      m = 2, dims = DIMS, ksub = 4, k = 3, nprobe = 4).collect()
    assert(all.length >= r1.length)
  }

  test("PQ-ADC matches a transparent per-pair recomputation of the quantized pipeline") {
    // independent reconstruction: encode each candidate by scanning the
    // updated codebook per subspace, then sum the query's table entries —
    // the naive O(|C| * ksub) loop the operator's dataflow distributes
    val q = embs.filter(col("vec_id") < 2)
    val c = embs.filter(col("vec_id") >= 104)
    val seeds = embs.filter(col("vec_id") >= 100 && col("vec_id") < 104)
      .select((col("vec_id") - 100).as("cid"), col("embedding"))
    val m = 2; val sub = DIMS / m
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => math.floor(x * 10000 + 0.5).toLong).toArray
    val cand = c.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (id, v) => id -> quant(v) }
    val sds = seeds.select(col("cid"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (id, v) => id -> quant(v) }
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // train: one Lloyd round per subspace
    val codebook = (0 until m).map { s =>
      val seg = cand.map { case (id, v) => id -> v.slice(s * sub, (s + 1) * sub) }
      val cw0 = sds.map { case (cid, v) => cid -> v.slice(s * sub, (s + 1) * sub) }
      val asg = seg.map { case (id, v) =>
        id -> cw0.minBy { case (cid, cv) => (sqd(v, cv), cid) }._1 }.toMap
      val cw1 = cw0.flatMap { case (cid, _) =>
        val members = seg.filter { case (id, _) => asg(id) == cid }
        if (members.isEmpty) None
        else Some(cid -> Array.tabulate(sub)(d =>
          math.floor(members.map(_._2(d)).sum.toDouble / members.size).toLong))
      }
      s -> cw1
    }.toMap
    val queries = q.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (id, v) => id -> quant(v) }
    val expect = queries.flatMap { case (qid, qv) =>
      cand.map { case (cid0, cv) =>
        val adist = (0 until m).map { s =>
          val cseg = cv.slice(s * sub, (s + 1) * sub)
          val code = codebook(s).minBy { case (k2, w) => (sqd(cseg, w), k2) }._1
          sqd(qv.slice(s * sub, (s + 1) * sub), codebook(s).toMap.apply(code))
        }.sum
        (qid, cid0, adist)
      }.sortBy { case (_, cid0, d) => (d, cid0) }.take(3).zipWithIndex
        .map { case ((qid2, cid0, d), i) => (qid2, i + 1L, cid0, d) }
    }.toSet
    val got = SimilaritySearch.pqTopK(q, c, seeds, m = m, dims = DIMS, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
  }
}
