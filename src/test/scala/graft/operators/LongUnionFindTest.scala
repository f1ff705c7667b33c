package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Unit coverage for the primitive union-find behind the star-contraction
  * passes: the min-root invariant and the star output must match a naive
  * reference under duplicate edges, self-loops, table growth (many more
  * keys than the initial capacity), and adversarial key patterns
  * (clustered, power-of-two strides, negatives).
  */
class LongUnionFindTest extends AnyFunSuite {

  /** naive reference: label every seen node with its component minimum */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def root(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = root(a); val rb = root(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.map(k => k -> root(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], cap: Int = 16): Unit = {
    val uf = new LongUnionFind(cap)
    edges.foreach { case (a, b) => uf.union(a, b) }
    val got = uf.stars.toSeq
    val ref = reference(edges)
    // stars emit every seen node exactly once
    assert(got.map(_._2).sorted == ref.keys.toSeq.sorted)
    // and each with its component-minimum root
    got.foreach { case (r, k) => assert(r == ref(k), s"node $k") }
  }

  test("chain, duplicates, self-loops, reversed links") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 2L),
      (5L, 5L), (7L, 6L), (9L, 8L), (8L, 7L)))
  }

  test("growth far past the initial capacity keeps components exact") {
    val rnd = new Random(7)
    // 50k edges over a 20k-node id space in [−10k, 10k): thousands of
    // merges, several grow() rehashes from cap=16
    val edges = Seq.fill(50000)(
      (rnd.nextInt(20000) - 10000L, rnd.nextInt(20000) - 10000L))
    check(edges, cap = 16)
  }

  test("adversarial keys: power-of-two strides and clustered runs") {
    val strided = (0 until 4096).map(i => (i.toLong << 16, (i.toLong + 1) << 16))
    check(strided)
    val clustered = (0 until 4096).map(i => (1000000L + i, 1000000L + (i % 7)))
    check(clustered)
  }

  test("min-root invariant under merge order reversal") {
    val rnd = new Random(13)
    val edges = Seq.fill(2000)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    check(edges)
    check(edges.reverse)
    check(edges.map { case (a, b) => (b, a) })
  }
}
