package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KCoreTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corenessOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    KCore.coreness(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("mixed graph: clique, triangle, chain, pendant") {
    // 4-clique {1,2,3,4} — coreness 3; bridge chain 4-5, 5-6 — 5 and 6
    // peel at level 2 (coreness 1); triangle {7,8,9} — coreness 2;
    // pendant 9-10 — node 10 coreness 1.
    val clique = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    val rest = Seq((4L, 5L), (5L, 6L), (7L, 8L), (7L, 9L), (8L, 9L), (9L, 10L))
    val result = corenessOf(clique ++ rest)
    val expected = Map(
      1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L,
      7L -> 2L, 8L -> 2L, 9L -> 2L, 10L -> 1L)
    assert(result == expected)
  }

  test("single edge: both endpoints coreness 1") {
    assert(corenessOf(Seq((1L, 2L))) == Map(1L -> 1L, 2L -> 1L))
  }

  test("cascading peel: a chain fully unravels at level 2") {
    // A path graph has an empty 2-core; every node must end at 1.
    val chain = (1L until 6L).map(i => (i, i + 1))
    val result = corenessOf(chain)
    assert(result == (1L to 6L).map(_ -> 1L).toMap)
  }

  test("matches a reference peeling implementation on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 25
      val pairs = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.15
      } yield (i, j)).toVector
      if (pairs.nonEmpty) {
        // reference: sequential peeling over an adjacency map
        var adj = pairs.flatMap(p => Seq(p, p.swap))
          .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
        val ref = scala.collection.mutable.Map.empty[Long, Long]
        var k = 1L
        while (adj.nonEmpty) {
          var changed = true
          while (changed) {
            val below = adj.filter(_._2.size < k).keySet
            changed = below.nonEmpty
            below.foreach { v => ref(v) = k - 1 }
            adj = (adj -- below).map { case (u, vs) => u -> (vs -- below) }
          }
          adj.keys.foreach(v => ref(v) = k)
          k += 1
        }
        assert(corenessOf(pairs) == ref.toMap, s"trial $trial")
      }
    }
  }

  test("h-index iteration converges to exact peeling coreness") {
    // Lü et al. 2016: the iterated neighbor H-index equals coreness at
    // its fixpoint, and the sequence is pointwise non-increasing — so
    // at a rounds count past convergence the fixed-round operator must
    // equal the peeling one. Random graphs, same generator family as
    // the peeling reference test; plus extra rounds are a no-op.
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 25
      val pairs = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.2
      } yield (i, j)).toVector
      if (pairs.nonEmpty) {
        val exact = corenessOf(pairs)
        val h = KCore.corenessHIndex(pairs.toDF("a", "b"), rounds = 25)
          .as[(Long, Long)].collect().toMap
        assert(h == exact, s"trial $trial")
        val h2 = KCore.corenessHIndex(pairs.toDF("a", "b"), rounds = 30)
          .as[(Long, Long)].collect().toMap
        assert(h2 == h, s"trial $trial idempotent tail")
      }
    }
  }

  test("h-index fixed rounds: clique-union dup graph converges by 2") {
    // The kcore_docs regime: near-dup graphs are unions of replica
    // cliques (+ pendants). Convergence depth here is <= 2, well under
    // the query's declared KCORE_ROUNDS=4.
    val clique = for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)
    val g = clique ++ Seq((5L, 6L), (7L, 8L))
    val exact = corenessOf(g)
    val h2 = KCore.corenessHIndex(g.toDF("a", "b"), rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(h2 == exact)
  }
}
