package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LabelPropTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelProp.communities(edges.toDF("a", "b"), iters)
      .as[(Long, Long)].collect().toMap

  test("two disjoint triangles settle on their min-id labels") {
    val out = lpa(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)), iters = 3)
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("a path graph floods to the min label within diameter rounds") {
    val out = lpa(Seq((1L, 2L), (2L, 3L), (3L, 4L)), iters = 4)
    assert(out.values.toSet == Set(1L))
  }

  test("fixed rounds are deterministic across runs and input order") {
    val edges = Seq((5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L),
      (20L, 21L), (21L, 22L))
    val a = lpa(edges, iters = 2)
    val b = lpa(edges.reverse, iters = 2)
    assert(a == b)
  }

  test("iters must be at least 1") {
    intercept[IllegalArgumentException] {
      LabelProp.communities(Seq((1L, 2L)).toDF("a", "b"), iters = 0)
    }
  }

  test("dense cores split across a bridge that reachability would merge") {
    // Two 4-cliques joined by one bridge edge: connected components give
    // ONE component; three LPA rounds keep the two dense cores apart.
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- i + 1 until ids.size)
        yield (ids(i), ids(j))
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) ++ Seq((4L, 11L))
    val cc = Dedup.componentsFromPairs(edges.toDF("a", "b"))
      .select(col("rep_doc_id")).distinct().count()
    assert(cc == 1)
    val out = lpa(edges, iters = 3)
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L))
    assert(Seq(12L, 13L, 14L).forall(out(_) == 11L))
    assert(out.values.toSet.size == 2)
  }
}
