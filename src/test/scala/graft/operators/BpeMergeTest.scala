package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computable corpora for the BPE pair-merge trainer — pins the
  * greedy left-to-right overlap rule (the part a naive pair join gets
  * wrong) and the round chaining.
  */
class BpeMergeTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seqOf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "sym")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("sym"))

  test("mergeRound merges the top pair greedily, never overlapping") {
    // (a,a) appears at doc1 pos {1,2,3} (an overlap run) and doc2 pos 1:
    // count 4 beats (a,b)'s 2. Greedy left-to-right on the run of three
    // keeps matches 1 and 3: "a a a a b" -> "a_a a_a b", NOT three
    // merges from one run.
    val (next, top) = BpeMerge.mergeRound(
      seqOf(Seq((1L, "a a a a b"), (2L, "a a b"))))
    assert(top.as[(String, String, Long)].head() == (("a", "a", 4L)))
    val d1 = next.filter(col("doc_id") === 1L).orderBy("pos")
      .select("sym").as[String].collect().toSeq
    assert(d1 == Seq("a_a", "a_a", "b"))
    val d2 = next.filter(col("doc_id") === 2L).orderBy("pos")
      .select("sym").as[String].collect().toSeq
    assert(d2 == Seq("a_a", "b"))
    // positions re-number densely for the next round
    val pos1 = next.filter(col("doc_id") === 1L).orderBy("pos")
      .select("pos").as[Long].collect().toSeq
    assert(pos1 == Seq(1L, 2L, 3L))
  }

  test("trainMerges chains rounds over the merged symbols") {
    // round 1 fuses (x,y) [count 4]; round 2 fuses the fused symbol
    // pair (x_y,x_y) [count 2] — merges must see prior rounds' output
    val m = BpeMerge.trainMerges(
      seqOf(Seq((1L, "x y x y"), (2L, "x y x y"))), 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(m == Seq((1L, "x", "y", 4L), (2L, "x_y", "x_y", 2L)))
  }

  test("a round with no adjacent pair is a no-op, not a wipe") {
    // every doc is a single symbol -> zero pairs -> the merge table is
    // empty and the sequence must come through UNCHANGED (a cross join
    // against the empty top would silently drop all rows)
    val (next, top) = BpeMerge.mergeRound(seqOf(Seq((1L, "a"), (2L, "b"))))
    assert(top.count() == 0L)
    assert(next.orderBy("doc_id").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 1L, "a"), (2L, 1L, "b")))
    // trainAndApply over the degenerate corpus: stops after the first
    // exhausted round, keeps the corpus intact
    val (merges, fin) = BpeMerge.trainAndApply(seqOf(Seq((1L, "a"))), 3)
    assert(merges.count() == 0L)
    assert(fin.as[(Long, Long, String)].collect().toSeq == Seq((1L, 1L, "a")))
  }

  test("pairs never span document boundaries") {
    // (b,a) would only exist across the doc1|doc2 boundary
    val (_, top) = BpeMerge.mergeRound(seqOf(Seq((1L, "a b"), (2L, "a b"))))
    assert(top.as[(String, String, Long)].head() == (("a", "b", 2L)))
  }
}
