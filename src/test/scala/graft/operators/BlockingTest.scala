package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BlockingTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def people = Seq(
    (1L, "smith john"), (2L, "smyth john"), (3L, "smith jon"),
    (4L, "adams kate"), (5L, "adamz kate"), (6L, "zheng li")
  ).toDF("id", "name")

  test("globalIndex reproduces the driver-side total order at any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(100000).toString))
    val want = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
    val df = rows.toDF("id", "key").repartition(13) // scrambled input
    for (parts <- Seq(1, 3, 8)) {
      val got = Blocking.globalIndex(df, Seq(col("key"), col("id")), parts)
        .orderBy(col("idx"))
        .select("id").as[Long].collect().toSeq
      assert(got == want, s"numParts=$parts")
      // idx is a 1..n permutation
      val idxs = Blocking.globalIndex(df, Seq(col("key"), col("id")), parts)
        .select("idx").as[Long].collect().sorted
      assert(idxs.toSeq == (1L to 500L))
    }
  }

  test("sortedNeighborhood pairs cross equality-block boundaries") {
    // name order: adams kate, adamz kate, smith john, smith jon,
    //             smyth john, zheng li
    val pairs = Blocking.sortedNeighborhood(people,
      Seq(col("name"), col("id")), w = 2)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 5L), (5L, 1L), (1L, 3L), (3L, 2L), (2L, 6L)))
    // (4,5) and (3,2) are exactly the near-misses a first-letter
    // equality block keeps, while (5,1)/(2,6) are the junk a distance
    // filter then removes — the SNM contract.
  }

  test("sortedNeighborhood equals the driver-side reference (random, dup-heavy)") {
    // Duplicate-heavy keys force many equal-key runs across partition
    // boundaries; small partitions force the cross-partition edge path.
    val rnd = new scala.util.Random(11)
    val rows = (0L until 400L).map(i => (i, rnd.nextInt(40).toString))
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    for (w <- Seq(2, 3, 4)) {
      val want = (for {
        i <- sorted.indices
        j <- (i + 1) until math.min(i + w, sorted.size)
      } yield (sorted(i)._1, sorted(j)._1)).toSet
      val got = Blocking.sortedNeighborhood(
        rows.toDF("id", "key").repartition(7),
        Seq(col("key"), col("id")), w)
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
      assert(got.length == want.size, s"w=$w: duplicate or missing pairs")
      assert(got.toSet == want, s"w=$w")
    }
    spark.catalog.clearCache()
  }

  test("groupedPrefixSum equals the driver-side per-group running sum") {
    // Few groups, many rows per group (the regime the operator exists
    // for), scrambled input, group tails straddling range partitions.
    val rnd = new scala.util.Random(23)
    val rows = (0L until 600L).map { i =>
      (Seq("A", "B", "C")(rnd.nextInt(3)), i, 1L + rnd.nextInt(9))
    }
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(_._2).scanLeft((g, -1L, 0L)) { case ((_, _, acc), r) =>
        (g, r._2, acc + r._3)
      }.tail
    }.toSet
    val got = Blocking.groupedPrefixSum(
        rows.toDF("g", "k", "v").repartition(11),
        Seq("g"), Seq(col("k")), "v", "cum")
      .select(col("g"), col("k"), col("cum"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("exactQuantiles is bit-identical to the built-in percentile aggregate") {
    // Tie-heavy random longs (interpolation endpoints often equal),
    // skewed group sizes, probs hitting integer and fractional
    // positions. Doubles compared EXACTLY — the operator's contract is
    // bit-equality with Percentile, not closeness.
    val rnd = new scala.util.Random(41)
    val rows = (0L until 2000L).map { i =>
      (Seq("A", "A", "A", "B", "C")(rnd.nextInt(5)), i,
        rnd.nextInt(40).toLong * 97L)
    }
    val df = rows.toDF("g", "k", "v").repartition(11)
    for (probs <- Seq(Seq(0.5), Seq(0.1, 0.25, 0.5, 0.75, 0.9),
                      (1 to 9).map(_ / 10.0))) {
      val want = df.groupBy(col("g"))
        .agg(percentile(col("v"), array(probs.map(lit(_)): _*)).as("qs"))
        .as[(String, Seq[Double])].collect().toMap
      val got = Blocking.exactQuantiles(df, Seq("g"), "v", probs)
        .as[(String, Seq[Double])].collect().toMap
      assert(got == want, s"probs=$probs")
      // ungrouped path (the injected constant group)
      val wantAll = df.agg(
        percentile(col("v"), array(probs.map(lit(_)): _*))).as[Seq[Double]]
        .head()
      val gotAll = Blocking.exactQuantiles(df, Nil, "v", probs)
        .as[Seq[Double]].head()
      assert(gotAll == wantAll, s"ungrouped probs=$probs")
    }
    // nulls ignored, single-row group (every prob returns the value)
    val tiny = Seq(("A", 1L, Some(5L)), ("A", 2L, None), ("B", 3L, Some(7L)))
      .toDF("g", "k", "v")
    val got = Blocking.exactQuantiles(tiny, Seq("g"), "v", Seq(0.25, 0.9))
      .as[(String, Seq[Double])].collect().toMap
    assert(got == Map("A" -> Seq(5.0, 5.0), "B" -> Seq(7.0, 7.0)))
    // all-null group: the built-in returns a row with NULL — so do we
    // (the group set is taken before the null filter, left-joined back)
    val edged = Seq(("A", 1L, Some(5L)), ("N", 2L, Option.empty[Long]),
      ("N", 3L, Option.empty[Long])).toDF("g", "k", "v")
    val wantEdge = edged.groupBy(col("g"))
      .agg(percentile(col("v"), array(lit(0.5))).as("qs"))
      .as[(String, Option[Seq[Double]])].collect().toMap
    val gotEdge = Blocking.exactQuantiles(edged, Seq("g"), "v", Seq(0.5))
      .as[(String, Option[Seq[Double]])].collect().toMap
    assert(gotEdge == wantEdge && gotEdge("N").isEmpty)
    // ungrouped all-null and truly-empty inputs: exactly one NULL row,
    // matching the built-in's group-by-nothing contract
    for (in <- Seq(edged.filter(col("g") === "N"), edged.filter(lit(false)))) {
      val wantOne = in.agg(percentile(col("v"), array(lit(0.5))).as("qs"))
        .as[Option[Seq[Double]]].collect().toSeq
      val gotOne = Blocking.exactQuantiles(in, Nil, "v", Seq(0.5))
        .as[Option[Seq[Double]]].collect().toSeq
      assert(gotOne == wantOne && gotOne == Seq(None))
    }
    spark.catalog.clearCache()
  }

  test("sortedNeighborhood w=3 adds the skip-one pairs") {
    val w2 = Blocking.sortedNeighborhood(people, Seq(col("name"), col("id")), w = 2)
    val w3 = Blocking.sortedNeighborhood(people, Seq(col("name"), col("id")), w = 3)
    assert(w2.count() == 5) // n-1
    assert(w3.count() == 9) // (n-1) + (n-2)
  }
}
