package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Terms

/** Property-based coverage (SURVEY §5 test plan, item 4): diff algebra,
  * clean-spec idempotence, term-increment round-trips, dedup fixpoint.
  * Uses scalacheck generators with a fixed seed and an explicit sample
  * loop (scalatestplus isn't on the offline classpath); samples stay
  * small because each property materializes Spark jobs.
  */
class PropertyTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic samples from a generator. */
  private def samples[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default.withSize(20), Seed(42L + i)))

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.oneOf("a", "b", "c")))

  test("diff algebra: missing(truth, mirror) ∪ present(truth, mirror) == truth") {
    for ((t, m) <- samples(Gen.zip(rowsGen, rowsGen))) {
      val truth = t.distinct.toDF("id", "v")
      val mirror = m.distinct.toDF("id", "v")
      val missing = Diff.missingRows(truth, mirror.select("id"), Seq("id"))
      val present = truth.join(mirror.select("id").distinct(), Seq("id"), "left_semi")
      val union = missing.unionByName(present)
      assert(union.count() == truth.count())
      assert(union.exceptAll(truth).count() == 0)
    }
  }

  test("MERGE invariant: applyChanges(mirror, changeSet(truth, mirror)) == truth") {
    // Generators can put the same key in both sides with different
    // values (updates), one side only (insert/delete), or equal rows
    // (no-op); rows are deduped to one-per-key to meet the contract.
    for ((t, m) <- samples(Gen.zip(rowsGen, rowsGen), 8)) {
      val truth = t.groupBy(_._1).map(_._2.head).toSeq.toDF("id", "v")
      val mirror = m.groupBy(_._1).map(_._2.head).toSeq.toDF("id", "v")
      val cs = Diff.changeSet(truth, mirror, Seq("id"))
      val next = Diff.applyChanges(mirror, cs, Seq("id"))
      assert(next.count() == truth.count())
      assert(next.exceptAll(truth).count() == 0)
      // Churn-proportional: unchanged keys never appear in the set.
      val unchanged = truth.intersect(mirror).select("id")
      assert(cs.join(unchanged, Seq("id"), "left_semi").count() == 0)
    }
  }

  test("changedRows: active ⊆ truth, deleted ⊆ mirror, disjoint, adds exact") {
    for ((t, m) <- samples(Gen.zip(rowsGen, rowsGen))) {
      val truth = t.map(_._1).distinct.toDF("id")
      val mirror = m.map(_._1).distinct.toDF("id")
      val diff = Diff.changedRows(truth, mirror, Seq("id"))
      val active = diff.filter($"status" === "active").select("id")
      val deleted = diff.filter($"status" === "deleted").select("id")
      assert(active.exceptAll(truth).count() == 0)
      assert(deleted.exceptAll(mirror).count() == 0)
      assert(active.intersect(deleted).count() == 0)
      assert(active.count() == truth.exceptAll(mirror).count())
    }
  }

  test("CleanSpec is idempotent on its own output") {
    val spec = CleanSpec(
      keep = Seq("id", "name"),
      rename = Map.empty,
      filters = Seq(col("id") > 0),
      recodes = Map.empty,
      literals = Nil)
    for (rows <- samples(rowsGen)) {
      val df = rows.toDF("id", "name")
      val once = spec(df)
      val twice = spec(once)
      assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
    }
  }

  test("term increment round-trips: two increments = next year, same semester") {
    for ((yr, trm) <- samples(Gen.zip(Gen.choose(10, 88), Gen.oneOf("1S", "2S")), 8)) {
      val df = Seq((f"$yr%02d", trm)).toDF("yr_cde", "trm_cde")
        .withColumn("n1", Terms.nextTerm(col("yr_cde"), col("trm_cde")))
        .withColumn("n1_yr", substring(col("n1"), 1, 2))
        .withColumn("n1_trm", substring(col("n1"), 3, 2))
        .withColumn("n2", Terms.nextTerm(col("n1_yr"), col("n1_trm")))
      val n2 = df.select("n2").as[String].head()
      assert(n2 == f"${yr + 1}%02d$trm")
    }
  }

  test("exact dedup is a fixpoint: deduping representatives changes nothing") {
    for (rows <- samples(rowsGen).filter(_.nonEmpty)) {
      val docs = rows.zipWithIndex
        .map { case ((_, v), i) => (i.toLong, s"text $v") }.toDF("doc_id", "text")
      val first = Dedup.exactDedup(docs)
      val reps = first.join(docs, first("rep_doc_id") === docs("doc_id"))
        .select(col("doc_id"), col("text"))
      val second = Dedup.exactDedup(reps)
      assert(second.count() == first.count())
      assert(second.filter($"n_dups" > 1).count() == 0)
    }
  }

  test("df ceilings only remove rows, never invent them; fraction==absolute at matching cap") {
    val docsGen = Gen.listOf(Gen.zip(Gen.choose(0L, 20L),
      Gen.listOfN(6, Gen.oneOf("u", "v", "w", "x", "y", "z"))))
    for (rows <- samples(docsGen, 4).filter(_.size > 2)) {
      val docs = rows.zipWithIndex
        .map { case ((_, ws), i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val inv = Dedup.shingleRows(docs, n = 3)
      val nDocs = inv.select("doc_id").distinct().count()
      for (cap <- Seq(1, 2, nDocs.toInt.max(1))) {
        val kept = Dedup.dfCeiling(inv, cap)
        // subset: every kept row exists in the input
        assert(kept.exceptAll(inv).count() == 0)
        // the fractional form with frac = cap/n gives the same universe
        val frac = cap.toDouble / nDocs
        val keptF = Dedup.dfCeilingFraction(inv, frac)
        assert(kept.exceptAll(keptF).count() == 0 &&
          keptF.exceptAll(kept).count() == 0)
      }
    }
  }

  test("pack_sequences: per-shard token conservation and contiguous pack ids") {
    val sf = "/root/testdata/sf0.001"
    val packs = graft.SparkEntry.queries("pack_sequences")(spark, sf)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totalTokens = docs
      .select(size(graft.functions.TextFns.tokens(col("text"))).cast("long"))
      .as[Long].collect().sum
    // conservation: every token lands in exactly one pack
    assert(packs.map(_._4).sum == totalTokens)
    assert(packs.map(_._3).sum == docs.count())
    // contiguity: concat-and-chunk leaves no empty pack between used ones
    packs.groupBy(_._1).foreach { case (shard, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids == (0L until ids.size), s"shard $shard ids $ids")
    }
  }

  test("IVM merge equals full recompute for ANY split point") {
    // algebraic aggregates (count, sum) re-aggregate from partials, so
    // base(<cut) merged with delta(>=cut) must match the one-shot
    // aggregate regardless of where the cut lands
    val rows = samples(Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(-100L, 100L))), 3)
    for (data <- rows if data.nonEmpty; cut <- Seq(-1L, 0L, 2L, 99L)) {
      val df = data.toDF("k", "v")
      def agg(d: org.apache.spark.sql.DataFrame) =
        d.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val merged = agg(df.filter($"v" < cut))
        .unionByName(agg(df.filter($"v" >= cut)))
        .groupBy($"k").agg(sum($"n").as("n"), sum($"s").as("s"))
        .as[(Long, Long, Long)].collect().toSet
      val full = agg(df).as[(Long, Long, Long)].collect().toSet
      assert(merged == full, s"cut=$cut")
    }
  }

  test("mirror checksum is invariant under repartitioning and row order") {
    val data = samples(Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 9L), Gen.alphaStr.map(_.take(8)))), 3)
    for (rows <- data if rows.nonEmpty) {
      def checksum(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = df
        .select($"k",
          conv(substring(md5(concat_ws("|", $"k", $"s")), 1, 10), 16, 10)
            .cast("long").as("rh"))
        .groupBy($"k").agg(sum($"rh").as("c"))
        .as[(Long, Long)].collect().toMap
      val base = checksum(rows.toDF("k", "s"))
      assert(checksum(rows.toDF("k", "s").repartition(7)) == base)
      assert(checksum(rows.reverse.toDF("k", "s").repartition(3)) == base)
    }
  }

  test("components: every rep is the true min of its component; labels closed under edges") {
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      .map(_.collect { case (a, b) if a != b => (a min b, a max b) }.distinct)
    for (pairs <- samples(pairGen, 4).filter(_.nonEmpty)) {
      val comp = Dedup.componentsFromPairs(pairs.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      // closure: both endpoints of every edge share a label
      pairs.foreach { case (a, b) => assert(comp(a) == comp(b), s"edge ($a,$b)") }
      // minimality: each label is the min doc_id among nodes holding it
      comp.groupBy(_._2).foreach { case (lbl, members) =>
        assert(members.keys.min == lbl)
      }
    }
  }
}
