package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Diff semantics reconstructed from the reference's seven SQL queries
  * (SURVEY §2.3 J2-J7): missing = left_anti; daily = symmetric diff with
  * status; plus the partition property missing ∪ present == truth.
  */
class DiffTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def truth = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    .toDF("id", "v")
  private def mirror = Seq((2L, "b"), (3L, "c"), (9L, "z")).toDF("id", "v")

  test("missingRows = rows of truth absent from mirror (J2-J5)") {
    val out = Diff.missingRows(truth, mirror, Seq("id"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("missing ∪ present partitions truth (property from SURVEY §5.4)") {
    val missing = Diff.missingRows(truth, mirror, Seq("id"))
    val present = truth.join(mirror.select("id"), Seq("id"), "left_semi")
    assert(missing.unionByName(present).collect().toSet == truth.collect().toSet)
  }

  test("changedRows emits adds as active and drops as deleted (J6)") {
    val out = Diff.changedRows(truth, mirror, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "active", 4L -> "active", 9L -> "deleted"))
  }

  test("changedRows is empty when truth == mirror") {
    assert(Diff.changedRows(truth, truth, Seq("id")).count() == 0)
  }

  test("changeStats counts per status (A3, canvas.py:136-162)") {
    val diff = Diff.changedRows(truth, mirror, Seq("id"))
    val stats = Diff.changeStats(diff, "Enrollment")
      .as[(String, String, Long)].collect().toSet
    assert(stats == Set(("Enrollment", "active", 2L), ("Enrollment", "deleted", 1L)))
  }

  test("changeSet classifies insert/update/delete and skips identical rows") {
    // mirror: key 2 identical, key 3 stale value, key 9 retired; truth
    // additionally has 1 and 4 (inserts).
    val stale = Seq((2L, "b"), (3L, "OLD"), (9L, "z")).toDF("id", "v")
    val cs = Diff.changeSet(truth, stale, Seq("id"))
      .as[(Long, Option[String], String)].collect().toSet
    assert(cs == Set(
      (1L, Some("a"), "upsert"), (4L, Some("d"), "upsert"),
      (3L, Some("c"), "upsert"), (9L, None, "delete")))
  }

  test("changeSet is empty when truth == mirror") {
    assert(Diff.changeSet(truth, truth, Seq("id")).count() == 0)
  }

  test("changeSet compares null-safely (null -> value and value -> null are updates)") {
    val t = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("id", "v")
    val m = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("id", "v")
    val cs = Diff.changeSet(t, m, Seq("id"))
      .as[(Long, Option[String], String)].collect().toSet
    assert(cs == Set((1L, Some("a"), "upsert"), (2L, None, "upsert")))
  }

  test("applyChanges . changeSet round-trips the mirror to truth (MERGE invariant)") {
    val stale = Seq((2L, "b"), (3L, "OLD"), (9L, "z")).toDF("id", "v")
    val next = Diff.applyChanges(stale, Diff.changeSet(truth, stale, Seq("id")), Seq("id"))
    assert(next.as[(Long, String)].collect().toSet ==
      truth.as[(Long, String)].collect().toSet)
  }

  test("applyChanges with an empty change set is the identity") {
    val empty = Diff.changeSet(truth, truth, Seq("id"))
    val next = Diff.applyChanges(truth, empty, Seq("id"))
    assert(next.as[(Long, String)].collect().toSet ==
      truth.as[(Long, String)].collect().toSet)
  }

  test("applyChanges applies a delete-only change set") {
    val cs = Seq((2L, Option.empty[String], "delete")).toDF("id", "v", "op")
    val next = Diff.applyChanges(truth, cs, Seq("id"))
    assert(next.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c"), (4L, "d")))
  }

  test("dimLookup broadcasts and resolves the term id (J1, canvas.py:19-27)") {
    val fact = Seq(("211S", 100L), ("212S", 101L), ("999X", 102L))
      .toDF("term", "payload")
    val dim = Seq(("211S", 42L), ("212S", 43L)).toDF("sis_term_id", "canvas_id")
    val out = Diff.dimLookup(fact, dim, "term", "sis_term_id")
    assert(out.count() == 3)
    assert(out.filter(col("term") === "211S").select("canvas_id")
      .as[Long].head() == 42L)
    assert(out.filter(col("term") === "999X").select("canvas_id")
      .collect().head.isNullAt(0))
  }
}
