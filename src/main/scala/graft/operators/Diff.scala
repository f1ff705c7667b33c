package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diff/sync operators — the engine's reason to exist.
  *
  * The reference computes all seven of its diff queries inside SQL Server
  * (reference: src/jenzabar.py:51-58,74-75: MissingFacultyUsers,
  * MissingStudentUsers, MissingCourses, MissingSections, DailyEnrollment,
  * CtlLibraryCourses, CtlLibrarySections). This module internalizes that
  * externalized compute as Catalyst joins.
  *
  * Scale notes (100 TB posture):
  *  - `missingRows`/`changedRows` shuffle both sides on the key columns; at
  *    scale pre-bucket the mirror snapshot on the same keys so only the
  *    "truth" side shuffles.
  *  - When the mirror side is a small dimension, Catalyst/AQE picks a
  *    broadcast anti-join automatically; don't force it for big mirrors.
  *  - `changedRows` is one full-outer join, not two anti-joins — a single
  *    shuffle instead of two.
  */
object Diff {

  /** Anti-join: rows of `truth` whose key has no counterpart in `mirror`
    * (SURVEY §2.3 J2-J5, J7). Generalizes MissingFacultyUsers /
    * MissingStudentUsers / MissingCourses / MissingSections /
    * CtlLibrary* (reference src/jenzabar.py:52-58).
    */
  def missingRows(truth: DataFrame, mirror: DataFrame, keys: Seq[String]): DataFrame =
    truth.join(mirror.select(keys.map(col): _*), keys, "left_anti")

  /** Symmetric diff with status derivation (SURVEY §2.3 J6 —
    * DailyEnrollment.sql): rows only in `truth` become adds
    * (status=active), rows only in `mirror` become drops (status=deleted).
    * One full-outer join on the composite key; the Canvas SIS enrollment
    * format carries the status column
    * (reference tests/test_connect.py:160-161).
    */
  def changedRows(truth: DataFrame, mirror: DataFrame, keys: Seq[String]): DataFrame = {
    val t = truth.select(keys.map(col): _*).withColumn("_t", lit(1))
    val m = mirror.select(keys.map(col): _*).withColumn("_m", lit(1))
    t.join(m, keys, "full_outer")
      .filter(col("_t").isNull || col("_m").isNull)
      .withColumn("status", when(col("_m").isNull, lit("active")).otherwise(lit("deleted")))
      .select(keys.map(col) :+ col("status"): _*)
  }

  /** Per-entity change statistics (SURVEY §2.4 A3): what Canvas computes
    * server-side and the reference merely consumes
    * (reference src/canvas.py:136-162) — created/deleted counts keyed by
    * entity and status. Partial aggregation (map-side combine) makes this
    * a near-free pass over the diff output.
    */
  def changeStats(diff: DataFrame, entity: String): DataFrame =
    diff.groupBy(lit(entity).as("entity"), col("status"))
      .agg(count(lit(1)).as("n"))

  /** Broadcast dimension lookup (SURVEY §2.3 J1): resolve each fact row's
    * term against a tiny term dimension, reference src/canvas.py:19-27
    * (first match wins — the dimension is unique on the sis key).
    * Explicit `broadcast` because the dimension is known-tiny; at 100 TB
    * this avoids shuffling the fact side entirely.
    */
  def dimLookup(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                joinType: String = "left"): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), joinType)
}
