package graft.operators

import org.apache.spark.sql.DataFrame

/** The reference's full sync run as one composable pipeline
  * (SURVEY §3.3): ERP truth vs Canvas mirror per entity → missing-row
  * anti-joins (J2-J5) + the enrollment symmetric diff (J6) → FK-ordered
  * sink loop (K3) → change report (K4/A3).
  *
  * Everything between the source scans and the sinks is one lazy Catalyst
  * lineage per entity; the FK order of the sink loop is the only
  * sequential constraint (it lives in driver code by design — it is a
  * correctness contract with the downstream SIS import, not a data
  * dependency Catalyst could see).
  */
object SyncPipeline {

  /** One entity's sync inputs: ERP truth, mirror snapshot, and the key
    * columns the diff runs on.
    */
  final case class Entity(name: String, truth: DataFrame, mirror: DataFrame,
                          keys: Seq[String], symmetric: Boolean = false)

  /** Compute the per-entity update sets: anti-join "missing" rows for
    * plain entities, add/drop status diff for symmetric ones
    * (DailyEnrollment, reference tests/test_connect.py:160-161).
    */
  def computeUpdates(entities: Seq[Entity]): Map[String, DataFrame] =
    entities.map { e =>
      val update =
        if (e.symmetric) Diff.changedRows(e.truth, e.mirror, e.keys)
        else Diff.missingRows(e.truth, e.mirror, e.keys)
      e.name -> update
    }.toMap

  /** Full run: updates → ordered sinks → report rows. Returns the sunk
    * dataset names (in order) and the change report.
    */
  def run(entities: Seq[Entity], order: Seq[String])
         (sink: (String, DataFrame) => Unit): (Seq[String], DataFrame) = {
    val updates = computeUpdates(entities)
    val sunk = SyncSink.uploadAll(updates, order)(sink)
    (sunk, SyncSink.changeReport(updates))
  }
}
