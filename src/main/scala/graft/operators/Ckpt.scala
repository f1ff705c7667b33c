package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of SUPERSEDED local checkpoints in the
  * iterative graph operators (CC, LPA, BFS, k-core, shortest path).
  *
  * Each round's `localCheckpoint(eager = true)` materializes into its
  * own cached blocks and truncates lineage, so once a LATER eager
  * checkpoint (or the operator's return value) no longer reads those
  * blocks they are dead weight on the executors — reclaimed only when
  * the driver's ContextCleaner notices the RDD object is unreachable,
  * i.e. at some future GC. At scale that laziness is real memory: a
  * 400-round k-core peel holds every superseded frontier until the
  * driver happens to GC. Operators therefore release superseded
  * checkpoints explicitly the moment their successor is materialized.
  *
  * Safety: ONLY call on a checkpoint no later plan reads. An eager
  * localCheckpoint's blocks are self-contained (lineage truncated), so
  * releasing a predecessor cannot invalidate a successor; releasing a
  * frame a live plan still reads would lose data (local checkpoints
  * cannot recompute). The FINAL checkpoint backing an operator's
  * return value is the caller's and is never released here — it drains
  * via the ContextCleaner when the caller drops the plan
  * (CacheAccountingAuditTest pins both paths).
  */
private[graft] object Ckpt {
  /** No-op unless `df`'s analyzed plan IS a bare LogicalRDD — i.e. the
    * frame returned by checkpoint/localCheckpoint itself. Matching the
    * ROOT (not searching leaves) is the safety interlock: a derived
    * lazy frame's plan CONTAINS its inputs' LogicalRDD leaves, and
    * releasing those would free blocks a live plan still reads.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
