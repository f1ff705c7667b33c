package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle management for the local checkpoints the iterative graph
  * operators create (CC, LPA, BFS, k-core, shortest path).
  *
  * Each round's `localCheckpoint(eager = true)` materializes into its
  * own cached blocks and truncates lineage, so once a LATER eager
  * checkpoint (or the operator's return value) no longer reads those
  * blocks they are dead weight on the executors. Spark reclaims them
  * only when the driver's ContextCleaner notices the RDD object is
  * unreachable — at some future GC. At scale that laziness is real
  * memory: a 400-round k-core peel would hold every superseded
  * frontier until the driver happens to GC. Two deterministic paths
  * replace that:
  *
  *  - operators [[release]] each SUPERSEDED checkpoint the moment its
  *    eager successor is materialized;
  *  - the FINAL checkpoint backing an operator's return value belongs
  *    to the caller — `spark.catalog.clearCache()` cannot see it (it
  *    is not a CacheManager entry), so [[releaseAll]] is the
  *    clearCache analog: call it once you have consumed every graft
  *    graph-operator result to drop their checkpoint blocks
  *    immediately instead of waiting for a GC. Results must not be
  *    re-read afterwards (a local checkpoint cannot recompute).
  *
  * Safety of [[release]]: an eager localCheckpoint's blocks are
  * self-contained (lineage truncated), so releasing a predecessor
  * cannot invalidate a successor; releasing a frame a live plan still
  * reads would lose data. CacheAccountingAuditTest pins both paths
  * over every declared query.
  */
object Ckpt {

  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[
    java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]]]()
  private val sincePrune = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Register `df`'s checkpoint RDD (weakly — the ContextCleaner GC
    * path stays usable) so [[releaseAll]] can drop it deterministically.
    * No-op unless the analyzed plan IS a bare LogicalRDD. Returns `df`.
    *
    * The registry self-prunes: every 64 adds, entries whose referent
    * the GC already cleared are dropped, so a long-lived driver that
    * relies solely on the ContextCleaner path (never calls
    * [[releaseAll]]) holds a bounded queue, not one node per
    * checkpoint ever created.
    */
  private[graft] def track(df: DataFrame): DataFrame = {
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        tracked.add(new java.lang.ref.WeakReference(lr.rdd))
        if (sincePrune.incrementAndGet() >= 64) {
          sincePrune.set(0)
          tracked.removeIf(_.get == null)
        }
      case _ => ()
    }
    df
  }

  /** No-op unless `df`'s analyzed plan IS a bare LogicalRDD — i.e. the
    * frame returned by checkpoint/localCheckpoint itself. Matching the
    * ROOT (not searching leaves) is the safety interlock: a derived
    * lazy frame's plan CONTAINS its inputs' LogicalRDD leaves, and
    * releasing those would free blocks a live plan still reads.
    */
  private[graft] def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Unpersist every graft-created local checkpoint still alive — the
    * `clearCache()` analog for checkpoint blocks. Call only when every
    * graph-operator result has been fully consumed.
    *
    * The registry is PROCESS-GLOBAL: this also drops the intermediate
    * checkpoints of any graft graph operator currently mid-flight on
    * another thread or session, and a local checkpoint cannot
    * recompute — the concurrent job would fail. Call releaseAll only
    * from a point where no graft graph operator is running anywhere in
    * the process (the Bench/Verify harnesses satisfy this by
    * construction: one query at a time).
    */
  def releaseAll(): Unit = {
    var ref = tracked.poll()
    while (ref != null) {
      val rdd = ref.get()
      if (rdd != null) rdd.unpersist(blocking = false)
      ref = tracked.poll()
    }
  }
}
