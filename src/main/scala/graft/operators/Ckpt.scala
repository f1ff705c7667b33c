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
  *
  * CONCURRENCY (round 15): every graph operator runs its body inside
  * [[scoped]], which registers its checkpoints under a thread-local
  * operator scope. Entries owned by a still-open scope are INVISIBLE
  * to [[releaseAll]] — so a concurrent embedder thread calling
  * releaseAll() mid-flight of another operator can no longer free
  * that operator's live intermediates (the old process-global
  * contract). When a scope closes, its surviving entries transfer to
  * the enclosing scope if one is open on the same thread (an operator
  * composed inside another operator stays protected for the outer
  * run), else become releasable — exactly the "result now belongs to
  * the caller" hand-off the contract describes. CkptConcurrencyTest
  * pins the mid-flight-protection path.
  */
object Ckpt {

  /** One operator invocation's ownership token. Open from [[scoped]]
    * entry to exit; `releaseAll` skips entries owned by an open scope.
    */
  private final class Scope { @volatile var open = true }

  private final class Entry(
      val ref: java.lang.ref.WeakReference[org.apache.spark.rdd.RDD[_]],
      @volatile var owner: Scope)

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[Entry]()
  private val sincePrune = new java.util.concurrent.atomic.AtomicInteger(0)
  private val scopes = new ThreadLocal[List[Scope]] {
    override def initialValue: List[Scope] = Nil
  }

  /** Run `body` under a fresh operator scope: checkpoints [[track]]ed
    * inside are exempt from [[releaseAll]] until the scope exits. On
    * exit the entries re-home to the enclosing scope (if any) or become
    * releasable. Re-entrant; scope state is per-thread.
    *
    * PUBLIC for embedders: every graft graph operator already runs its
    * own body scoped (mid-flight intermediates are always safe), but an
    * operator's RESULT becomes releasable the moment the operator
    * returns — so an embedder that composes an operator and consumes
    * its result later, concurrent with other threads calling
    * [[releaseAll]], wraps the compose-and-consume span in its own
    * `Ckpt.scoped { ... }`: the result re-homes to that scope on the
    * operator's exit and stays protected until the span ends.
    */
  def scoped[A](body: => A): A = {
    val s = new Scope
    scopes.set(s :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      val parent = scopes.get() match {
        case p :: _ => p
        case Nil    => null
      }
      tracked.forEach(e => if (e.owner eq s) e.owner = parent)
      s.open = false
    }
  }

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
        val owner = scopes.get() match {
          case s :: _ => s
          case Nil    => null
        }
        tracked.add(new Entry(new java.lang.ref.WeakReference(lr.rdd), owner))
        if (sincePrune.incrementAndGet() >= 64) {
          sincePrune.set(0)
          tracked.removeIf(_.ref.get == null)
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

  /** Unpersist every graft-created local checkpoint whose operator has
    * RETURNED — the `clearCache()` analog for checkpoint blocks. Call
    * once you have consumed the graph-operator results you hold;
    * results must not be re-read afterwards. Checkpoints belonging to
    * an operator still mid-flight on any thread are left alone (their
    * scope is open), so concurrent embedders are safe.
    */
  def releaseAll(): Unit = {
    val it = tracked.iterator()
    while (it.hasNext) {
      val e = it.next()
      val owner = e.owner
      if (owner == null || !owner.open) {
        val rdd = e.ref.get()
        if (rdd != null) rdd.unpersist(blocking = false)
        it.remove()
      }
    }
  }
}
