package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters sketch as a typed [[Aggregator]]
  * (SURVEY §2.4 A5 [EXT] — frequent-items mining over token streams; the
  * reference has no sketch surface, this is north-star scope like HLL).
  *
  * Scale shape: the sketch is a k-entry map, so the aggregation is one
  * pass with map-side partial sketches of bounded size — the shuffle
  * carries at most k counters per partition regardless of input rows,
  * exactly the profile an exact groupBy+count lacks at 100 TB vocabulary
  * sizes.
  *
  * Guarantees (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): for every item x after any
  * sequence of reduces and merges over n total items,
  *
  *   est(x) <= true(x)  and  true(x) - est(x) <= n / (k+1)
  *
  * so any item with true(x) > n/(k+1) is guaranteed to survive in the
  * sketch — that survivor set is deterministic even though the est
  * values themselves depend on partition/merge order. Queries that need
  * an order-independent (oracle-hashable) output therefore emit the
  * guaranteed-survivor set plus a bound check, never raw estimates.
  *
  * Merge rule: sum the two counter maps; if more than k entries remain,
  * subtract the (k+1)-th largest count from every entry and drop the
  * non-positive ones (at most k survive). This preserves the n/(k+1)
  * bound because each merge's subtraction is itself a batched sequence
  * of MG decrement steps.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "MisraGriesAgg needs at least one counter")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c)            => b.updated(tok, c + 1L)
      case None if b.size < k => b.updated(tok, 1L)
      // Counter table full and tok absent: the classic MG decrement-all
      // step (tok's implicit +1 and one -1 cancel; zeros drop out).
      case None =>
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (summed.size <= k) summed
    else {
      // (k+1)-th largest count; subtracting it leaves <= k positives.
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) =>
        if (c > cut) Some(t -> (c - cut)) else None
      }
    }
  }

  def finish(r: Map[String, Long]): Map[String, Long] = r

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
