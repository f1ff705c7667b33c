package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k aggregator (SURVEY §2.10's Aggregator path): keeps a
  * bounded k-element buffer of (score, id) pairs, so the shuffle carries
  * at most k entries per partition per group instead of every row — the
  * same partial top-k shape Spark's TakeOrderedAndProject uses for
  * global ORDER BY LIMIT k, exposed as a reusable aggregation (usable
  * per-group, where TakeOrderedAndProject doesn't apply).
  *
  * Ordering: descending score, ascending id on ties — total and
  * deterministic, with NaN ranked FIRST to match what the ranking-window
  * formulation this aggregator replaces would do (Spark and DuckDB both
  * treat NaN as greater than any double in ORDER BY ... DESC; the naive
  * Ordering.by(-s) would rank NaN last instead, silently changing
  * results whenever a NaN score appears, e.g. 0/0 cosine of a zero
  * vector).
  */
object TopKAgg {

  type Entry = (Double, Long) // (score, id)

  private val ord: Ordering[Entry] = new Ordering[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // DESC, NaN greatest
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // id ASC
    }
  }

  final case class TopK(k: Int)
    extends Aggregator[Entry, List[Entry], List[Entry]] {

    override def zero: List[Entry] = Nil

    private def trim(xs: List[Entry]): List[Entry] = xs.sorted(ord).take(k)

    override def reduce(buf: List[Entry], row: Entry): List[Entry] =
      trim(row :: buf)

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      trim(a ++ b)

    override def finish(buf: List[Entry]): List[Entry] = buf.sorted(ord)

    override def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder()

    override def outputEncoder: Encoder[List[Entry]] = ExpressionEncoder()
  }

  /** The (score, id) input encoder for functions.udaf registration. */
  val entryEncoder: Encoder[Entry] = ExpressionEncoder()
}
