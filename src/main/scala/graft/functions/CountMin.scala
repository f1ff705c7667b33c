package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable count-min sketch over integer keys as a typed [[Aggregator]]
  * (SURVEY §2.4 A5 [EXT] — the overestimating twin of the Misra–Gries
  * sketch: CMS never undercounts, MG never overcounts; together they
  * bracket a key's true frequency from one pass each).
  *
  * Scale shape: the buffer is a fixed depth x width counter array —
  * map-side partials of constant size, element-wise-sum merge, so the
  * shuffle carries depth*width longs per partition regardless of input
  * rows or key cardinality.
  *
  * Determinism: counters are plain sums, so the finished array — and
  * therefore every estimate — is independent of partition and merge
  * order (unlike MG's order-dependent estimates). With the fixed hash
  * family below, an oracle can rebuild the exact counter array
  * relationally (group keys by bucket, sum) and hash-match estimates.
  *
  * Guarantee (Cormode & Muthukrishnan 2005): est(x) >= true(x) always;
  * est(x) <= true(x) + eps*n with probability 1-delta for
  * width = ceil(e/eps), depth = ceil(ln(1/delta)) under random hashes.
  * The deterministic half (no undercount) is what queries pin.
  */
object CountMin {

  /** 2^31 - 1, the Mersenne prime: (a*x + b) mod P fits int64 for
    * a, x < 2^31, and modding keys into [0, P) first keeps every
    * intermediate below 2^62 — the same arithmetic is exact in any
    * engine's 64-bit integers.
    */
  val P: Long = 2147483647L

  /** Fixed pairwise-independent hash constants, one row each (primes;
    * any a in [1, P), b in [0, P) works — fixed so oracles can mirror).
    */
  val A: Seq[Long] = Seq(1299721L, 15485863L, 32452843L, 49979687L)
  val B: Seq[Long] = Seq(7L, 911L, 104729L, 1299709L)

  val DEPTH: Int = A.length

  /** Bucket of key x in hash row i: ((a_i * (x mod P) + b_i) mod P) mod w.
    * Scala-side twin of [[bucketCol]] and the oracle SQL.
    */
  def bucket(i: Int, x: Long, width: Int): Int =
    ((A(i) * (((x % P) + P) % P) + B(i)) % P % width).toInt

  /** Column form of [[bucket]] for estimate lookups in declarative plans. */
  def bucketCol(i: Int, x: Column, width: Int): Column =
    (lit(A(i)) * pmod(x, lit(P)) + lit(B(i))) % lit(P) % lit(width)

  /** Estimate column: min over hash rows of the counter at (i, bucket_i(x)),
    * given the finished sketch as a (1-indexed) array column.
    */
  def estimateCol(sketch: Column, x: Column, width: Int): Column =
    least(0 until DEPTH map { i =>
      element_at(sketch, (lit(i * width) + bucketCol(i, x, width) + 1)
        .cast("int"))
    }: _*)

  /** Oracle SQL fragment for bucket_i(x) — identical arithmetic. */
  def bucketSql(i: Int, x: String, width: Int): String =
    s"((${A(i)} * ((($x % $P) + $P) % $P) + ${B(i)}) % $P) % $width"
}

class CountMinAgg(width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(width >= 1, "CountMinAgg needs a positive width")
  import CountMin._

  def zero: Array[Long] = new Array[Long](DEPTH * width)

  def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < DEPTH) {
      buf(i * width + bucket(i, x, width)) += 1L
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
