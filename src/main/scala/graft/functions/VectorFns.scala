package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector expressions (SURVEY §2.9 similarity surface).
  *
  * Strategy: quantize float embeddings to integer vectors once
  * (floor(x*scale + 0.5) — identical double arithmetic in Spark and
  * DuckDB), then run all dot products in exact int64 arithmetic. Integer
  * sums are associative, so the result is independent of both Spark's
  * partial-aggregation order and DuckDB's list-sum order — cosine scores
  * hash-match bit-for-bit. The float->double widening is exact on both
  * engines, so the quantization itself is deterministic too.
  *
  * Built from higher-order functions per SURVEY §7.4 (built-ins first; a
  * codegen'd Catalyst Expression is the promotion path if bench demands).
  */
object VectorFns {

  /** float array -> quantized long array. */
  def quantize(vec: Column, scale: Int = 10000): Column =
    transform(vec, x => floor(x.cast("double") * scale + 0.5).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd expression (graft.functions.expressions.DotProductQ) with
    * bit-identical semantics to the HOF formulation
    * aggregate(zip_with(a,b,_*_),0,_+_) (including NULL on unequal
    * lengths or null elements), which interprets its lambdas per element.
    */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.DotProductQ(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Cosine similarity over quantized vectors: exact int dots, one sqrt
    * and one division in double — bit-identical across engines.
    */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b) / (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** L2 norm of a quantized vector (the sqrt(dotQ(v,v)) factor of cosineQ,
    * exposed so joins can precompute it once per vector instead of once
    * per pair — same double ops, same cosine bits).
    */
  def normQ(v: Column): Column = sqrt(dotQ(v, v).cast("double"))

  /** Deterministic pseudo-random projection weight for LSH bucket j,
    * dimension i: an LCG step mapped to [-1000, 1000]. Positive operands
    * only, so % behaves identically in Spark and DuckDB.
    */
  def projWeight(j: Int, i: Int, dims: Int): Long =
    (1103515245L * (j.toLong * dims + i) + 12345L) % 2001L - 1000L

  /** Sign-random-projection LSH bucket id over a quantized vector:
    * bit_j = [sum_i q(i) * w(offset+j,i) > 0], bucket = sum_j bit_j << j.
    * At 100 TB this is the blocking key that turns an O(n^2) similarity
    * scan into a per-bucket join. `offset` selects a disjoint projection
    * family, so `offset = t * nBits` yields independent hash tables for
    * banded (multi-table) LSH.
    */
  def lshBucket(q: Column, nBits: Int, dims: Int, offset: Int = 0): Column = {
    val bits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(q,
          typedLit((0 until dims).map(i => projWeight(offset + j, i, dims))),
          (x, w) => x * w),
        lit(0L), (acc, x) => acc + x)
      when(proj > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
