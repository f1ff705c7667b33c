package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (SURVEY §4 / 100 TB posture): when one key
  * dominates, a single reducer owns the whole hot key. Salting splits a
  * hot key across `saltN` reducers; AQE's skew-join handles the join
  * case at runtime, but *aggregation* skew and forced-shuffle cases
  * still want explicit salt.
  *
  * Determinism: the salt is a hash of stable columns (never rand()), so
  * replays and oracle comparisons see identical results.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) —
    * spreading a hot key over saltN reducers — then final-aggregate on
    * key. Works for any algebraic aggregate (sum/count/min/max): pass
    * the partial exprs and how to merge them.
    *
    * saltCol must be deterministic per row (e.g. pmod(hash(id), n)).
    */
  def saltedAgg(df: DataFrame, key: Column, saltCol: Column,
                partials: Seq[Column], finals: Seq[Column]): DataFrame =
    df.groupBy(key.as("k"), saltCol.as("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("k"))
      .agg(finals.head, finals.tail: _*)

  /** Salted broadcast-free join for a skewed fact against a small-ish
    * dim that is still too big to broadcast: fact rows get a
    * deterministic salt in [0, saltN); the dim side is replicated saltN
    * times so every (key, salt) bucket finds its match. The shuffle then
    * spreads each hot key over saltN partitions.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltN: Int, saltCols: Seq[String] = Nil): DataFrame = {
    val salted = fact.withColumn("_salt", rowSalt(fact, saltN, saltCols))
    val replicated = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(saltN - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Per-ROW deterministic salt in [0, saltN): a hash of `saltCols` (all
    * of `df`'s columns when empty). The salt must vary within a hot key —
    * a salt derived from the join key alone sends every row of that key
    * to one (key, salt) reducer and spreads nothing; pass an explicit
    * high-cardinality subset when the frame carries unhashable columns
    * (xxhash64 rejects MapType) or when a narrow subset hashes cheaper.
    * Identical rows (projected to the salt columns) share a salt
    * (acceptable: row-content skew, unlike key skew, is bounded by dedup
    * upstream); content-hashing keeps replays deterministic, unlike
    * rand() or monotonically_increasing_id().
    */
  def rowSalt(df: DataFrame, saltN: Int, saltCols: Seq[String] = Nil): Column = {
    val src = if (saltCols.nonEmpty) saltCols else df.columns.toSeq
    pmod(xxhash64(src.map(col): _*), lit(saltN)).cast("int")
  }
}
