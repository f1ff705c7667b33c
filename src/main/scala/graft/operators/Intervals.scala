package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed interval sets — the gaps-and-islands
  * family: merge overlapping/touching intervals into maximal islands and
  * report per-key coverage. Everything runs inside key-partitioned
  * windows (no global state, partition-parallel at any key cardinality);
  * arithmetic is whatever integral type the caller's bounds carry, so an
  * epoch-µs input yields exact µs coverage.
  *
  * Merge rule: intervals are closed-open [st, en); an interval starts a
  * new island iff its st is strictly greater than the running max of all
  * previous ends within the key (so touching intervals — st == prior en
  * — merge, the calendar/billing convention).
  */
object Intervals {

  /** Maximal merged islands per key: (key, island, ist, ien), island
    * numbered 1..n in st order within each key. `tie` breaks ordering
    * among equal starts so the window is a total order (any unique id).
    */
  def mergedIslands(df: DataFrame, key: Column, st: Column, en: Column,
                    tie: Column): DataFrame = {
    df.select(key.as("k"), st.as("st"), en.as("en"), tie.as("tie"))
      .withColumn("prev_max_en",
        max(col("en")).over(Window.partitionBy(col("k"))
          .orderBy(col("st"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_en").isNull ||
          col("st") > col("prev_max_en"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        Window.partitionBy(col("k")).orderBy(col("st"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("k"), col("island"))
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
  }

  /** Per-key island count and exact coverage (Σ island lengths):
    * (k, n_islands, coverage).
    */
  def coverage(df: DataFrame, key: Column, st: Column, en: Column,
               tie: Column): DataFrame =
    mergedIslands(df, key, st, en, tie)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ien") - col("ist")).cast("long").as("coverage"))
}
