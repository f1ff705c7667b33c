package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking for entity resolution (SURVEY §2.3 [EXT],
  * the classic Hernández/Stolfo merge/purge method): sort the corpus by a
  * blocking key, slide a window of w rows, and emit only
  * neighbor-candidate pairs — O(n·w) candidates instead of the O(n²)
  * cross product, and unlike equality blocking (dedup_levenshtein's
  * substring block) it catches near-misses that straddle block-key
  * boundaries.
  *
  * The crux at scale is the GLOBAL ROW NUMBER: the naive
  * row_number() over an unpartitioned window moves the corpus through one
  * task. [[globalIndex]] builds the same total-order index from
  * shuffle-parallel pieces:
  *
  *  1. range-repartition by the sort key (order-contiguous partitions);
  *  2. rank within each partition (window PARTITIONED by the range
  *     partition id — parallel);
  *  3. one tiny per-partition count table (numPartitions rows),
  *     prefix-summed and broadcast back as offsets.
  *
  * The result is boundary-placement-independent: whatever boundaries the
  * range sampler picks, order-contiguous partitions + within-partition
  * ranks + cumulative offsets reproduce the same global index, as long
  * as the sort columns are a TOTAL order (callers append a unique
  * tiebreaker — enforced here only by contract).
  */
object Blocking {

  /** `df` + `idx` (1-based global row number in `sortCols` order),
    * computed without any corpus-wide single-partition step.
    */
  def globalIndex(df: DataFrame, sortCols: Seq[Column],
                  numParts: Int = 0): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // Persisted: the ranked rows AND the per-partition count table below
    // both consume this range partitioning, and RangePartitioner's
    // sample seed derives from the RDD id — two independent executions
    // could pick DIFFERENT boundaries, making offsets inconsistent with
    // ranks. Without the persist, correctness would silently ride on
    // Spark's exchange-reuse rule collapsing the two exchanges; pinning
    // one physical partitioning removes that dependency.
    val parted = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id().cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wLocal = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    val ranked = parted.withColumn("_rnk", row_number().over(wLocal).cast("long"))
    // numPartitions rows: the cumulative count window is constant-size.
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    ranked.join(broadcast(offsets), Seq("_pid"))
      .withColumn("idx", col("_off") + col("_rnk"))
      .drop("_pid", "_rnk", "_off")
  }

  /** Neighbor-candidate pairs within a window of `w` consecutive rows of
    * the `sortCols` order. Output: every df column twice, suffixed _a
    * (the earlier row) and _b (the later row), for w-1 following
    * neighbors per row.
    *
    * The pair join is an equi-join on the global index via offset
    * fan-out (each row duplicated w-1 times with idx+1..idx+w-1), keyed
    * by idx — a uniformly distributed key, so no skew by construction.
    */
  def sortedNeighborhood(df: DataFrame, sortCols: Seq[Column],
                         w: Int): DataFrame = {
    require(w >= 2, s"window must cover at least 2 rows, got $w")
    val idxd = globalIndex(df, sortCols)
    val a = idxd.columns.filter(_ != "idx")
      .foldLeft(idxd)((d, c) => d.withColumnRenamed(c, s"${c}_a"))
    val b = idxd.columns.filter(_ != "idx")
      .foldLeft(idxd)((d, c) => d.withColumnRenamed(c, s"${c}_b"))
    a.withColumn("_off", explode(lit((1 until w).toArray)))
      .withColumn("_nidx", col("idx") + col("_off"))
      .drop("idx", "_off")
      .join(b, col("_nidx") === b("idx"))
      .drop("_nidx", "idx")
  }
}
