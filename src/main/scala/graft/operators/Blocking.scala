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

  /** Cache contract (applies to [[globalIndex]], [[groupedPrefixSum]],
    * [[exactQuantilesFromCounts]] and [[sortedNeighborhood]]): the
    * returned plan READS the internal range-partitioned persist — it
    * pins the sampled partition boundaries, so it cannot be released
    * inside the operator. The entry lives in the session CacheManager
    * until `spark.catalog.clearCache()`; canonicalization dedupes
    * repeat invocations on the same input, so a session holds at most
    * one entry per distinct input plan. Callers cycling many distinct
    * corpora in one session should clearCache between them (the
    * Dedup.materialized contract, documented there).
    */

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

  /** Distributed cumulative sum WITHIN groups: `cumName` = running total
    * of `valueCol` (long) over `sortCols` order within each group —
    * the running-count/CDF primitive behind weighted medians, exact
    * quantiles and equi-depth cuts — computed without any
    * group-proportional single-partition window. A plain
    * `Window.partitionBy(group).orderBy(sort)` moves every group
    * through ONE task; fine when groups are many and small, a pinch
    * point when a handful of groups each carry a value-domain-sized
    * tail (measured: 3 returnflag groups × ~2M distinct cents at the
    * organic 10x corpus). Same scheme as [[globalIndex]], generalized:
    *
    *  1. range-repartition by (group ++ sort) — order-contiguous within
    *     each group across partitions;
    *  2. per-partition running sum (window partitioned by
    *     (_pid, group) — parallel);
    *  3. per-(partition, group) subtotals prefix-summed along the
    *     partition axis (≤ numPartitions × |groups| rows) and broadcast
    *     back as offsets.
    *
    * `sortCols` must totally order rows WITHIN a group (callers pass
    * distinct-value tables or append a tiebreaker) — same contract as
    * [[globalIndex]].
    */
  def groupedPrefixSum(df: DataFrame, groupCols: Seq[String],
                       sortCols: Seq[Column], valueCol: String,
                       cumName: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val gc = groupCols.map(col)
    val parted = df.repartitionByRange(parts, gc ++ sortCols: _*)
      .withColumn("_pid", spark_partition_id().cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wLocal = Window.partitionBy(col("_pid") +: gc: _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_lcum", sum(col(valueCol)).over(wLocal))
    val wOff = Window.partitionBy(gc: _*).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("_pid") +: gc: _*)
      .agg(sum(col(valueCol)).as("_psum"))
      .withColumn("_off", coalesce(sum(col("_psum")).over(wOff), lit(0L)))
      .select(col("_pid") +: gc :+ col("_off"): _*)
    local.join(broadcast(offsets), "_pid" +: groupCols)
      .withColumn(cumName, col("_lcum") + col("_off"))
      .drop("_pid", "_lcum", "_off")
  }

  /** Exact per-group quantiles (linear interpolation) WITHOUT the
    * single value-domain-proportional `percentile` buffer: Spark's
    * exact `Percentile` aggregate carries a value→count map per group
    * through one final task, which at 100 TB means one task holding
    * every distinct value of the domain. This computes the identical
    * doubles from shuffle-parallel pieces:
    *
    *  1. distinct (group, value) counts — fact scale collapses to the
    *     distinct value domain via partial aggregation;
    *  2. [[groupedPrefixSum]] of the counts in value order — each value
    *     covers the 1-based rank interval (cum-cnt, cum];
    *  3. the |groups|×|probs| cut positions broadcast back: the rank
    *     interval containing floor/ceil of pos = (N-1)·p picks the two
    *     interpolation endpoints.
    *
    * The interpolation replicates `Percentile.getPercentile` operation
    * for operation — (hi−pos)·vLo + (pos−lo)·vHi, with the hi==lo and
    * vHi==vLo shortcuts — so results are bit-identical to the built-in
    * aggregate (DuckDB's quantile_cont agrees; pinned by the oracle).
    * Nulls are ignored, as in the built-in — including the all-null
    * edge: a group whose values are all NULL (and the ungrouped empty
    * or all-null input) yields a row with a NULL `qsName`, exactly as
    * `percentile(...)` does, via a left join of the quantile results
    * back onto the distinct group set. Returns one row per group:
    * groupCols + `qsName` (array<double>, in `probs` order).
    *
    * Cache contract (Blocking family): the distinct (group, value)
    * counts are persisted — they feed both the group set and the
    * quantile pipeline — and, like [[groupedPrefixSum]]'s internal
    * cache, the entry must live until the caller's clearCache;
    * canonicalization bounds it to one entry per distinct input.
    */
  def exactQuantiles(df0: DataFrame, groupCols0: Seq[String],
                     valueCol: String, probs: Seq[Double],
                     qsName: String = "qs"): DataFrame = {
    // one fact scan: count WITHOUT the null filter so all-null groups
    // survive into the group set; the quantile side filters nulls out.
    val allCounts = df0
      .groupBy(groupCols0.map(col) :+ col(valueCol): _*)
      .agg(count(lit(1)).as("_eq_cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = allCounts.filter(col(valueCol).isNotNull)
    val qs = exactQuantilesFromCounts(counts, groupCols0, valueCol,
      "_eq_cnt", probs, qsName)
    if (groupCols0.nonEmpty) {
      val groups = allCounts.select(groupCols0.map(col): _*).distinct()
      groups.join(qs, groupCols0, "left")
    } else {
      // group-by-nothing: the built-in returns exactly one row (NULL
      // on empty/all-null input) — anchor on a literal one-row frame.
      val one = df0.sparkSession.range(1).select(lit(1).as("_gg"))
      one.join(qs.withColumn("_gg", lit(1)), Seq("_gg"), "left")
        .select(col(qsName))
    }
  }

  /** [[exactQuantiles]] over a pre-aggregated (group, value, count)
    * table — for callers that already hold distinct-value counts (or
    * reuse them for other weighted aggregates, e.g. the equi-depth
    * histogram): the fact-scale reduction is paid once, everything
    * here is distinct-value-domain-sized. Null values must already be
    * excluded and (group, value) rows distinct.
    */
  def exactQuantilesFromCounts(counts0: DataFrame, groupCols0: Seq[String],
                               valueCol: String, cntCol: String,
                               probs: Seq[Double],
                               qsName: String = "qs"): DataFrame = {
    val base = counts0.select(
      groupCols0.map(col) ++
        Seq(col(valueCol).as("_v"), col(cntCol).as("_cnt")): _*)
    val (counts, groupCols) =
      if (groupCols0.nonEmpty) (base, groupCols0)
      else (base.withColumn("_g", lit(1)), Seq("_g"))
    val gc = groupCols.map(col)
    val cum = groupedPrefixSum(counts, groupCols, Seq(col("_v")),
      "_cnt", "_cum")
    val positions = cum.groupBy(gc: _*).agg(max(col("_cum")).as("_n"))
      .select(gc :+ col("_n") :+
        posexplode(array(probs.map(lit(_)): _*)).as(Seq("_pi", "_p")): _*)
      .withColumn("_pos", (col("_n") - 1).cast("double") * col("_p"))
      .withColumn("_lo", floor(col("_pos")))
      .withColumn("_hi", ceil(col("_pos")))
      .select(groupCols.map(n => col(n).as("_pg_" + n)) ++
        Seq(col("_pi"), col("_pos"), col("_lo"), col("_hi"),
          (col("_lo") + 1).as("_kLo"), (col("_hi") + 1).as("_kHi")): _*)
    val eqGroup = groupCols.map(n => col(n) === col("_pg_" + n))
      .reduce(_ && _)
    val prev = col("_cum") - col("_cnt")
    val covLo = col("_kLo") > prev && col("_kLo") <= col("_cum")
    val covHi = col("_kHi") > prev && col("_kHi") <= col("_cum")
    val q = cum
      .join(broadcast(positions), eqGroup && (covLo || covHi))
      .groupBy(gc :+ col("_pi"): _*)
      .agg(max(when(covLo, col("_v"))).as("_vLo"),
        max(when(covHi, col("_v"))).as("_vHi"),
        first(col("_pos")).as("_pos"), first(col("_lo")).as("_lo"),
        first(col("_hi")).as("_hi"))
      .withColumn("_q",
        when(col("_hi") === col("_lo") ||
             col("_vHi") === col("_vLo"), col("_vLo").cast("double"))
          .otherwise(
            (col("_hi").cast("double") - col("_pos")) *
              col("_vLo").cast("double") +
            (col("_pos") - col("_lo").cast("double")) *
              col("_vHi").cast("double")))
    q.groupBy(gc: _*)
      .agg(expr(s"transform(array_sort(collect_list(struct(_pi, _q)))," +
        " x -> x._q)").as(qsName))
      .drop("_g")
      .select((groupCols0.map(col) :+ col(qsName)): _*)
  }

  /** Neighbor-candidate pairs within a window of `w` consecutive rows of
    * the `sortCols` order. Output: every df column twice, suffixed _a
    * (the earlier row) and _b (the later row), for w-1 following
    * neighbors per row.
    *
    * Round-11 shape: almost every neighbor pair lies WITHIN one range
    * partition, where it is a `lead()` over the already-partitioned
    * order — zero extra shuffles, where the previous idx-equi-join
    * shuffled n·(w-1) fan-out rows plus the full corpus a second time.
    * Only pairs that STRADDLE a partition boundary (at most
    * 2·(w-1)·numPartitions candidate rows — partition-count-sized, not
    * corpus-sized) go through a broadcast range join on the global
    * index, restricted to rows in the first/last w-1 of their
    * partition: a cross-partition pair at index distance < w has at
    * most w-2 rows between its endpoints, so the earlier row is always
    * within w-1 of its partition's end and the later within w-1 of its
    * partition's start (empty partitions in between change nothing).
    * The in-partition and cross-partition sets are disjoint by pid, so
    * the union is exact.
    */
  def sortedNeighborhood(df: DataFrame, sortCols: Seq[Column],
                         w: Int): DataFrame = {
    require(w >= 2, s"window must cover at least 2 rows, got $w")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id().cast("long"))
    val wLocal = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    val cols = df.columns.toSeq
    val rowSt = struct(cols.map(col): _*)
    // Persisted for the same reason as globalIndex (one physical range
    // partitioning for all consumers) AND because three subtrees read
    // it: the lead pass, the per-partition counts, and the edge rows.
    val ranked = parted
      .withColumn("_rnk", row_number().over(wLocal).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aCols = cols.map(c => col(c).as(s"${c}_a"))
    val bFromSt = cols.map(c => col("_nb").getField(c).as(s"${c}_b"))
    val inPart = ranked
      .withColumn("_nbs",
        array((1 until w).map(off => lead(rowSt, off).over(wLocal)): _*))
      .select(aCols :+ explode(col("_nbs")).as("_nb"): _*)
      .filter(col("_nb").isNotNull)
      .select(cols.map(c => col(s"${c}_a")) ++ bFromSt: _*)
    val cnts = ranked.groupBy(col("_pid")).agg(max(col("_rnk")).as("_n"))
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cnts
      .withColumn("_off", coalesce(sum(col("_n")).over(wOff), lit(0L)))
    val edge = ranked.join(broadcast(offsets), Seq("_pid"))
      .filter(col("_rnk") <= (w - 1) || col("_rnk") > col("_n") - (w - 1))
      .withColumn("_idx", col("_off") + col("_rnk"))
    val ea = edge.select(
      aCols ++ Seq(col("_pid").as("_pa"), col("_idx").as("_ia")): _*)
    val eb = edge.select(
      cols.map(c => col(c).as(s"${c}_b")) ++
        Seq(col("_pid").as("_pb"), col("_idx").as("_ib")): _*)
    val crossPart = ea.join(broadcast(eb),
        col("_ib") - col("_ia") >= 1 && col("_ib") - col("_ia") <= (w - 1) &&
          col("_pa") =!= col("_pb"))
      .drop("_pa", "_pb", "_ia", "_ib")
    inPart.unionByName(crossPart)
  }
}
