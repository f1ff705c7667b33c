package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}

/** Storage-layout operators (SURVEY §4 / 100 TB posture): how mirrors
  * and fact tables should land on disk so the *next* job's plan is
  * cheap.
  *
  *  - Partitioning by a low-cardinality filter column (term, date) gives
  *    static partition pruning on literal filters and dynamic partition
  *    pruning (DPP) on dim-join filters — the 100 TB scan never touches
  *    out-of-term data. The reference effectively did this manually by
  *    binding (yr_cde, trm_cde) SQL params (src/jenzabar.py:75).
  *  - Bucketing by the join key co-locates both sides of a recurring
  *    join: equal bucket counts let SortMergeJoin run with NO exchange —
  *    the shuffle is paid once at write time, not on every sync run.
  */
object Layout {

  /** Term/date-partitioned parquet layout (partition pruning + DPP). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table layout (co-located joins). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Z-order (Morton) key: interleaves the low `bits` bits of two
    * non-negative integral columns (x in the even positions, y in the
    * odd), so that sorting / range-partitioning by the result clusters
    * rows that are close in BOTH dimensions. A 100 TB fact table laid
    * out this way gives parquet min/max stats that prune on EITHER
    * filter column — a single-column sort prunes on one and leaves the
    * other's ranges spanning every file.
    *
    * Pure bit arithmetic (shift/and/or), so it stays inside whole-stage
    * codegen and is reproducible by any engine — the DuckDB oracle
    * mirror is [[zValueSql]].
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ bitwiseOR _)

  /** ANSI-SQL mirror of [[zValue]] (bit positions are disjoint, so the
    * OR is written as + which every dialect parses).
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { k =>
      s"((($x >> $k) & 1) << ${2 * k}) + ((($y >> $k) & 1) << ${2 * k + 1})"
    }.mkString("(", " + ", ")")
}
