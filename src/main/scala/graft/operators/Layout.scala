package graft.operators

import org.apache.spark.sql.DataFrame

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
}
