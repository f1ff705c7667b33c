package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-matched query packs.
  *
  * Determinism toolkit (SURVEY §7.5): double aggregation is done in exact
  * decimal arithmetic and cast back to double at the edge, so the result
  * is independent of Spark's partial-aggregation order AND bit-identical
  * to DuckDB's; timestamps leave queries as epoch micros; every query ends
  * in a total-order sort.
  */
object Util {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-insensitive double sum: sum in decimal, emit double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** decimal(18,2) view of a double column (exact for 2-dp synthetic data). */
  def d2(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact revenue term: extendedprice * (1 - discount) in decimal. */
  def revenue(price: Column, discount: Column): Column =
    sum(d2(price) * (lit(1) - d2(discount))).cast("double")

  /** Timestamp -> epoch microseconds (portable vs DuckDB epoch_us).
    * The cast normalizes TIMESTAMP_NTZ parquet columns (session tz is
    * pinned to UTC, so NTZ wall-clock == UTC instant, same as DuckDB's
    * naive-timestamp reading).
    */
  def tsUs(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
}
