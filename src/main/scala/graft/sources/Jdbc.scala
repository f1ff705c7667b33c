package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink edge (SURVEY §2.1 S1/S2/S3/K2).
  *
  * The reference talks to the ERP (MS SQL Server) through a SQLAlchemy
  * engine (reference: src/jenzabar.py:14-16), reads config/entity tables
  * with pd.read_sql (src/jenzabar.py:23-24,75), and refreshes mirror
  * tables with DELETE + chunked multi-row INSERTs of 100 rows
  * (src/jenzabar.py:46-47). Spark's JDBC relation replaces all three:
  * predicate pushdown reaches the remote WHERE clause, `batchsize`
  * replaces the insert chunking, and truncate-overwrite preserves the
  * mirror's truncate-reload contract without dropping indexes/grants.
  *
  * Scale notes: `partitionColumn/lowerBound/upperBound/numPartitions`
  * shard a big table read across executors (each executor opens its own
  * connection with a range predicate); without them the read is a single
  * connection — fine for config/dimension tables only.
  */
object Jdbc {

  /** Connection descriptor (S1). Password handling is the caller's
    * concern — pass it in props, never embed it in the URL (the reference
    * URL-quotes it into the DSN, src/jenzabar.py:15).
    */
  final case class Conn(url: String, props: Properties = new Properties)

  /** Full-table scan (S2), e.g. the REG_CONFIG singleton row
    * (src/jenzabar.py:23-24).
    */
  def readTable(spark: SparkSession, conn: Conn, table: String): DataFrame =
    spark.read.jdbc(conn.url, table, conn.props)

  /** Pushed-down query scan (S3): the engine-side equivalent of running a
    * parameterized .sql file on the server (src/jenzabar.py:69-80) — the
    * dbtable subquery executes remotely, rows stream back.
    */
  def readQuery(spark: SparkSession, conn: Conn, sql: String): DataFrame =
    spark.read.jdbc(conn.url, s"($sql) q", conn.props)

  /** Range-partitioned scan for big tables: numPartitions concurrent
    * range reads on an indexed numeric column.
    */
  def readPartitioned(spark: SparkSession, conn: Conn, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.jdbc(conn.url, table, partitionColumn, lower, upper,
      numPartitions, conn.props)

  /** Truncate-and-load mirror refresh (K2): the reference's DELETE FROM +
    * chunked INSERT (chunksize=100, method="multi",
    * src/jenzabar.py:46-47) as a truncate-overwrite with batched inserts.
    * `allowed` mirrors the reference's target allow-list guard
    * (src/jenzabar.py:42-43).
    */
  def overwriteMirror(df: DataFrame, conn: Conn, table: String,
                      allowed: Set[String], batchSize: Int = 100): Unit = {
    require(allowed.contains(table), s"table $table not in mirror allow-list")
    df.write
      .mode(SaveMode.Overwrite)
      .option("truncate", "true")
      .option("batchsize", batchSize)
      .jdbc(conn.url, table, conn.props)
  }

  /** Append rows (the insert half of K2, exposed for incremental loads). */
  def append(df: DataFrame, conn: Conn, table: String, batchSize: Int = 100): Unit =
    df.write
      .mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(conn.url, table, conn.props)
}
