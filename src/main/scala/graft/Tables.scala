package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the engine's table surface.
  *
  * The reference stages every dataset as CSV files on local disk between
  * stages (reference: src/integrator.py:17, src/canvas.py:59); here each
  * table is a columnar Parquet scan and all intermediate state stays inside
  * one lazy Catalyst lineage. At 100 TB these would be partitioned
  * directories (e.g. term-partitioned mirrors for dynamic partition
  * pruning); the loader API is directory-based so that swap is free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan (SURVEY §2.1 S8). Column pruning + predicate pushdown
    * reach the scan automatically because nothing materializes in between.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** The events table's `ts` encoding varies by producer: some corpora
    * carry parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects, so it is read as a nanos-since-epoch long (via
    * `nanosAsLong`) and truncate-divided to a micros TIMESTAMP, matching
    * how DuckDB coerces TIMESTAMP_NS — while others are already micros
    * (TIMESTAMP or TIMESTAMP_NTZ). Dispatch on the type the reader
    * actually produced: the footer is read once either way, so the
    * branch costs nothing, and every downstream query sees one
    * canonical micros TIMESTAMP column (session tz pinned UTC, so the
    * NTZ wall-clock equals the instant).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** CSV scan with an explicit schema (SURVEY §2.1 S4): schema is inferred
    * at the edge in the reference (src/canvas.py:63) but contracted here —
    * no `inferSchema` on production paths (it costs a full extra pass).
    */
  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** CSV sink (SURVEY §2.1 K1; reference src/canvas.py:59). Single-file
    * output is only for small update files handed to a downstream REST
    * sink; large outputs keep their partitioning.
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** ORC scan (SURVEY §2.1 format coverage beyond the reference's
    * CSV-only staging). Spark's native ORC reader gives the same
    * vectorization + predicate pushdown + column pruning as parquet —
    * the interchange format when an upstream warehouse emits ORC.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSON-lines scan with a contracted schema — like [[csv]], never
    * `inferSchema` on a production path (inference is a full extra pass
    * over 100 TB). Malformed rows surface in the PERMISSIVE default's
    * corrupt-record column rather than killing the job; callers that
    * need fail-fast set mode=FAILFAST at the call site.
    */
  def jsonLines(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
