package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Advanced, Analytics, Audit, Core, Curation, Extended, Features, Insights, Media, Mining, Olap, Reshape, Signals, SimilarityQ, TemporalQ, TextDedup, TokenizerQ, WindowsQ}

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2, each paired (where SQL-expressible) with an ANSI-SQL
  * DuckDB oracle over the same parquet tables.
  *
  * Query packs live under [[graft.queries]]; this object is the flat
  * aggregation the driver reads.
  */
object SparkEntry {

  private def packs: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] =
    Seq(
      (Core.queries, Core.oracles),
      (Analytics.queries, Analytics.oracles),
      (TextDedup.queries, TextDedup.oracles),
      (Curation.queries, Curation.oracles),
      (SimilarityQ.queries, SimilarityQ.oracles),
      (WindowsQ.queries, WindowsQ.oracles),
      (TemporalQ.queries, TemporalQ.oracles),
      (Extended.queries, Extended.oracles),
      (Advanced.queries, Advanced.oracles),
      (Reshape.queries, Reshape.oracles),
      (Olap.queries, Olap.oracles),
      (TokenizerQ.queries, TokenizerQ.oracles),
      (Mining.queries, Mining.oracles),
      (Insights.queries, Insights.oracles),
      (Signals.queries, Signals.oracles),
      (Media.queries, Media.oracles),
      (Audit.queries, Audit.oracles),
      (Features.queries, Features.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
