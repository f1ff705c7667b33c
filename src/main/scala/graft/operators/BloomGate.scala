package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-gated exact semi-join — the explicit, reusable form of the
  * runtime bloom filter Spark injects into selective joins (asserted on
  * an executed plan in SkewTopKTest): build a fixed-size Bloom filter
  * over the build side's keys with `bloom_filter_agg`, broadcast the ONE
  * resulting binary blob, prune probe rows with `might_contain` BEFORE
  * any shuffle, then make the result exact with a true semi join.
  *
  * Why this exists next to the automatic runtime filter: the injected
  * filter lives and dies inside one query; an explicit gate can be built
  * once over a 100 TB corpus's keys (a few MB of bits regardless of row
  * count — the sketch property) and reused across every incremental
  * batch that arrives, which is the shape of continuous dedup/ingest
  * pipelines. False positives cost only wasted verify-join work; false
  * negatives are impossible, so the verified output is exact and the
  * DuckDB oracle is the plain EXISTS semi join with no bloom anywhere.
  */
object BloomGate {

  // bloom_filter_agg / might_contain are not in the public function
  // registry (Spark reserves them for its own runtime-filter rewrite),
  // so the Columns are built from the catalyst expressions directly via
  // the same bridge the native dot-product kernel uses.
  private def bloomAgg(child: Column, items: Long, bits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    org.apache.spark.sql.GraftSqlBridge.column(
      new BloomFilterAggregate(
        org.apache.spark.sql.GraftSqlBridge.expression(xxhash64(child)),
        Literal(items), Literal(bits)).toAggregateExpression())
  }

  // might_contain demands its bloom input be a literal or scalar
  // subquery (the shape Spark's InjectRuntimeFilter emits), so the
  // one-row bloom aggregate rides in as a ScalarSubquery — executed
  // once, its few-KB binary result then broadcast into the probe filter.
  private def mightContain(bloomDf: DataFrame, child: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloomDf.queryExecution.analyzed),
        org.apache.spark.sql.GraftSqlBridge.expression(xxhash64(child))))

  /** Probe rows surviving the Bloom pre-filter only (superset of the
    * true matches by the no-false-negative property). Package-visible so
    * tests can measure the pruning rate.
    */
  private[operators] def bloomPruned(probe: DataFrame, build: DataFrame,
                                     key: String, expectedItems: Long,
                                     numBits: Long): DataFrame = {
    val bloom = build.agg(bloomAgg(col(key), expectedItems, numBits).as("_bf"))
    probe.filter(mightContain(bloom, col(key)))
  }

  /** Exact semi-join of `probe` against `build` on `key`, Bloom-gated:
    * same rows as `probe.join(build, key, "left_semi")`, but rows whose
    * key cannot be on the build side never reach the semi-join shuffle.
    */
  def semiJoin(probe: DataFrame, build: DataFrame, key: String,
               expectedItems: Long, numBits: Long): DataFrame =
    bloomPruned(probe, build, key, expectedItems, numBits)
      .join(build.select(col(key)).distinct(), Seq(key), "left_semi")
}
