package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (dominance frontier) — the multi-objective
  * generalization of the running-record-low frontier
  * (queries/Reshape.scala `price_record_lows`): a point survives iff no
  * other point is at least as good on BOTH axes and strictly better on
  * one. Reference analogue: the reference's report stage surfaces
  * "best-available" rows; the skyline is that idea with two competing
  * objectives (SURVEY §2.4 [EXT]).
  *
  * Scale design: the textbook formulations are a NOT EXISTS self-join
  * (O(n²) — the oracle, not the plan) or one global sort + running min
  * (a single-partition window over the corpus — the anti-pattern this
  * repo's 100 TB posture bans). This operator instead grid-partitions the
  * x axis into B buckets:
  *
  *  - bucket boundaries come from one (min,max) aggregate, broadcast;
  *  - every point in an earlier bucket has STRICTLY smaller x than every
  *    point in a later bucket (floor bucketing), so cross-bucket
  *    dominance needs only the cumulative per-bucket min of y — a B-row
  *    table, cumulated with a window over B rows and broadcast back;
  *  - within-bucket dominance uses windows PARTITIONED BY bucket (a
  *    strict-x range frame plus a same-x partition min), so the corpus
  *    shuffles once, keyed by bucket, and every bucket evaluates in
  *    parallel.
  *
  * Contract: x and y are LONG columns (quantize prices to cents first),
  * smaller is better on both (negate an axis to maximize it). Ties on
  * both axes survive together, exactly like the NOT EXISTS form.
  */
object Skyline {

  /** Skyline of (minimize x, minimize y) over `pts`. Extra columns ride
    * along untouched; helper columns are dropped on the way out.
    */
  def skylineMinMin(pts: DataFrame, x: String, y: String,
                    buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val stats = pts.agg(min(col(x)).as("_xmin"), max(col(x)).as("_xmax"))
    // Width and offset in decimal(38,0): `_xmax - _xmin + 1` (and
    // `$x - _xmin`) overflow Long when x spans an extreme range (xmin
    // near Long.MinValue), which would wrap into negative bucket ids and
    // a silently wrong frontier. decimal(38,0) holds any difference of
    // two longs exactly; `div` (integral divide) brings the bucket id
    // back to long, bounded by `buckets`.
    val bucketed = pts.crossJoin(broadcast(stats))
      .withColumn("_w",
        greatest(lit(1L), expr(
          s"(cast(_xmax as decimal(38,0)) - _xmin + 1) div $buckets")))
      .withColumn("_bkt", expr(s"(cast($x as decimal(38,0)) - _xmin) div _w"))
      .drop("_xmin", "_xmax", "_w")
    // Cumulative min of y over STRICTLY EARLIER buckets: B rows, so the
    // unpartitioned window is a constant-size step no matter the corpus.
    val perBucket = bucketed.groupBy(col("_bkt"))
      .agg(min(col(y)).as("_bymin"))
    val wB = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMin = perBucket
      .withColumn("_prevmin", min(col("_bymin")).over(wB))
      .select(col("_bkt"), col("_prevmin"))
    // Within-bucket: min y among strictly-smaller x (range frame ending
    // at -1 excludes x ties), and min y among SAME-x points.
    val wStrict = Window.partitionBy(col("_bkt")).orderBy(col(x))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(col("_bkt"), col(x))
    val noPrior = lit(Long.MaxValue)
    bucketed
      .join(broadcast(prevMin), Seq("_bkt"))
      .withColumn("_m1", coalesce(min(col(y)).over(wStrict), noPrior))
      .withColumn("_m2", min(col(y)).over(wSameX))
      .filter(!(coalesce(col("_prevmin"), noPrior) <= col(y) ||
        col("_m1") <= col(y) || col("_m2") < col(y)))
      .drop("_bkt", "_prevmin", "_m1", "_m2")
  }
}
