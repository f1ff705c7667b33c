package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Error-bound pins for the approximate aggregates declared next to
  * their exact twins (approx_distinct_parts / approx_percentile_orders):
  * the within-bound booleans those queries emit are only meaningful if
  * the bounds actually hold on known ground truth, so this suite checks
  * them on synthetic data with exactly-known answers.
  */
class ApproxBoundsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct lands within 3x rsd of a known distinct count") {
    // 120k rows over exactly 10k distinct keys, deterministic.
    val df = spark.range(120000).select((col("id") % 10000).as("k"))
    val Row = df.agg(
      approx_count_distinct(col("k")).as("approx"),
      countDistinct(col("k")).as("exact"))
      .as[(Long, Long)].head()
    val (approx, exact) = Row
    assert(exact == 10000L)
    val relErr = math.abs(approx - exact).toDouble / exact
    // default rsd = 0.05; the declared queries assert <= 3x rsd
    assert(relErr <= 0.15, s"HLL relative error $relErr above 3x rsd")
  }

  test("percentile_approx(accuracy=10000) stays inside the exact p45..p55 window") {
    // 50k skewed values (id^1.5) per 2 groups: known order statistics.
    val df = spark.range(100000).select(
      (col("id") % 2).as("g"), pow(col("id").cast("double"), 1.5).as("v"))
    val rows = df.groupBy(col("g"))
      .agg(percentile_approx(col("v"), lit(0.5), lit(10000)).as("ap50"),
        percentile(col("v"), lit(0.45)).as("p45"),
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.55)).as("p55"))
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows.length == 2)
    rows.foreach { case (g, ap50, p45, p50, p55) =>
      assert(ap50 >= p45 && ap50 <= p55,
        s"group $g: sketch p50 $ap50 outside exact [$p45, $p55]")
      // rank error n/accuracy = 50000/10000 = 5 rows; value gap between
      // adjacent order statistics near the median is tiny vs the window
      assert(math.abs(ap50 - p50) / p50 < 0.01)
    }
  }
}
