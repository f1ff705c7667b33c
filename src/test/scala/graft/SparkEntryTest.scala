package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the flagship entry and every declared query run and return rows
  * on sf0.001, and every query has a consistent oracle entry.
  */
class SparkEntryTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // count() not collect(): outputs can be wide; smoke only.
      assert(df.count() >= 0)
    }
  }
}
