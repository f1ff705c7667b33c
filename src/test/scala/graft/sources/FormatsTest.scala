package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Round-trips for the interchange formats beyond parquet/CSV (SURVEY
  * §2.1): native ORC (vectorized, pushdown-capable) and schema-contracted
  * JSON lines. Hermetic — a lineitem slice from the sf0.001 fixture is
  * written to a temp dir and read back.
  */
class FormatsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def slice = Tables.lineitem(spark, sf)
    .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
      col("l_extendedprice"), col("l_returnflag"))
    .filter(col("l_orderkey") < 100)

  test("ORC round-trip preserves rows and supports predicate pushdown at the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Tables.writeOrc(slice, dir)
    val back = Tables.orc(spark, dir)
    assert(back.count() == slice.count())
    // value-exact: anti-join in both directions is empty
    val cols = slice.columns.toSeq
    assert(back.join(slice, cols, "left_anti").isEmpty)
    assert(slice.join(back, cols, "left_anti").isEmpty)
    // the filter reaches the ORC scan as a pushed predicate
    val p = back.filter(col("l_partkey") === 7L)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("l_partkey"), p)
  }

  test("JSON-lines round-trip under a contracted schema, no inference pass") {
    val dir = Files.createTempDirectory("graft-json").toString
    Tables.writeJsonLines(slice, dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_returnflag", StringType)))
    val back = Tables.jsonLines(spark, dir, schema)
    assert(back.schema == schema)
    val cols = slice.columns.toSeq
    assert(back.join(slice, cols, "left_anti").isEmpty)
    assert(slice.join(back, cols, "left_anti").isEmpty)
  }

  test("JSON-lines malformed rows surface as nulls (PERMISSIVE), not job failure") {
    val dir = Files.createTempDirectory("graft-json-bad")
    Files.writeString(dir.resolve("part-0.json"),
      """{"l_orderkey": 1, "l_returnflag": "A"}
        |this line is not json
        |{"l_orderkey": 2, "l_returnflag": "R"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_returnflag", StringType)))
    val back = Tables.jsonLines(spark, dir.toString, schema)
    assert(back.count() == 3)
    assert(back.filter(col("l_orderkey").isNotNull).count() == 2)
  }
}
