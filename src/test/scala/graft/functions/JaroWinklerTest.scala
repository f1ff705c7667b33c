package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.expressions.JaroWinklerFn

class JaroWinklerTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sim(a: String, b: String): Double =
    JaroWinklerFn.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB jaro_winkler_similarity on pinned fixtures") {
    // Bit-exact doubles probed from DuckDB (the oracle engine) — the
    // whole point of the expression is that thresholds and
    // floor(s*1000) projections agree with the oracle to the last bit.
    val fixtures = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("DwAyNE", "DuANE", 0.8400000000000001),
      ("arnab", "urban", 0.6),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("a", "b", 0.0),
      ("", "", 1.0))
    fixtures.foreach { case (a, b, expected) =>
      assert(sim(a, b) == expected, s"sim($a, $b)")
    }
  }

  test("symmetric, bounded, boost only above the 0.7 jaro threshold") {
    val rnd = new Random(42)
    val words = Seq("golden", "goldenrod", "lace", "spring", "chocolate")
    for (_ <- 1 to 500) {
      val a = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size)))
        .mkString(" ").take(24)
      val b = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.size)))
        .mkString(" ").take(24)
      val s = sim(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == sim(b, a), s"asymmetric on ($a, $b)")
      if (a == b) assert(s == 1.0)
    }
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val df = Seq(
      ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""), ("x", "y"))
      .toDF("a", "b")
    val viaExpr = df
      .select(TextFns.jaroWinkler(col("a"), col("b")).as("s"))
      .as[Double].collect()
    val direct = Seq(sim("MARTHA", "MARHTA"), sim("DIXON", "DICKSONX"),
      sim("", ""), sim("x", "y"))
    assert(viaExpr.toSeq == direct)

    val withNull = Seq((Some("abc"), None: Option[String])).toDF("a", "b")
      .select(TextFns.jaroWinkler(col("a"), col("b")).as("s"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("expression stays inside WholeStageCodegen over a real scan") {
    val dir = java.nio.file.Files.createTempDirectory("jw").toString
    Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val scanned = spark.read.parquet(dir)
      .select(TextFns.jaroWinkler(col("a"), col("b")).as("s"))
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    val plan = scanned.queryExecution.executedPlan
    assert(plan.toString.contains("*(1) Project [graft_jaro_winkler"),
      s"expected codegen'd projection in plan:\n$plan")
    assert(scanned.as[Double].head() == 0.9611111111111111)
  }
}
