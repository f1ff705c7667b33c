package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PromoteDotProductTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("rule rewrites the HOF dot-product pattern to the native kernel") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PromoteDotProduct
    try {
      val dir = java.nio.file.Files.createTempDirectory("promote").toString
      Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      val q = spark.read.parquet(dir).select(hofDot.as("d"))
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_dotq"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.as[Long].head() == 32L)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PromoteDotProduct)
    }
  }

  test("rewritten kernel keeps HOF null semantics (null element -> NULL)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PromoteDotProduct
    try {
      // Option[Long] elements -> ArrayType(LongType, containsNull = true):
      // the rule still fires (the kernel now matches HOF semantics
      // exactly) and the null element yields NULL, as the HOF form would.
      val dir = java.nio.file.Files.createTempDirectory("promote3").toString
      Seq((Seq[Option[Long]](Some(1L), None), Seq[Option[Long]](Some(3L), Some(4L))))
        .toDF("a", "b").write.mode("overwrite").parquet(dir)
      val q = spark.read.parquet(dir).select(hofDot.as("d"))
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_dotq"),
        q.queryExecution.optimizedPlan.toString)
      assert(q.select(col("d").isNull).as[Boolean].head())
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PromoteDotProduct)
    }
  }

  test("promoted kernel preserves the eval mode's overflow contract") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PromoteDotProduct
    try {
      val dir = java.nio.file.Files.createTempDirectory("promote4").toString
      Seq((Seq(Long.MaxValue, 1L), Seq(2L, 1L))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      // ANSI (Spark 4 default): rule fires with the overflow-checked
      // kernel, which raises ARITHMETIC_OVERFLOW exactly like HOF
      // Multiply/Add would
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val ansi = spark.read.parquet(dir).select(hofDot.as("d"))
      assert(ansi.queryExecution.optimizedPlan.toString.contains("graft_dotq"),
        ansi.queryExecution.optimizedPlan.toString)
      val err = intercept[Exception] { ansi.as[Long].head() }
      assert(err.getMessage.toLowerCase.contains("overflow"), err.getMessage)
      // LEGACY: rule fires with the wrapping kernel — same value the
      // legacy HOF form computes (MaxValue*2 + 1 wraps to -1)
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val legacy = spark.read.parquet(dir).select(hofDot.as("d"))
      assert(legacy.queryExecution.optimizedPlan.toString.contains("graft_dotq"),
        legacy.queryExecution.optimizedPlan.toString)
      assert(legacy.as[Long].head() == Long.MaxValue * 2L + 1L)
    } finally {
      spark.conf.unset("spark.sql.ansi.enabled")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PromoteDotProduct)
    }
  }

  test("rule leaves non-matching aggregates alone (int arrays, different lambda)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PromoteDotProduct
    try {
      val dir = java.nio.file.Files.createTempDirectory("promote2").toString
      Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      // sum (not product) inside zip_with: must NOT be rewritten
      val q = spark.read.parquet(dir).select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
          lit(0L), (acc, x) => acc + x).as("d"))
      assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dotq"))
      assert(q.as[Long].head() == 10L)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == PromoteDotProduct)
    }
  }

  test("graft_dotq is callable from SQL via the registered function") {
    // getOrCreate on the shared test session cannot re-run extensions,
    // so register the same triple the extensions entry point injects.
    val (ident, info, builder) = GraftExtensions.dotqFunction
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val d = spark.sql(
      "SELECT graft_dotq(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .as[Long].head()
    assert(d == 32L)
    val n = spark.sql(
      "SELECT graft_dotq(array(1L), array(1L, 2L)) IS NULL AS isnull")
      .as[Boolean].head()
    assert(n, "length mismatch must yield NULL")
    // ANSI overflow contract rides the session conf (the kernel throws
    // the same SparkArithmeticException ANSI Multiply would; depending
    // on where it fires it may arrive bare or task-wrapped).
    val e = intercept[Throwable] {
      spark.sql(
        s"SELECT graft_dotq(array(${Long.MaxValue}L, 1L), array(2L, 1L)) AS d")
        .as[Long].head()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString("; ")
    assert(msgs.contains("ARITHMETIC_OVERFLOW"), msgs)
  }

  test("graft_jaro_winkler is callable from SQL via the registered function") {
    val (ident, info, builder) = GraftExtensions.jaroWinklerFunction
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val s = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS s").as[Double].head()
    assert(s == 0.9611111111111111)
    val n = spark.sql(
      "SELECT graft_jaro_winkler('a', CAST(NULL AS STRING)) IS NULL AS x")
      .as[Boolean].head()
    assert(n, "null input must yield NULL")
  }
}
