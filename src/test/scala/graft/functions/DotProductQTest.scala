package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DotProductQTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dotQ matches the HOF formulation and handles nulls") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),   // 4 + 10 + 18 = 32
      (Seq(-2L, 7L), Seq(3L, -1L))          // -6 - 7 = -13
    ).toDF("a", "b")
    val got = df.select(VectorFns.dotQ(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got == Seq(32L, -13L))
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x))
      .as[Long].collect().toSeq
    assert(got == hof)

    val withNull = Seq((Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b")
    assert(withNull.select(VectorFns.dotQ(col("a"), col("b"))).collect().head.isNullAt(0))

    // Unequal lengths and null elements -> NULL, matching the HOF form
    // (zip_with pads with nulls; a null product nullifies the sum).
    val uneven = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    assert(uneven.select(VectorFns.dotQ(col("a"), col("b"))).collect().head.isNullAt(0))
    val nullElem = Seq((Seq[Option[Long]](Some(1L), None), Seq[Option[Long]](Some(3L), Some(4L))))
      .toDF("a", "b")
    assert(nullElem.select(VectorFns.dotQ(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("dotQ ANSI mode matches HOF effect ORDER: overlap overflow throws past nulls/unequal lengths") {
    import org.apache.spark.sql.{Column, GraftSqlBridge}
    import graft.functions.expressions.DotProductQ
    def dotAnsi(a: Column, b: Column): Column =
      GraftSqlBridge.column(DotProductQ(
        GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
        failOnError = true))
    def assertOverflow(f: => Any): Unit = {
      val t = intercept[Throwable](f)
      val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => x.getClass.getName + " " + x.getMessage).mkString("; ")
      assert(chain.toLowerCase.contains("overflow"), chain)
    }
    // zip_with evaluates every overlapping product eagerly, so a null at
    // index 0 must NOT mask the overflow at index 1 — and the HOF form
    // agrees (differential check under the session's ANSI default).
    val nullThenOverflow = Seq((
      Seq[Option[Long]](None, Some(Long.MaxValue)),
      Seq[Option[Long]](Some(1L), Some(Long.MaxValue)))).toDF("a", "b")
    assertOverflow(nullThenOverflow.select(dotAnsi(col("a"), col("b"))).collect())
    assertOverflow(nullThenOverflow.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x))
      .collect())
    // unequal lengths: overlap products still evaluated -> throws
    val unevenOverflow = Seq((Seq(Long.MaxValue), Seq(Long.MaxValue, 1L))).toDF("a", "b")
    assertOverflow(unevenOverflow.select(dotAnsi(col("a"), col("b"))).collect())
    assertOverflow(unevenOverflow.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, x) => acc + x))
      .collect())
    // null element with NO overflow: null result, no error
    val nullNoOverflow = Seq((
      Seq[Option[Long]](None, Some(2L)),
      Seq[Option[Long]](Some(1L), Some(3L)))).toDF("a", "b")
    assert(nullNoOverflow.select(dotAnsi(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("dotQ stays inside whole-stage codegen") {
    // a real scan (not a local relation) so the projection can't be
    // constant-folded away before physical planning
    val dir = java.nio.file.Files.createTempDirectory("dotq").toString
    Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val scanned = spark.read.parquet(dir)
      .select(VectorFns.dotQ(col("a"), col("b")).as("d"))
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    val plan = scanned.queryExecution.executedPlan
    assert(plan.toString.contains("*(1) Project [graft_dotq"),
      s"expected codegen'd projection in plan:\n$plan")
    assert(scanned.as[Long].head() == 11L)
  }

  test("cosineQ on quantized vectors is exact and symmetric") {
    val df = Seq((Seq(0.6f, 0.8f), Seq(0.6f, 0.8f))).toDF("u", "v")
    val q = df.select(VectorFns.quantize(col("u")).as("a"), VectorFns.quantize(col("v")).as("b"))
    val cos = q.select(VectorFns.cosineQ(col("a"), col("b"))).as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
  }
}
