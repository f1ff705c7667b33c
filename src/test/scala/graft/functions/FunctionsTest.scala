package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TermsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nextTerm: fall -> spring same year, spring -> next year's fall (F4)") {
    // Cases from FIXTURES.md A.4 / reference src/integrator.py:27-36.
    val df = Seq(("21", "1S"), ("21", "2S"), ("09", "2S"))
      .toDF("yr", "trm")
      .select(Terms.nextTerm(col("yr"), col("trm")).as("next"))
    assert(df.as[String].collect().toSeq == Seq("212S", "221S", "101S"))
  }

  test("pack/decompose roundtrip with padded REG_CONFIG values (F1-F3)") {
    val df = Seq(("21 ", "1S ")).toDF("yr", "trm")
      .select(Terms.packTerm(col("yr"), col("trm")).as("term"))
    assert(df.as[String].head() == "211S")
    val back = df.select(Terms.yrCde(col("term")), Terms.trmCde(col("term")))
    assert(back.as[(String, String)].head() == ("21", "1S"))
  }
}

class TextFnsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: whitespace split without empty tokens") {
    val out = Seq("  The  quick   fox ").toDF("text")
      .select(TextFns.tokens(col("text"))).as[Seq[String]].head()
    assert(out == Seq("the", "quick", "fox"))
  }

  test("shingles: n-grams, and empty for docs shorter than n") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(TextFns.shingleSet(col("text"), 3)).as[Seq[String]].collect()
    assert(out(0).toSet == Set("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("fingerprint is whitespace/case insensitive") {
    val fps = Seq("Hello  World", "hello world ", "hello mars")
      .toDF("text").select(TextFns.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("stopHits counts stopword occurrences") {
    val n = Seq("the cat and the hat").toDF("text")
      .select(TextFns.stopHits(TextFns.tokens(col("text")), Seq("the", "and")))
      .as[Long].head()
    assert(n == 3L)
  }

  test("hexVal maps all 16 hex digits") {
    val out = "0123456789abcdef".map(_.toString).toDF("c")
      .select(TextFns.hexVal(col("c"))).as[Int].collect().toSeq
    assert(out == (0 until 16))
  }
}

class VectorFnsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecDf(vs: (Seq[Float], Seq[Float])*) =
    vs.toDF("a", "b")

  test("cosineQ: identical vectors -> 1.0, orthogonal -> 0.0") {
    val df = vecDf(
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.1f, 0.2f, 0.3f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)))
      .select(VectorFns.cosineQ(
        VectorFns.quantize(col("a")), VectorFns.quantize(col("b"))).as("cos"))
    val out = df.as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) == 0.0)
  }

  test("quantize: floor(x*10000 + 0.5) with exact float->double widening") {
    val out = vecDf((Seq(-0.15469436f, 0.5f), Seq.empty[Float]))
      .select(VectorFns.quantize(col("a"))).as[Seq[Long]].head()
    assert(out == Seq(-1547L, 5000L))
  }

  test("lshBucket is deterministic and within 2^nBits") {
    val df = vecDf(
      (Seq.fill(64)(0.25f), Seq.empty[Float]),
      (Seq.fill(64)(-0.25f), Seq.empty[Float]))
      .select(VectorFns.lshBucket(VectorFns.quantize(col("a")), 4, 64).as("bkt"))
    val out = df.as[Long].collect()
    assert(out.forall(b => b >= 0 && b < 16))
    // sign-flip flips every projection: buckets are bitwise complements
    assert(out(0) == 15L - out(1))
  }
}
