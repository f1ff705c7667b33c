package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TermsResolveTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def config = Seq(("21 ", "1S ")).toDF("yr_cde", "trm_cde") // padded, as REG_CONFIG ships
  private def dim = Seq((41L, "204S"), (42L, "211S"), (43L, "212S"))
    .toDF("id", "sis_term_id")

  test("resolveTerm current: packs trimmed codes and finds the LMS id") {
    val got = Terms.resolveTerm(config, "current", dim)
      .as[(String, Option[Long])].head()
    assert(got == ("211S", Some(42L)))
  }

  test("resolveTerm next: increments 1S -> same-year 2S") {
    val got = Terms.resolveTerm(config, "next", dim)
      .as[(String, Option[Long])].head()
    assert(got == ("212S", Some(43L)))
  }

  test("resolveTerm next from 2S rolls the year and may miss the dim (null id)") {
    val spring = Seq(("21", "2S")).toDF("yr_cde", "trm_cde")
    val got = Terms.resolveTerm(spring, "next", dim)
      .as[(String, Option[Long])].head()
    assert(got == ("221S", None))
  }
}
