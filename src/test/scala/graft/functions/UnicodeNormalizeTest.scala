package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

class UnicodeNormalizeTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // NFC, NFD, zero-width-ridden and pre-folded forms of the same
  // visual string, plus NFKC-only material (ligature, enclosed digit).
  private val nfc = "Caf\u00e9 r\u00e9sum\u00e9 na\u00efve"
  private val nfd = "Cafe\u0301 re\u0301sume\u0301 nai\u0308ve"
  private val zw = "Caf\u00e9\u200b r\u00e9sum\u00e9 na\u00efve\ufeff"
  private val folded = "Cafe resume naive"
  private val nfkcOnly = "\ufb01ne \u2460"

  test("UnicodeNormalize matches java.text.Normalizer for every form") {
    val inputs = Seq(nfc, nfd, zw, folded, nfkcOnly, "", "plain ascii")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = inputs.toDF("t")
        .select(TextFns.unicodeNormalize(col("t"), form))
        .as[String].collect().toSeq
      val want = inputs.map(
        Normalizer.normalize(_, Normalizer.Form.valueOf(form)))
      assert(got == want, s"form=$form")
    }
    // NFKC folds the ligature and the enclosed digit
    assert(Normalizer.normalize(nfkcOnly, Normalizer.Form.NFKC) == "fine 1")
    // nulls propagate
    val n = Seq(Option.empty[String]).toDF("t")
      .select(TextFns.unicodeNormalize(col("t")))
    assert(n.collect().head.isNullAt(0))
  }

  test("foldAccents and stripZeroWidth collapse the fixture family") {
    val got = Seq(nfc, nfd, zw, folded).toDF("t")
      .select(
        TextFns.normTextUnicode(col("t")).as("nfcN"),
        TextFns.normTextUnicode(col("t"), accentFold = true).as("foldN"))
      .as[(String, String)].collect()
    // NFC + zero-width strip: the three accented forms agree
    assert(got(0)._1 == got(1)._1 && got(1)._1 == got(2)._1)
    assert(got(0)._1 != got(3)._1)
    // accent fold: all four agree
    assert(got.map(_._2).distinct.toSeq == Seq("cafe resume naive"))
  }

  test("expression stays inside WholeStageCodegen over a real scan") {
    val dir = java.nio.file.Files.createTempDirectory("un").toString
    Seq(nfd).toDF("t").write.mode("overwrite").parquet(dir)
    val scanned = spark.read.parquet(dir)
      .select(TextFns.unicodeNormalize(col("t")).as("s"))
    val plan = scanned.queryExecution.executedPlan
    assert(plan.toString.contains("*(1) Project [graft_unicode_normalize"),
      s"expected codegen'd projection in plan:\n$plan")
    assert(scanned.as[String].head() == nfc)
  }

  test("exactDedup unicodeNorm collapses NFC/NFD twins; default does not") {
    val d = Seq((1L, nfc), (2L, nfd), (3L, zw), (4L, folded))
      .toDF("doc_id", "text")
    assert(Dedup.exactDedup(d).count() == 4)
    val u = Dedup.exactDedup(d, unicodeNorm = true)
    assert(u.count() == 2)
    assert(u.filter(col("n_dups") === 3).select(col("rep_doc_id"))
      .as[Long].head() == 1L)
    assert(Dedup.exactDedup(d, unicodeNorm = true, accentFold = true)
      .count() == 1)
  }
}
