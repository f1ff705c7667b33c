package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Schema-contract tests: the reference pins the cleaned per-entity
  * column sets (reference tests/test_connect.py:110-161); these assert
  * the same contracts on EntitySpecs output, column-for-column.
  */
class EntitySpecsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("users contract (test_connect.py:116) + numeric-id filters") {
    val raw = Seq(
      (Some("1001"), 11L, "alice"), (None, 12L, "ghost"), (Some("x1"), 13L, "bad")
    ).toDF("user_id", "canvas_user_id", "login_id")
    val out = EntitySpecs.users("2026-01-01")(raw)
    assert(out.columns.toSeq == Seq("id_num", "canvas_user", "login_id", "load_date"))
    assert(out.select("id_num").as[String].collect().toSeq == Seq("1001"))
  }

  test("courses contract (test_connect.py:132)") {
    val raw = Seq((101L, "BIO101", "active")).toDF("canvas_course_id", "course_id", "status")
    val out = EntitySpecs.courses("21", "1S", "2026-01-01")(raw)
    assert(out.columns.toSet ==
      Set("yr_cde", "trm_cde", "crs_cde", "canvas_course_id", "load_date", "status"))
    assert(out.select("yr_cde", "trm_cde").as[(String, String)].head() == ("21", "1S"))
  }

  test("sections contract (test_connect.py:145-146) + BIT recode") {
    val raw = Seq(("BIO101", "s1", "Sec 1", "active", 7L, 201L, true))
      .toDF("course_id", "section_id", "name", "status", "account_id",
        "canvas_section_id", "created_by_sis")
    val out = EntitySpecs.sections("21", "1S", "2026-01-01")(raw)
    assert(out.columns.toSet == Set("yr_cde", "trm_cde", "crs_cde", "section_id",
      "name", "status", "account_id", "canvas_section_id", "created_by_sis", "load_date"))
    assert(out.select("created_by_sis").as[Int].head() == -1)
  }

  test("enrollments contract (test_connect.py:158-160): no renames, BIT recode") {
    val raw = Seq(("BIO101", "1001", "student", "s1", "active", 301L, 201L, false))
      .toDF("course_id", "user_id", "role", "section_id", "status",
        "canvas_enrollment_id", "canvas_section_id", "created_by_sis")
    val out = EntitySpecs.enrollments("21", "1S", "2026-01-01")(raw)
    assert(out.columns.toSet == Set("yr_cde", "trm_cde", "course_id", "user_id",
      "role", "section_id", "status", "canvas_enrollment_id", "canvas_section_id",
      "created_by_sis", "load_date"))
    assert(out.select("created_by_sis").as[Int].head() == 0)
  }
}
