package graft.operators

import org.apache.spark.sql.functions._

/** The four per-entity clean/conform specs as data (SURVEY §7.2 M1),
  * transcribed from the reference's `_clean_dataset` branches
  * (reference src/canvas.py:62-104) and pinned by the schema-contract
  * tests (reference tests/test_connect.py:117-161):
  *
  *  - users:       keep [user_id, canvas_user_id, login_id], rename to
  *                 id_num/canvas_user, drop null + non-numeric user_id
  *  - courses:     keep [canvas_course_id, course_id, status], rename
  *                 course_id->crs_cde, term columns appended
  *  - sections:    7 columns incl. created_by_sis (BIT-sentinel recode),
  *                 term columns appended
  *  - enrollments: 8 columns incl. created_by_sis recode, no renames,
  *                 term columns appended
  *
  * The term id is a per-run scalar in the reference (term_id[:2] /
  * [2:4]); here it parameterizes the spec the same way.
  */
object EntitySpecs {

  private def termLits(yr: String, trm: String, loadDate: String) = Seq(
    "yr_cde" -> lit(yr), "trm_cde" -> lit(trm),
    "load_date" -> to_date(lit(loadDate)))

  private val sisRecode =
    Map("created_by_sis" -> CleanSpec.boolToSentinel(col("created_by_sis") === true))

  def users(loadDate: String): CleanSpec = CleanSpec(
    keep = Seq("user_id", "canvas_user_id", "login_id"),
    rename = Map("user_id" -> "id_num", "canvas_user_id" -> "canvas_user"),
    filters = Seq(col("user_id").isNotNull, col("user_id").rlike("^[0-9]+$")),
    literals = Seq("load_date" -> to_date(lit(loadDate))))

  def courses(yr: String, trm: String, loadDate: String): CleanSpec = CleanSpec(
    keep = Seq("canvas_course_id", "course_id", "status"),
    rename = Map("course_id" -> "crs_cde"),
    literals = termLits(yr, trm, loadDate))

  def sections(yr: String, trm: String, loadDate: String): CleanSpec = CleanSpec(
    keep = Seq("course_id", "section_id", "name", "status", "account_id",
      "canvas_section_id", "created_by_sis"),
    rename = Map("course_id" -> "crs_cde"),
    recodes = sisRecode,
    literals = termLits(yr, trm, loadDate))

  def enrollments(yr: String, trm: String, loadDate: String): CleanSpec = CleanSpec(
    keep = Seq("course_id", "user_id", "role", "section_id", "status",
      "canvas_enrollment_id", "canvas_section_id", "created_by_sis"),
    recodes = sisRecode,
    literals = termLits(yr, trm, loadDate))
}
