package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed entity stage (SURVEY §1.1): the sync surface's enrollment flow
  * as case-class `Dataset[T]` transformations, so entity shape errors are
  * compile errors instead of runtime AnalysisExceptions.
  *
  * The case class IS the reference's schema contract: [[Enrollment]]
  * mirrors the 11-column Canvas SIS enrollment upload the reference pins
  * in tests/test_connect.py:160-161, and the diff output carries the
  * composite key plus the derived add/drop status.
  *
  * Design note: the typed stage stays a thin shell over the same Column
  * expressions [[Diff]] uses — typed `filter(row => ...)` lambdas would
  * be opaque to Catalyst (no pushdown, no codegen fusion), so predicates
  * stay `Column`s and the Encoder provides the type safety at the stage
  * boundaries. `as[T]` after a select is also a schema CHECK: missing or
  * mistyped columns fail analysis immediately.
  */
object TypedEntities {

  /** Canvas SIS enrollment row (reference tests/test_connect.py:160-161:
    * yr_cde, trm_cde, course_id, user_id, role, section_id, status,
    * canvas_enrollment_id, canvas_section_id, created_by_sis, load_date).
    */
  final case class Enrollment(
      yr_cde: String,
      trm_cde: String,
      course_id: String,
      user_id: Long,
      role: String,
      section_id: String,
      status: String,
      canvas_enrollment_id: Long,
      canvas_section_id: Long,
      created_by_sis: Boolean,
      load_date: java.sql.Date)

  /** The diff's composite key + derived status (active = new in truth,
    * deleted = only in the mirror) — the DailyEnrollment output row.
    */
  final case class EnrollmentChange(
      course_id: String,
      user_id: Long,
      section_id: String,
      status: String)

  /** The enrollment identity key (course, user, section) — a student can
    * hold multiple roles per course only via distinct sections.
    */
  val enrollmentKeys: Seq[String] = Seq("course_id", "user_id", "section_id")

  /** Typed symmetric diff: `Dataset[Enrollment]` truth vs mirror →
    * `Dataset[EnrollmentChange]`. Runs through [[Diff.changedRows]] (one
    * full-outer join on the composite key), with the Encoder enforcing
    * the output contract at compile/analysis time.
    */
  def enrollmentDiff(truth: Dataset[Enrollment],
                     mirror: Dataset[Enrollment]): Dataset[EnrollmentChange] = {
    val sp = truth.sparkSession
    import sp.implicits._
    Diff.changedRows(truth.toDF(), mirror.toDF(), enrollmentKeys)
      .as[EnrollmentChange]
  }

  /** The typed stage as a [[SyncPipeline.Entity]]: the enrollment slice
    * of the reference's sync run, ready for the FK-ordered sink loop.
    */
  def enrollmentEntity(truth: Dataset[Enrollment],
                       mirror: Dataset[Enrollment]): SyncPipeline.Entity =
    SyncPipeline.Entity("daily_enrollment", truth.toDF(), mirror.toDF(),
      enrollmentKeys, symmetric = true)

  /** Lift an untyped frame into the typed contract — fails analysis (not
    * at some later action) if a contract column is missing or mistyped.
    */
  def asEnrollments(spark: SparkSession,
                    df: org.apache.spark.sql.DataFrame): Dataset[Enrollment] = {
    import spark.implicits._
    df.as[Enrollment]
  }
}
