package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hermetic port of the reference's only pure unit test
  * (tests/test_connect.py:168-186, test_prepare_dataframe_for_sql) plus
  * the dirty-data cases from FIXTURES.md A.1 and the schema contracts of
  * tests/test_connect.py:117-161.
  */
class CleanSpecTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rawUsers = Seq(
    // user_id, canvas_user_id, login_id
    (Some("1001"), 11L, "alice"),
    (Some("1002"), 12L, "sdemo1"),        // sdemo login: must be filterable
    (None, 13L, "ghost"),                 // null user_id: dropped (P3)
    (Some("abc"), 14L, "nonnumeric"),     // non-numeric user_id: dropped (P4)
    (Some("CanvasStu9"), 15L, "teststu")  // test account prefix (P5)
  ).toDF("user_id", "canvas_user_id", "login_id")

  private val usersSpec = CleanSpec(
    keep = Seq("user_id", "canvas_user_id", "login_id"),
    rename = Map("user_id" -> "id_num", "canvas_user_id" -> "canvas_user"),
    filters = Seq(col("user_id").isNotNull, col("user_id").rlike("^[0-9]+$")),
    literals = Seq("load_date" -> to_date(lit("2026-01-01"))))

  test("projection, rename, null + numeric filters (reference P1-P4)") {
    val out = usersSpec(rawUsers)
    assert(out.columns.toSeq == Seq("id_num", "canvas_user", "login_id", "load_date"))
    assert(out.count() == 2)
    assert(out.filter(col("id_num") === "1001").count() == 1)
    // dirty rows dropped
    assert(out.filter(col("id_num").isNull).count() == 0)
    assert(out.filter(col("id_num") === "CanvasStu9").count() == 0)
  }

  test("data-quality contract: sdemo logins removable (test_connect.py:124)") {
    val spec = usersSpec.copy(filters = usersSpec.filters :+ !col("login_id").rlike("sdemo+"))
    assert(spec(rawUsers).filter(col("login_id").rlike("sdemo+")).count() == 0)
  }

  test("bool -> BIT sentinel recode (canvas.py:94-95, test_connect.py:184-186)") {
    val df = Seq((1L, true), (2L, false)).toDF("id", "created_by_sis")
    val out = df.withColumn("created_by_sis",
      CleanSpec.boolToSentinel(col("created_by_sis")))
    assert(out.orderBy("id").collect().map(_.getInt(1)).toSeq == Seq(-1, 0))
  }

  test("literal audit columns: yr_cde/trm_cde/load_date (canvas.py:97-101)") {
    val spec = CleanSpec(keep = Seq("user_id"),
      literals = Seq("yr_cde" -> lit("21"), "trm_cde" -> lit("1S")))
    val out = spec(rawUsers.filter(col("user_id") === "1001"))
    val row = out.collect().head
    assert(row.getString(1) == "21" && row.getString(2) == "1S")
    assert(out.schema("yr_cde").dataType == StringType)
  }

  test("clean is idempotent on its own output (projection fixpoint)") {
    val spec = CleanSpec(keep = Seq("user_id", "login_id"),
      filters = Seq(col("user_id").isNotNull))
    val once = spec(rawUsers)
    val twice = spec.copy(filters = Seq(col("user_id").isNotNull))(once)
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
