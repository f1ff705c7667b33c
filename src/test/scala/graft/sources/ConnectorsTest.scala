package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConnectorsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("catalogScan drains pages into one dimension DataFrame") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("sis_term_id", StringType)))
    val pages = Map(
      0 -> Seq(Row(41L, "204S"), Row(42L, "211S")),
      1 -> Seq(Row(43L, "212S")))
    val dim = Connectors.catalogScan(spark, schema)(i => pages.getOrElse(i, Nil))
    assert(dim.count() == 3)
    assert(dim.filter($"sis_term_id" === "211S").select("id").as[Long].head() == 42L)
  }

  test("awaitJob polls until done without real sleeping") {
    var polls = 0
    var slept = 0L
    val status = Connectors.awaitJob[String](
      status = () => { polls += 1; if (polls < 4) "running" else "complete" },
      isDone = (s: String) => s == "complete",
      intervalMs = 3000, sleep = ms => slept += ms)
    assert(status == "complete")
    assert(polls == 4)
    assert(slept == 9000L) // 3 sleeps of the 3s report-poll interval
  }

  test("awaitJob gives up after the attempt budget") {
    assertThrows[IllegalStateException] {
      Connectors.awaitJob[String](() => "running", (_: String) => false,
        maxAttempts = 5, sleep = _ => ())
    }
  }

  test("extractZip stages entries and feeds the CSV scan") {
    val bytes = {
      val bos = new ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      z.putNextEntry(new ZipEntry("users.csv"))
      z.write("user_id,login_id\n1,alice\n2,bob\n".getBytes)
      z.closeEntry()
      z.putNextEntry(new ZipEntry("courses.csv"))
      z.write("course_id,name\nc1,Intro\n".getBytes)
      z.closeEntry()
      z.close()
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("staging").toString
    val paths = Connectors.extractZip(bytes, dir)
    assert(paths.map(_.getFileName.toString).sorted == Seq("courses.csv", "users.csv"))

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("login_id", StringType)))
    val users = graft.Tables.csv(spark, s"$dir/users.csv", schema)
    assert(users.count() == 2)
  }

  test("extractZip rejects path-traversal entries") {
    val bytes = {
      val bos = new ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      z.putNextEntry(new ZipEntry("../escape.csv"))
      z.write("x\n".getBytes)
      z.closeEntry()
      z.close()
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("staging2").toString
    assertThrows[IllegalArgumentException] {
      Connectors.extractZip(bytes, dir)
    }
  }
}
