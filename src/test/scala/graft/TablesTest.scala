package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips for the file-format edges (SURVEY §2.1
  * S4/K1/S8 + [EXT] json/orc): schema-contracted reads, no inferSchema
  * on production paths.
  */
class TablesTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id_num", LongType),
    StructField("login_id", StringType),
    StructField("score", DoubleType)))

  private def sample = Seq(
    (1L, "alice", 0.5), (2L, "bob", 0.25), (3L, "carol", 1.0)
  ).toDF("id_num", "login_id", "score")

  test("CSV sink + schema-contracted scan round-trips (S4/K1)") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    Tables.writeCsv(sample, s"$dir/users", singleFile = true)
    val back = Tables.csv(spark, s"$dir/users", schema)
    assert(back.schema == schema)
    assert(back.orderBy("id_num").collect().toSeq == sample.orderBy("id_num").collect().toSeq)
  }

  test("json lines round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    sample.write.mode("overwrite").json(s"$dir/users")
    val back = spark.read.schema(schema).json(s"$dir/users")
    assert(back.orderBy("id_num").collect().toSeq == sample.orderBy("id_num").collect().toSeq)
  }

  test("orc round-trip preserves schema and values") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    sample.write.mode("overwrite").orc(s"$dir/users")
    val back = spark.read.orc(s"$dir/users")
    assert(back.schema.fields.map(_.name).toSeq == schema.fields.map(_.name).toSeq)
    assert(back.orderBy("id_num").collect().toSeq == sample.orderBy("id_num").collect().toSeq)
  }

  test("parquet loaders read every driver table at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    Tables.all.foreach { t =>
      // events needs its dedicated loader (TIMESTAMP(NANOS) normalization)
      val df = if (t == "events") Tables.events(spark, sf)
               else Tables.table(spark, sf, t)
      assert(df.count() > 0, s"table $t empty")
    }
  }
}
