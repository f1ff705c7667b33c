package graft.sources

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** T-SQL dialect contract for the K2/S2/S3 edge (SURVEY §2.1/M6) — what
  * Spark's JDBC layer would send to the reference's actual target, MS
  * SQL Server (reference: src/jenzabar.py:14-16 speaks mssql+pyodbc),
  * asserted WITHOUT a live server: the dialect registry resolves the
  * URL, and the generated SQL text (quoting, truncate, insert shape,
  * type mapping) is pinned here so a day-one deployment against the
  * ERP has no untested query-text surface.
  *
  * The embedded-Derby round-trips (JdbcTest) prove the data path; this
  * suite proves the DIALECT: identifier quoting is bracket-free
  * double-quote style in Spark's MsSqlServerDialect (T-SQL accepts
  * QUOTED_IDENTIFIER ON, the default, so quoted names are valid),
  * truncate-overwrite issues TRUNCATE TABLE (the engine upgrade over
  * the reference's DELETE FROM, src/jenzabar.py:46 — same contract,
  * constant-time on the server), booleans land as BIT, and the P7
  * sentinel recode (True -> -1 / False -> 0, src/canvas.py:94-95,
  * pinned behaviorally in tests/test_connect.py:184-186) reaches the
  * sink as an integer column — exactly because the vendor schema's
  * flag columns are NUMERIC with -1/0 convention, NOT BIT, so the
  * recode must happen engine-side where a raw boolean write would
  * produce an incompatible BIT column.
  */
class MsSqlDialectContractTest extends AnyFunSuite {

  private val url = "jdbc:sqlserver://erp-host;databaseName=TmsEPrd"
  private val dialect = JdbcDialects.get(url)

  test("sqlserver URL resolves the MsSqlServer dialect") {
    assert(dialect.getClass.getName.contains("MsSqlServerDialect"),
      dialect.getClass.getName)
  }

  test("S2/S3 read SQL: table and pushed-down subquery text") {
    // S2: spark.read.jdbc(table) probes the schema with the dialect's
    // canonical query; S3 wraps the .sql file body as a subquery.
    val probe = dialect.getSchemaQuery("rpc_RE_Canvas_Enrollments")
    assert(probe.trim.toUpperCase.startsWith("SELECT"))
    assert(probe.contains("rpc_RE_Canvas_Enrollments"))
    assert(probe.toUpperCase.contains("WHERE 1=0"), probe)
    // the S3 wrapper the engine generates (Jdbc.readQuery)
    val sql = "SELECT id_num FROM NameMaster WHERE yr_cde = '23'"
    val wrapped = s"($sql) q"
    val sub = dialect.getSchemaQuery(wrapped)
    assert(sub.contains(sql), sub)
  }

  test("identifier quoting survives reserved words and spaces") {
    val q = dialect.quoteIdentifier("Order")
    // MsSqlServerDialect quotes with double quotes (valid T-SQL under
    // QUOTED_IDENTIFIER ON, the server/odbc default) — pin the exact
    // form so an upgrade that silently changes it fails here.
    assert(q == "\"Order\"", q)
    assert(dialect.quoteIdentifier("yr cde") == "\"yr cde\"")
  }

  test("K2 truncate-overwrite issues TRUNCATE TABLE, not cascading") {
    val t = dialect.getTruncateQuery("rpc_RE_Canvas_Enrollments")
    assert(t == "TRUNCATE TABLE rpc_RE_Canvas_Enrollments", t)
    // TRUNCATE on SQL Server never cascades — the dialect must agree,
    // or Spark would refuse truncate-overwrite and silently fall back
    // to DROP + CREATE (losing indexes and grants, the exact failure
    // the truncate option exists to avoid).
    assert(!dialect.isCascadingTruncateTable().getOrElse(false))
  }

  test("type mapping: boolean -> BIT, string -> NVARCHAR, timestamp -> DATETIME") {
    def jdbcName(dt: DataType): String =
      dialect.getJDBCType(dt).map(_.databaseTypeDefinition).getOrElse(
        org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
          .getCommonJDBCType(dt).get.databaseTypeDefinition)
    assert(jdbcName(BooleanType) == "BIT")
    assert(jdbcName(StringType).toUpperCase.contains("NVARCHAR"))
    assert(jdbcName(TimestampType).toUpperCase.startsWith("DATETIME"))
  }

  test("K2 insert statement: chunked multi-row INSERT shape with quoted columns") {
    val sinkSchema = StructType(Seq(
      StructField("course_id", StringType),
      StructField("user_id", StringType),
      StructField("created_by_sis", IntegerType))) // P7 sentinel: -1/0 int
    val ins = org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
      .getInsertStatement("rpc_RE_Canvas_Enrollments", sinkSchema,
        tableSchema = None, isCaseSensitive = true, dialect = dialect)
    assert(ins ==
      "INSERT INTO rpc_RE_Canvas_Enrollments " +
        "(\"course_id\",\"user_id\",\"created_by_sis\") VALUES (?,?,?)", ins)
  }

  test("P7 sentinel reaches the sink boundary as -1/0 integers, not booleans") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // the engine-side recode (operators/Clean.scala P7) applied to the
    // column the reference recodes (created_by_sis)
    val df = Seq((1L, true), (2L, true), (3L, false))
      .toDF("id", "created_by_sis")
      .withColumn("created_by_sis", graft.operators.CleanSpec
        .boolToSentinel(org.apache.spark.sql.functions.col("created_by_sis")))
    assert(df.schema("created_by_sis").dataType == IntegerType)
    assert(df.orderBy("id").select("created_by_sis")
      .as[Int].collect().toSeq == Seq(-1, -1, 0))
    // and the dialect maps that integer to a T-SQL INT column — never
    // BIT, which could not hold the vendor's -1 convention
    val ty = dialect.getJDBCType(IntegerType).map(_.databaseTypeDefinition)
      .getOrElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
        .getCommonJDBCType(IntegerType).get.databaseTypeDefinition)
    assert(ty.toUpperCase == "INTEGER" || ty.toUpperCase == "INT", ty)
  }
}
