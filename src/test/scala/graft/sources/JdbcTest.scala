package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JDBC edge against embedded Derby (ships with Spark for the Hive
  * metastore) — the closest offline stand-in for the reference's SQL
  * Server mirror (reference: src/jenzabar.py:31-47).
  */
class JdbcTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val conn = {
    val dir = java.nio.file.Files.createTempDirectory("derby").toString
    Jdbc.Conn(s"jdbc:derby:$dir/graftdb;create=true")
  }

  private val allowed = Set("RPC_RE_CANVAS_USERS")

  test("overwriteMirror + readTable round-trips rows and truncate-reloads") {
    val users = Seq((1L, "alice", "25", "1S"), (2L, "bob", "25", "1S"))
      .toDF("id_num", "login_id", "yr_cde", "trm_cde")
    Jdbc.overwriteMirror(users, conn, "RPC_RE_CANVAS_USERS", allowed)
    val got = Jdbc.readTable(spark, conn, "RPC_RE_CANVAS_USERS")
    assert(got.count() == 2)
    assert(got.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("id_num", "login_id", "trm_cde", "yr_cde"))

    // truncate-reload: second overwrite replaces, never appends
    val next = Seq((3L, "carol", "25", "2S")).toDF("id_num", "login_id", "yr_cde", "trm_cde")
    Jdbc.overwriteMirror(next, conn, "RPC_RE_CANVAS_USERS", allowed)
    val after = Jdbc.readTable(spark, conn, "RPC_RE_CANVAS_USERS")
    assert(after.select("ID_NUM").as[Long].collect().toSeq == Seq(3L))
  }

  test("readQuery pushes the subquery to the database") {
    val users = Seq((1L, "alice"), (2L, "bob"), (3L, "carol")).toDF("id_num", "login_id")
    Jdbc.overwriteMirror(users, conn.copy(), "RPC_RE_CANVAS_USERS", allowed)
    // Spark writes quoted (case-preserving) column names; Derby uppercases
    // unquoted identifiers, so the pushed query must quote them.
    val got = Jdbc.readQuery(spark, conn,
      """SELECT "id_num" FROM RPC_RE_CANVAS_USERS WHERE "id_num" >= 2""")
    assert(got.as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("federated join: filter pushes into the database scan, dim side broadcasts") {
    val users = Seq((1L, "alice"), (2L, "bob"), (3L, "carol"), (4L, "dan"))
      .toDF("id_num", "login_id")
    Jdbc.overwriteMirror(users, conn, "RPC_RE_CANVAS_USERS", allowed)
    val dbSide = Jdbc.readTable(spark, conn, "RPC_RE_CANVAS_USERS")
      .filter(col("id_num") >= 3)
    val local = Seq((3L, "active"), (4L, "deleted"), (9L, "active"))
      .toDF("id_num", "status")
    val joined = dbSide.join(local, Seq("id_num"))
    val plan = joined.queryExecution.executedPlan.toString
    // the predicate must reach the JDBC scan (run remotely, not on the
    // fetched rows) — the property that keeps a federated dim probe from
    // dragging the whole table over the wire
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(id_num,3)"), plan)
    assert(joined.select("login_id").as[String].collect().sorted.toSeq ==
      Seq("carol", "dan"))
  }

  test("append adds rows without truncating") {
    val base = Seq((10L, "dave")).toDF("id_num", "login_id")
    Jdbc.overwriteMirror(base, conn, "RPC_RE_CANVAS_USERS", allowed)
    Jdbc.append(Seq((11L, "erin")).toDF("id_num", "login_id"), conn, "RPC_RE_CANVAS_USERS")
    val got = Jdbc.readTable(spark, conn, "RPC_RE_CANVAS_USERS")
    assert(got.select("ID_NUM").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
  }

  test("readPartitioned shards the scan into range partitions with no row loss") {
    val rows = (1L to 97L).map(i => (i, s"user$i")).toDF("id_num", "login_id")
    val t = "BIG_USERS"
    Jdbc.overwriteMirror(rows, conn, t, Set(t))
    val got = Jdbc.readPartitioned(spark, conn, t,
      partitionColumn = "id_num", lower = 1L, upper = 98L, numPartitions = 4)
    // 4 concurrent range reads (each executor its own connection + range
    // predicate), together covering every row exactly once — including
    // ids outside [lower, upper), which land in the edge partitions
    assert(got.rdd.getNumPartitions == 4)
    assert(got.count() == 97)
    assert(got.select(sum(col("ID_NUM"))).as[Long].head() == 97L * 98 / 2)
  }

  test("federated pipeline at 10x: partitioned scan, every range does work, no row loss") {
    // The readPartitioned path with the toy 97-row table exercises the
    // plumbing but not the shape that matters at scale: multiple range
    // partitions each streaming a real slice over its own connection.
    // Load the sf0.01 orders table (15k rows, ~150x the toy) into Derby
    // and drive the full federated pipeline: partitioned JDBC fact scan
    // -> broadcast parquet dim join -> aggregate, checksummed against
    // the same pipeline run purely on parquet.
    val sf = "/root/testdata/sf0.01"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val n = orders.count()
    val t = "BIG_ORDERS"
    Jdbc.overwriteMirror(orders, conn, t, Set(t), batchSize = 1000)
    val (lo, hi) = orders
      .agg(min(col("o_orderkey")), max(col("o_orderkey")))
      .as[(Long, Long)].head()
    val db = Jdbc.readPartitioned(spark, conn, t,
      partitionColumn = "o_orderkey", lower = lo, upper = hi + 1,
      numPartitions = 8)
    assert(db.rdd.getNumPartitions == 8)
    // every range partition streams real rows (orderkeys are dense
    // enough that no stride is empty) — the property that makes the
    // partitioned read a parallel scan rather than one hot connection
    val perPart = db.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.forall(_ > 0), perPart.toSeq.toString)
    assert(db.count() == n)
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    def pipeline(fact: org.apache.spark.sql.DataFrame) = fact
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        // decimal-exact sum: a double sum is order-dependent and the
        // JDBC and parquet scans feed partitions in different orders
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      .orderBy(col("c_mktsegment"))
      .collect().toSeq
    assert(pipeline(db) == pipeline(orders))
  }

  test("overwriteMirror refuses tables outside the allow-list") {
    val df = Seq((1L, "x")).toDF("id_num", "login_id")
    assertThrows[IllegalArgumentException] {
      Jdbc.overwriteMirror(df, conn, "SOME_OTHER_TABLE", allowed)
    }
  }
}
