package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Layout tests: the write-time layouts buy the promised plan shapes —
  * bucketed joins run without exchanges, partitioned scans prune via
  * dynamic partition pruning.
  */
class LayoutTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange") {
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 500).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    Layout.writeBucketed(left, "bkt_left", Seq("id"), buckets = 4)
    Layout.writeBucketed(right, "bkt_right", Seq("id"), buckets = 4)
    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 500)
  }

  test("partitioned layout prunes statically on literal filters") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    val fact = Seq(
      ("211S", 1L, 10.0), ("211S", 2L, 20.0), ("212S", 3L, 30.0)
    ).toDF("term", "id", "v")
    Layout.writePartitioned(fact, s"$dir/fact", Seq("term"))
    val q = spark.read.parquet(s"$dir/fact").filter($"term" === "211S")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(term"), plan)
    assert(q.count() == 2)
  }

  test("dim-join filter triggers dynamic partition pruning on the fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    val fact = (1 to 300).map(i => (s"t${i % 3}", i.toLong)).toDF("term", "id")
    Layout.writePartitioned(fact, s"$dir/fact", Seq("term"))
    // dim must be a real scan (a local relation constant-folds the
    // filter away before the DPP rule can see it)
    Seq(("t0", "current"), ("t1", "old"), ("t2", "old"))
      .toDF("term", "kind").write.mode("overwrite").parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val q = spark.read.parquet(s"$dir/fact")
      .join(dim.filter($"kind" === "current"), "term")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    assert(q.count() == 100)
  }
}
