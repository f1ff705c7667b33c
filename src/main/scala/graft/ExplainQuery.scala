package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: execute one declared query at a given SF dir
  * and print its executed (post-AQE) physical plan — the feedback loop
  * for the scale audits in PlanShapeTest and SURVEY §4.
  *
  * usage: runMain graft.ExplainQuery <query_name> [sfDir]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println("=====PLAN=====")
    println(df.queryExecution.executedPlan.toString)
    // Post-execution formatted plan (AQE-final): operator list with
    // PushedFilters / ReadSchema / join build sides — the round-15
    // optimization deliverable's plan-evidence format.
    println("=====FORMATTED=====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
