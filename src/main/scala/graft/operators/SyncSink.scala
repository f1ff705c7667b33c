package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered multi-sink + sync report (SURVEY §2.1 K3/K4, §2.4 A3).
  *
  * The reference uploads the update files to the SIS import in strict FK
  * dependency order — users before courses before sections before
  * enrollments before the library datasets (reference:
  * src/canvas.py:107-133, order list at 108-116) — and writes a per-file
  * change report (src/canvas.py:136-162). The order is a *correctness*
  * constraint that lives outside the DAG, so it stays in typed driver
  * code: each dataset's sink action is an ordinary Spark write (or any
  * side-effecting callback), but the loop awaits each before starting
  * the next.
  */
object SyncSink {

  /** The reference's FK dependency order (src/canvas.py:108-116). */
  val FK_ORDER: Seq[String] = Seq(
    "faculty_users", "student_users", "courses", "sections",
    "daily_enrollment", "ctl_library_courses", "ctl_library_sections")

  /** Sink each named dataset in `order`, sequentially; datasets absent
    * from `updates` are skipped (the reference tolerates missing files —
    * not every term produces every update). Returns the sunk names.
    */
  def uploadAll(updates: Map[String, DataFrame], order: Seq[String])
               (sink: (String, DataFrame) => Unit): Seq[String] = {
    val unknown = updates.keySet -- order.toSet
    require(unknown.isEmpty, s"datasets not in FK order: $unknown")
    order.filter(updates.contains).map { name =>
      sink(name, updates(name))
      name
    }
  }

  /** Per-entity change statistics across all updates (A3): the counts the
    * Canvas side computes and the reference consumes
    * (src/canvas.py:137-150). One union + one aggregation.
    */
  def changeReport(updates: Map[String, DataFrame]): DataFrame = {
    val tagged = updates.map { case (name, df) =>
      val status =
        if (df.columns.contains("status")) col("status") else lit("created")
      df.select(lit(name).as("dataset"), status.as("status"))
    }
    tagged.reduce(_ unionByName _)
      .groupBy(col("dataset"), col("status"))
      .agg(count(lit(1)).as("n"))
  }

  /** Write the sync report as text lines (K4, report.txt shape:
    * per-dataset counts then warnings; src/canvas.py:136-162).
    */
  def writeReport(spark: SparkSession, report: DataFrame, path: String,
                  warnings: Seq[String] = Nil): Unit = {
    import spark.implicits._
    val lines = report
      .orderBy(col("dataset"), col("status"))
      .collect()
      .map(r => s"${r.getString(0)}: ${r.getString(1)} = ${r.getLong(2)}")
      .toSeq ++ warnings.map(w => s"WARNING: $w")
    lines.toDF("line").coalesce(1).write.mode("overwrite").text(path)
  }
}
