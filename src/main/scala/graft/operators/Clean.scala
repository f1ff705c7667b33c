package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven clean/conform operator.
  *
  * Reifies the densest operator in the reference, `Canvas._clean_dataset`
  * (reference: src/canvas.py:62-104): per-entity projection + rename +
  * filters + value recodes + literal audit columns, driven by per-entity
  * config. In the reference each entity is a full pandas materialization;
  * here the spec compiles to one `DataFrame => DataFrame` of pure Column
  * expressions, so Catalyst pushes the filters and the projection into the
  * scan (PushedFilters / ReadSchema) and the whole stage codegens.
  *
  * Ordering inside the transform mirrors the reference: filters run on the
  * *source* column names (reference filters before renaming,
  * src/canvas.py:69-70 vs :92), renames follow, recodes and literals last.
  *
  * @param keep     columns to project, in output order (src/canvas.py:67-87)
  * @param rename   source -> target column renames (src/canvas.py:68,75,81,92)
  * @param filters  predicates on source columns (src/canvas.py:69-70,89)
  * @param recodes  target column -> replacement expression, e.g. the
  *                 bool -> BIT-sentinel recode True-> -1 / False->0
  *                 (src/canvas.py:94-95)
  * @param literals appended literal/audit columns, e.g. yr_cde / trm_cde /
  *                 load_date (src/canvas.py:97-101)
  */
final case class CleanSpec(
    keep: Seq[String],
    rename: Map[String, String] = Map.empty,
    filters: Seq[Column] = Seq.empty,
    recodes: Map[String, Column] = Map.empty,
    literals: Seq[(String, Column)] = Seq.empty) {

  def apply(df: DataFrame): DataFrame = {
    val filtered = filters.foldLeft(df)(_ filter _)
    val projected = filtered.select(keep.map(col): _*)
    val renamed = rename.foldLeft(projected) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    val recoded = recodes.foldLeft(renamed) { case (d, (c, expr)) =>
      d.withColumn(c, expr)
    }
    literals.foldLeft(recoded) { case (d, (c, expr)) => d.withColumn(c, expr) }
  }
}

object CleanSpec {
  /** Boolean -> SQL-Server-BIT-style sentinel (True -> -1, False -> 0);
    * reference src/canvas.py:94-95, pinned by tests/test_connect.py:184-186.
    * Kept at the sink boundary only — booleans stay booleans in flight.
    */
  def boolToSentinel(c: Column): Column =
    when(c, lit(-1)).otherwise(lit(0))
}
