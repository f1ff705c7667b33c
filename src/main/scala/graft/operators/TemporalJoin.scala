package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins (SURVEY §2.3 J9 [EXT]): as-of and interval joins over
  * keyed event streams.
  *
  * The as-of join avoids the naive range-join formulation (per-left-row
  * scan of earlier right rows — quadratic per key) by sort-merging both
  * sides through ONE shuffle: union the tagged sides, then a running
  * `last(_, ignoreNulls)` over (key, ts) carries the most recent right
  * row forward into each left row. At 100 TB that is a single exchange +
  * per-partition sort — the same cost as any keyed window — with no pair
  * blow-up, no broadcast requirement, and AQE-managed skew.
  */
object TemporalJoin {

  /** Left as-of join: each left row picks up `payload` from the latest
    * right row with the same `key` and rightTs <= leftTs (inclusive);
    * nulls when no such row exists.
    *
    * Contract: `right` must be unique on (key, rightTs) — pre-aggregate
    * ties (e.g. max_by on a unique id) to keep the match deterministic.
    * Payload columns must not collide with left column names, and neither
    * side may already contain the internal working columns `_ats` /
    * `_side` / `_r` / `_m` (guarded with require below — a silent
    * collision would corrupt the match).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val internal = Seq("_ats", "_side", "_r", "_m")
    val clash = (left.columns ++ right.columns).toSet.intersect(internal.toSet)
    require(clash.isEmpty,
      s"asofJoin reserves internal column names ${internal.mkString(", ")}; " +
        s"rename input column(s) ${clash.mkString(", ")}")
    val r = right.select(
      col(key), col(rightTs).as("_ats"), lit(0).as("_side"),
      struct(payload.map(col): _*).as("_r"))
    val l = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_side", lit(1))
    // unionByName fills each side's missing columns with nulls; the right
    // row rides in one struct so a match is picked up atomically (a null
    // payload FIELD inside a real right row survives as-is).
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal ts => inclusive match.
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ats"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val keep = left.columns.map(col) ++ payload.map(p => col(s"_m.$p").as(p))
    matched.select(keep.toSeq: _*)
  }

  /** Interval join: left rows matched to right rows with the same key and
    * rightTs in (leftTs, leftTs + windowUs] — "what followed within w".
    * Equi key + range predicate keeps Catalyst on a hash/sort-merge join
    * with a post-join filter (never a nested-loop cross product); the
    * micros comparison is exact long arithmetic.
    *
    * Contract: `left` rows must be unique across their full column set —
    * the count is grouped by all left columns, so duplicate left rows
    * would collapse into one output row carrying their merged count.
    * De-dup (or add a unique id to) the left side first if needed.
    */
  def intervalJoinCount(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String,
                        windowUs: Long, countCol: String): DataFrame = {
    val lUs = unix_micros(col(s"l.$leftTs"))
    val rUs = unix_micros(col(s"r.$rightTs"))
    left.alias("l")
      .join(right.alias("r"),
        col(s"l.$key") === col(s"r.$key") &&
          rUs > lUs && rUs <= lUs + windowUs,
        "left")
      .groupBy(left.columns.map(c => col(s"l.$c")).toSeq: _*)
      .agg(count(col(s"r.$rightTs")).as(countCol))
  }
}
