package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.TemporalJoin
import Util._

/** Temporal-join queries (SURVEY §2.3 J9 [EXT]) over the events table:
  * as-of attribution and interval ("what followed") joins — the two
  * shapes a training-data/event pipeline needs that plain equi-joins
  * can't express.
  */
object TemporalQ {

  private val HOUR_US = 3600000000L

  def queries: Map[String, Q] = Map(

    // As-of join: each purchase attributed to the same user's latest view
    // at or before it (left: purchases keep rows with no prior view).
    // The right side is pre-aggregated unique on (user_id, ts) so the
    // match is deterministic.
    "asof_join_events" -> ((s, dir) => {
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_event_id"),
          max_by(col("value"), col("event_id")).as("view_value"))
        .select(col("user_id"), col("ts"),
          col("view_event_id"), tsUs(col("ts")).as("view_ts_us"), col("view_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      TemporalJoin.asofJoin(purchases, views, "user_id", "ts", "ts",
          Seq("view_event_id", "view_ts_us", "view_value"))
        .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
          col("view_event_id"), col("view_ts_us"), col("view_value"))
        .orderBy(col("event_id"))
    }),

    // Interval join: per signup event, how many same-user events follow
    // within one hour (exclusive start, inclusive end).
    "interval_join_events" -> ((s, dir) => {
      val ev = events(s, dir)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"))
      TemporalJoin.intervalJoinCount(signups, ev.select(col("user_id"), col("ts")),
          "user_id", "ts", "ts", HOUR_US, "n_follow")
        .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
          col("n_follow"))
        .orderBy(col("event_id"))
    })
  )

  def oracles: Map[String, String] = Map(

    "asof_join_events" ->
      """WITH v AS (
        |  SELECT user_id, ts, MAX(event_id) AS view_event_id,
        |    arg_max(value, event_id) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        |p AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  v.view_event_id, epoch_us(v.ts) AS view_ts_us, v.view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,

    "interval_join_events" ->
      s"""SELECT s.event_id, s.user_id, epoch_us(s.ts) AS ts_us,
         |  COUNT(e.ts) AS n_follow
         |FROM (SELECT event_id, user_id, ts FROM events
         |      WHERE event_type = 'signup') s
         |LEFT JOIN events e
         |  ON s.user_id = e.user_id
         | AND epoch_us(e.ts) > epoch_us(s.ts)
         | AND epoch_us(e.ts) <= epoch_us(s.ts) + $HOUR_US
         |GROUP BY s.event_id, s.user_id, s.ts
         |ORDER BY s.event_id""".stripMargin
  )
}
