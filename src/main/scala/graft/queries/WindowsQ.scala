package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import Util._

/** Batch-mode equivalents of the streaming window operators
  * (SURVEY §2.8 [EXT]): the same window()/session_window() expressions run
  * in batch over the events table, which makes them DuckDB-oracle-able.
  * The streaming forms (watermarks, state) live in
  * [[graft.streaming.StreamingOps]] and are covered by MemoryStream tests.
  */
object WindowsQ {

  private val US_5M = 300000000L   // 5 minutes in micros
  private val US_30M = 1800000000L // 30 minutes in micros

  def queries: Map[String, Q] = Map(

    // Tumbling 5-minute windows per event type.
    "window_tumbling" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(tsUs(col("window.start")).as("w_start_us"), col("event_type"),
          col("n"), col("total"))
        .orderBy(col("w_start_us"), col("event_type"))
    }),

    // Sliding 10-minute windows every 5 minutes (each event in 2 windows).
    "window_sliding" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(tsUs(col("window.start")).as("w_start_us"), col("event_type"),
          col("n"))
        .orderBy(col("w_start_us"), col("event_type"))
    }),

    // Session windows: >= 30-minute silence starts a new session.
    "window_session" -> ((s, dir) => {
      events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), tsUs(col("session_window.start")).as("s_start_us"),
          tsUs(col("session_window.end")).as("s_end_us"), col("n_events"))
        .orderBy(col("user_id"), col("s_start_us"))
    }),

    // RANGE-frame moving aggregate: each event's trailing-30-minute spend
    // per user, frame bounded by VALUE distance (micros), not row count —
    // the frame type rows-frames can't express when events arrive
    // irregularly. Tie timestamps are frame PEERS (all included), so the
    // result is deterministic without a unique-ts assumption; cents keep
    // the sum exact.
    "window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-US_30M, 0)
      events(s, dir)
        .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
          (d2(col("value")) * 100).cast("long").as("cents"))
        .withColumn("mov_cents", sum(col("cents")).over(w))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("mov_cents"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // Lag-based sessionization (gaps-and-islands by hand): session count +
    // mean session length per user. Complements window_session by
    // exercising the analytic-window formulation.
    "events_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("ts_us", tsUs(col("ts")))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_session",
          when(col("gap_us").isNull || col("gap_us") >= US_30M, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Trailing-window anomaly detection: each hour's event count vs the
    // mean/variance of the PREVIOUS 24 hours, the 2-sigma test done in
    // exact integers via cross-multiplication — (n·x − s1)² > 4·(n·s2 −
    // s1²) is (x−μ)² > (2σ)² with every n² cleared, so no division and
    // no doubles anywhere. The one unpartitioned ordered window runs
    // over the hourly PRE-AGGREGATE: rows bounded by the calendar, not
    // data volume (the price_record_lows argument).
    "anomaly_hours" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("x"))
      val w = Window.orderBy(col("h")).rowsBetween(-24, -1)
      hourly
        .withColumn("n", count(col("x")).over(w))
        .withColumn("s1", sum(col("x")).over(w))
        .withColumn("s2", sum(col("x") * col("x")).over(w))
        .filter(col("n") >= 12)
        .select(tsUs(col("h")).as("h_us"), col("x"), col("n"),
          ((col("n") * col("x") - col("s1")) * (col("n") * col("x") - col("s1")) >
            lit(4) * (col("n") * col("s2") - col("s1") * col("s1")))
            .as("anomalous"))
        .orderBy(col("h_us"))
    }),

    // Longest strictly-increasing daily-revenue run per segment —
    // gaps-and-islands over the daily pre-aggregate: a break row (first
    // day, or no rise) starts a new island via a running break-count;
    // island length counts the anchor day plus its consecutive rises.
    // Both windows key by segment over day-granular rows (calendar-
    // bounded input).
    "revenue_streaks" -> ((s, dir) => {
      val daily = orders(s, dir)
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), date_trunc("day", col("o_orderdate")).as("d"))
        .agg(sum((d2(col("o_totalprice")) * 100).cast("long")).as("cents"))
      val wSeg = Window.partitionBy(col("c_mktsegment")).orderBy(col("d"))
      daily
        .withColumn("brk",
          when(col("cents") > lag(col("cents"), 1).over(wSeg), 0L).otherwise(1L))
        .withColumn("island", sum(col("brk")).over(
          wSeg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("c_mktsegment"), col("island"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("c_mktsegment"))
        .agg(max(col("len")).as("longest_streak"), sum(col("len")).as("n_days"))
        .orderBy(col("c_mktsegment"))
    }),

    // Seasonal-naive forecast backtest: each (type, hour-of-day) cell is
    // predicted by the SAME cell one observed day earlier (pure lag — no
    // division, no model state), errors aggregated per type in exact
    // integers. The series is the observed hourly pre-aggregate: a
    // (type, hour) partition holds at most one row per calendar day, so
    // every window frame is calendar-bounded regardless of data volume,
    // and an hour with no events simply isn't a forecastable point
    // (both engines see the identical present-row set — no spine join
    // needed for an error AGGREGATE, unlike events_gapfill's output).
    "seasonal_naive_error" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"),
          hour(col("ts")).cast("long").as("hh"))
        .agg(count(lit(1)).as("n"),
          sum((d2(col("value")) * 100).cast("long")).as("cents"))
      val w = Window.partitionBy(col("event_type"), col("hh")).orderBy(col("d"))
      hourly
        .withColumn("pn", lag(col("n"), 1).over(w))
        .withColumn("pc", lag(col("cents"), 1).over(w))
        .filter(col("pn").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_forecasts"),
          sum(abs(col("n") - col("pn"))).as("abs_err_events"),
          sum(abs(col("cents") - col("pc"))).as("abs_err_cents"),
          max(abs(col("cents") - col("pc"))).as("max_err_cents"))
        .orderBy(col("event_type"))
    })
  )

  def oracles: Map[String, String] = Map(

    "anomaly_hours" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS x
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT h, x,
        |    count(x) OVER win AS n,
        |    sum(x) OVER win AS s1,
        |    sum(x * x) OVER win AS s2
        |  FROM hourly
        |  WINDOW win AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT epoch_us(h) AS h_us, x, CAST(n AS BIGINT) AS n,
        |  (n * x - s1) * (n * x - s1) > 4 * (n * s2 - s1 * s1) AS anomalous
        |FROM w WHERE n >= 12 ORDER BY h_us""".stripMargin,

    "revenue_streaks" ->
      """WITH daily AS (
        |  SELECT c_mktsegment, date_trunc('day', o_orderdate) AS d,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |f AS (
        |  SELECT c_mktsegment, d,
        |    CASE WHEN cents > lag(cents) OVER (PARTITION BY c_mktsegment ORDER BY d)
        |         THEN 0 ELSE 1 END AS brk
        |  FROM daily),
        |i AS (
        |  SELECT c_mktsegment,
        |    sum(brk) OVER (PARTITION BY c_mktsegment ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |l AS (SELECT c_mktsegment, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT c_mktsegment, CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_days
        |FROM l GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "seasonal_naive_error" ->
      """WITH h AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(hour(ts) AS BIGINT) AS hh, COUNT(*) AS n,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2, 3),
        |l AS (
        |  SELECT event_type, n, cents,
        |    LAG(n) OVER (PARTITION BY event_type, hh ORDER BY d) AS pn,
        |    LAG(cents) OVER (PARTITION BY event_type, hh ORDER BY d) AS pc
        |  FROM h)
        |SELECT event_type, COUNT(*) AS n_forecasts,
        |  CAST(SUM(ABS(n - pn)) AS BIGINT) AS abs_err_events,
        |  CAST(SUM(ABS(cents - pc)) AS BIGINT) AS abs_err_cents,
        |  CAST(MAX(ABS(cents - pc)) AS BIGINT) AS max_err_cents
        |FROM l WHERE pn IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "window_tumbling" ->
      s"""SELECT epoch_us(ts) - epoch_us(ts) % $US_5M AS w_start_us,
         |  event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM events GROUP BY w_start_us, event_type
         |ORDER BY w_start_us, event_type""".stripMargin,

    "window_sliding" ->
      s"""WITH assigned AS (
         |  SELECT epoch_us(ts) - epoch_us(ts) % $US_5M AS w_start_us, event_type
         |  FROM events
         |  UNION ALL
         |  SELECT epoch_us(ts) - epoch_us(ts) % $US_5M - $US_5M AS w_start_us, event_type
         |  FROM events)
         |SELECT w_start_us, event_type, COUNT(*) AS n
         |FROM assigned GROUP BY w_start_us, event_type
         |ORDER BY w_start_us, event_type""".stripMargin,

    "window_session" ->
      s"""WITH flagged AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |           PARTITION BY user_id ORDER BY ts, event_id) >= $US_30M
         |         OR lag(epoch_us(ts)) OVER (
         |           PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM events),
         |islands AS (
         |  SELECT user_id, ts_us,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM flagged)
         |SELECT user_id, MIN(ts_us) AS s_start_us,
         |  MAX(ts_us) + $US_30M AS s_end_us, COUNT(*) AS n_events
         |FROM islands GROUP BY user_id, sess_id
         |ORDER BY user_id, s_start_us""".stripMargin,

    "window_range_frame" ->
      s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
         |    PARTITION BY user_id ORDER BY epoch_us(ts)
         |    RANGE BETWEEN $US_30M PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS mov_cents
         |FROM events
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "events_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |           PARTITION BY user_id ORDER BY ts, event_id) >= $US_30M
         |         OR lag(epoch_us(ts)) OVER (
         |           PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM events)
         |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
         |  COUNT(*) AS n_events
         |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
