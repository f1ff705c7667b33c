package graft.queries

import org.apache.spark.sql.expressions.Window
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

    // Sweep-line max concurrency — the interval primitive the coverage
    // MERGE (gaps-and-islands) cannot answer: each supplier's PEAK
    // number of simultaneously in-flight shipments and the first day it
    // was hit, the capacity-planning gauge. Shipment in-flight window =
    // [shipdate, shipdate + 3 + (orderkey + linenumber) % 12] days
    // (deterministic synthetic transit — the corpus carries no receipt
    // date). Classic sweep: +1 at start / -1 past end, per-(supplier,
    // day) deltas reduce MAP-SIDE before any window, the running sum is
    // per-supplier (never a global window), peak day via an explicit
    // (conc desc, day) row_number. Everything in epoch-day integers.
    // At 100 TB the window partition is one supplier's distinct active
    // days — dimension-bounded — and the delta aggregate carries two
    // rows per lineitem at most into the shuffle.
    "peak_inflight_shipments" -> ((s, dir) => {
      val li = lineitem(s, dir).select(col("l_suppkey"),
        datediff(col("l_shipdate"), lit("1970-01-01").cast("timestamp"))
          .cast("long").as("st"),
        (lit(3L) + pmod(col("l_orderkey") + col("l_linenumber"), lit(12))
          .cast("long")).as("transit"))
      val deltas = li.select(col("l_suppkey"), col("st").as("day"),
          lit(1L).as("delta"))
        .unionByName(li.select(col("l_suppkey"),
          (col("st") + col("transit") + 1).as("day"),
          lit(-1L).as("delta")))
        .groupBy(col("l_suppkey"), col("day"))
        .agg(sum(col("delta")).as("d"))
      val sw = Window.partitionBy(col("l_suppkey")).orderBy(col("day"))
      val pk = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("conc").desc, col("day"))
      deltas.withColumn("conc", sum(col("d")).over(sw))
        .withColumn("rn", row_number().over(pk))
        .filter(col("rn") === 1)
        .select(col("l_suppkey"), col("conc").as("peak_inflight"),
          col("day").as("peak_day"))
        .orderBy(col("l_suppkey"))
    }),

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
    }),

    // Bitemporal point-in-time reconstruction: the state of the world
    // "as KNOWN at transaction time T, EFFECTIVE at valid time V" —
    // the audit/backtest query SCD2 alone (one time axis) can't answer.
    // A deterministic bitemporal changelog is synthesized from orders
    // (initial version; a late price correction re-stating the SAME
    // valid period 30 days later for keys ≡0 mod 7; a new valid period
    // with status F learned at its own start for keys ≡0 mod 3), then
    // the reconstruction is the standard two-step: close tx intervals
    // per (key, valid_from) with one lead and keep the T-visible
    // version, THEN close valid intervals per key over the surviving
    // snapshot and keep the V-effective row. Two key-partitioned
    // windows, everything else exact integers.
    "bitemporal_asof" -> ((s, dir) => {
      val o = orders(s, dir).select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"),
        col("o_orderdate").as("od"))
      val v1 = o.select(col("k"), col("status"), col("cents"),
        col("od").as("valid_from"), col("od").as("tx_from"))
      val v2 = o.filter(col("k") % 7 === 0)
        .select(col("k"), col("status"),
          expr("cents + cents div 10").as("cents"),
          col("od").as("valid_from"),
          expr("od + INTERVAL 30 DAYS").as("tx_from"))
      val v3 = o.filter(col("k") % 3 === 0)
        .select(col("k"), lit("F").as("status"), col("cents"),
          expr("od + INTERVAL 60 DAYS").as("valid_from"),
          expr("od + INTERVAL 60 DAYS").as("tx_from"))
      val t = lit("1998-01-01").cast("timestamp")
      val v = lit("1999-01-01").cast("timestamp")
      val wTx = Window.partitionBy(col("k"), col("valid_from"))
        .orderBy(col("tx_from"))
      val wValid = Window.partitionBy(col("k")).orderBy(col("valid_from"))
      v1.unionByName(v2).unionByName(v3)
        .withColumn("tx_to", lead(col("tx_from"), 1).over(wTx))
        .filter(col("tx_from") <= t &&
          (col("tx_to").isNull || col("tx_to") > t))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wValid))
        .filter(col("valid_from") <= v &&
          (col("valid_to").isNull || col("valid_to") > v))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
        .orderBy(col("status"))
    })
  )

  def oracles: Map[String, String] = Map(

    // Mirrors peak_inflight_shipments: same synthetic transit, same
    // delta sweep, same explicit peak tie-break.
    "peak_inflight_shipments" ->
      """WITH li AS (
        |  SELECT l_suppkey,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS st,
        |    3 + (l_orderkey + l_linenumber) % 12 AS transit
        |  FROM lineitem),
        |deltas AS (
        |  SELECT l_suppkey, day, CAST(sum(delta) AS BIGINT) AS d
        |  FROM (SELECT l_suppkey, st AS day, 1 AS delta FROM li
        |        UNION ALL
        |        SELECT l_suppkey, st + transit + 1, -1 FROM li)
        |  GROUP BY 1, 2),
        |run AS (
        |  SELECT l_suppkey, day,
        |    sum(d) OVER (PARTITION BY l_suppkey ORDER BY day) AS conc
        |  FROM deltas),
        |ranked AS (
        |  SELECT l_suppkey, day, conc, row_number() OVER (
        |    PARTITION BY l_suppkey ORDER BY conc DESC, day) AS rn
        |  FROM run)
        |SELECT l_suppkey, CAST(conc AS BIGINT) AS peak_inflight,
        |  CAST(day AS BIGINT) AS peak_day
        |FROM ranked WHERE rn = 1 ORDER BY l_suppkey""".stripMargin,

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
         |ORDER BY s.event_id""".stripMargin,

    "bitemporal_asof" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_orderdate AS od
        |  FROM orders),
        |log AS (
        |  SELECT k, status, cents, od AS valid_from, od AS tx_from FROM o
        |  UNION ALL
        |  SELECT k, status, cents + cents // 10, od,
        |    od + INTERVAL 30 DAY FROM o WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k, 'F', cents, od + INTERVAL 60 DAY,
        |    od + INTERVAL 60 DAY FROM o WHERE k % 3 = 0),
        |knwn AS (
        |  SELECT * FROM (
        |    SELECT *, lead(tx_from) OVER (
        |      PARTITION BY k, valid_from ORDER BY tx_from) AS tx_to
        |    FROM log)
        |  WHERE tx_from <= TIMESTAMP '1998-01-01'
        |    AND (tx_to IS NULL OR tx_to > TIMESTAMP '1998-01-01')),
        |eff AS (
        |  SELECT * FROM (
        |    SELECT *, lead(valid_from) OVER (
        |      PARTITION BY k ORDER BY valid_from) AS valid_to
        |    FROM knwn)
        |  WHERE valid_from <= TIMESTAMP '1999-01-01'
        |    AND (valid_to IS NULL OR valid_to > TIMESTAMP '1999-01-01'))
        |SELECT status, count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM eff GROUP BY status ORDER BY status""".stripMargin
  )
}
