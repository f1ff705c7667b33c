package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import Util._

/** Aggregation / window / sort / set-op / JSON surface
  * (SURVEY §2.4 A4-A5, §2.5, §2.6, §2.7, §2.2 F5-F7/F10).
  */
object Analytics {

  def queries: Map[String, Q] = Map(

    // A4: argmax — latest event per user (reference's "latest report" scan
    // tests/test_connect.py:70-79 is row_number over ended_at desc in
    // disguise). One shuffle on the grouping key.
    "latest_event_argmax" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), tsUs(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // O1/O3: global top-k -> Spark plans TakeOrderedAndProject (partial
    // top-k per partition, no full sort — the shape that survives 100 TB).
    "topk_orders" -> ((s, dir) => {
      orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // O3 per-group top-k via ranking window.
    "topk_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, dir)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // §2.5 ranking windows: rank / dense_rank / ntile.
    "window_rank" -> ((s, dir) => {
      val byPrice = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc)
      val total = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          rank().over(byPrice).as("rnk"),
          dense_rank().over(byPrice).as("drnk"),
          ntile(4).over(total).as("quartile"))
        .orderBy(col("o_orderkey"))
    }),

    // §2.5 analytic windows: lag/lead session stitching over events.
    "window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("ts_us", tsUs(col("ts")))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // §2.5 frame spec: running total per customer (exact decimal frame sum).
    "window_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          sum(d2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // §2.5 distribution windows: cume_dist / percent_rank. The order key
    // is made unique with o_orderkey, so both are exact small-int ratios
    // (rn/n, (rn-1)/(n-1)) — one IEEE division, bit-identical across
    // engines.
    "window_cume_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          cume_dist().over(w).as("cd"),
          percent_rank().over(w).as("pr"))
        .orderBy(col("o_orderkey"))
    }),

    // Sequence mining: each user's first-5 event-type path (ordered by
    // ts, tie-broken by event_id), counted across users. One shuffle
    // keyed by user_id for the ranking window, then the path table is
    // |types|^5 at most — tiny at any SF.
    "events_user_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy(col("user_id"))
        .agg(concat_ws(">",
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            e => e.getField("event_type"))).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    }),

    // §2.7 set ops over the two diff streams the reference keeps as
    // separate files (faculty/student users, src/canvas.py:109-110).
    "set_union" -> ((s, dir) => {
      val high = orders(s, dir).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      val fin = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      high.unionByName(fin).distinct().orderBy(col("o_custkey"))
    }),

    "set_except" -> ((s, dir) => {
      val high = orders(s, dir).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      val fin = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      high.exceptAll(fin).orderBy(col("o_custkey"))
    }),

    "set_intersect" -> ((s, dir) => {
      val high = orders(s, dir).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      val fin = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      high.intersect(fin).orderBy(col("o_custkey"))
    }),

    // INTERSECT ALL (bag semantics): multiplicity = min of the two
    // sides' counts — one hash aggregate per side under the hood, vs
    // set_intersect's distinct semantics.
    "set_intersect_all" -> ((s, dir) => {
      val high = orders(s, dir).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      val fin = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      high.intersectAll(fin).orderBy(col("o_custkey"))
    }),

    // A5: distinct aggregation (two-phase distinct under the hood).
    "count_distinct_segment" -> ((s, dir) => {
      customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // A5: HLL sketch. Raw estimates differ per engine, so the query is
    // made oracle-checkable by CONSTRUCTION: it emits the exact distinct
    // count plus a boolean asserting the HLL estimate landed within 3x
    // its configured relative standard deviation (default rsd = 0.05).
    // The oracle expects approx_ok = true for every group, so a drifting
    // HLL implementation FAILS the hash gate instead of going unchecked.
    "approx_distinct_parts" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") <=
            lit(0.15) * col("exact_parts").cast("double")).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // A5: the exact twin — at 100 TB this is the expensive two-phase
    // distinct the sketch above approximates; declared side by side so a
    // user can choose the cost/accuracy point per query.
    "exact_distinct_parts" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // A5 rollup: subtotals + grand total.
    "rollup_orders" -> ((s, dir) => {
      orders(s, dir)
        .rollup(year(col("o_orderdate")).cast("long").as("o_year"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_year").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // A5 cube: all grouping-set combinations.
    "cube_lineitem" -> ((s, dir) => {
      lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Two-phase SALTED aggregation under the oracle gate: event_type has
    // a handful of hot keys over the whole table — the exact shape where
    // one reducer owns a key's entire partial state. The salt spreads
    // each key over 16 (key, salt) groups for the first aggregate; the
    // second collapses them. Decimal partials keep the final double
    // identical to the unsalted plan, which is what the oracle computes.
    "salted_event_totals" -> ((s, dir) => {
      graft.operators.Skew.saltedAgg(
        events(s, dir).select(col("event_type"), col("value")),
        key = col("event_type"),
        saltCol = pmod(xxhash64(col("value")), lit(16)),
        partials = Seq(sum(d2(col("value"))).as("ps"), count(lit(1)).as("pn")),
        finals = Seq(sum(col("ps")).cast("double").as("total"),
          sum(col("pn")).as("n")))
        .withColumnRenamed("k", "event_type")
        .orderBy(col("event_type"))
    }),

    // F10: JSON field extraction from the events props payload.
    "json_extract_events" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // The VARIANT twin of json_extract_events: parse the JSON ONCE into
    // Spark 4's binary variant encoding, then typed variant_get access —
    // the parse-once/access-many shape for semi-structured columns at
    // scale (get_json_object re-parses the string per extraction).
    // try_parse_json nulls malformed rows instead of failing the job.
    "variant_extract_events" -> ((s, dir) => {
      events(s, dir)
        .withColumn("v", try_parse_json(col("props")))
        .withColumn("k", variant_get(col("v"), "$.k", "long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_missing"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // F5/F6/F7: timestamp format / parse / path-safe char replace.
    "ts_roundtrip" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_id"), tsUs(col("ts")).as("ts_us"),
          tsUs(to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")))
            .as("ts_sec_us"),
          translate(date_format(col("ts"), "yyyy-MM-dd HH:mm"), ":", "_")
            .as("run_id"))
        .orderBy(col("event_id"))
    }),

    // O3 + J8: TPC-H Q3 shape — filtered 3-way join, top-10 by revenue.
    "q3_shipping_topk" -> ((s, dir) => {
      val cust = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = orders(s, dir)
        .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      val li = lineitem(s, dir)
        .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("rev"))
        .select(col("l_orderkey"), tsUs(col("o_orderdate")).as("o_orderdate_us"),
          col("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
    })
  )

  def oracles: Map[String, String] = Map(

    "latest_event_argmax" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "topk_orders_per_cust" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "window_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk,
        |  ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "window_lag_lead" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(event_type, 1) OVER w AS next_type,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "window_running_total" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_cume_dist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "events_user_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, count(*) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path""".stripMargin,

    "set_union" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "count_distinct_segment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "approx_distinct_parts" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts, COUNT(*) AS n,
        |  true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "exact_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "rollup_orders" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_year, o_orderpriority)
        |ORDER BY o_year NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "cube_lineitem" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "salted_event_totals" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The outer CAST matters: DuckDB SUM(BIGINT) yields HUGEINT, which
    // value-hashes differently from Spark's long.
    "json_extract_events" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "variant_extract_events" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |  CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ts_roundtrip" ->
      """SELECT event_id, epoch_us(ts) AS ts_us,
        |  epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
        |    '%Y-%m-%d %H:%M:%S')) AS ts_sec_us,
        |  replace(strftime(ts, '%Y-%m-%d %H:%M'), ':', '_') AS run_id
        |FROM events ORDER BY event_id""".stripMargin,

    "q3_shipping_topk" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin
  )
}
