package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import Util._

/** Relational reshape + order-statistics surface (SURVEY §2.4/§2.5
  * completeness): unpivot (the inverse of pivot_orders), grouped mode
  * with deterministic tie-break, and the running-record-low frontier
  * (2-D Pareto skyline over (date, price) after the daily pre-aggregate).
  */
object Reshape {

  /** Long.MaxValue sentinel for "no earlier record" on both engines. */
  private val NO_PRIOR = Long.MaxValue

  def queries: Map[String, Q] = Map(

    // Exact weighted median (weight = quantity) per return flag: the
    // order statistic percentile_orders can't give when rows carry
    // weights. Division-free: the median is the smallest value whose
    // running weight doubles past the group total (2·cum ≥ tot in
    // longs). One pre-aggregate collapses duplicate cent values before
    // the cumulative window, so the window runs over distinct values
    // per group, not raw rows — at 100 TB that's the difference between
    // a bounded per-group frame and a fact-sized one. The 3-row group
    // totals ride back as a broadcast join.
    "weighted_median_price" -> ((s, dir) => {
      val li = lineitem(s, dir).select(col("l_returnflag"),
        (d2(col("l_extendedprice")) * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      val grouped = li.groupBy(col("l_returnflag"), col("cents"))
        .agg(sum(col("w")).as("gw"))
      val tot = li.groupBy(col("l_returnflag")).agg(sum(col("w")).as("total_weight"))
      // Round-11: the running count comes from the distributed grouped
      // prefix sum — a plain flag-partitioned window put each flag's
      // whole distinct-cents tail (value-domain-sized, ~2M rows per
      // flag at the organic 10x corpus, ~30M at 100 TB) through one
      // task. Values identical: sum over the same (cents) order.
      graft.operators.Blocking.groupedPrefixSum(grouped,
          Seq("l_returnflag"), Seq(col("cents")), "gw", "cum")
        .join(broadcast(tot), Seq("l_returnflag"))
        .filter(col("cum") * 2 >= col("total_weight"))
        .groupBy(col("l_returnflag"), col("total_weight"))
        .agg(min(col("cents")).as("median_cents"))
        .select(col("l_returnflag"), col("median_cents"), col("total_weight"))
        .orderBy(col("l_returnflag"))
    }),

    // Winsorized (5%-trimmed-to-bounds) mean per priority class — the
    // robust-mean twin of mad_outliers' robust sigma: values are clamped
    // to the exact discrete p05/p95 order statistics before averaging,
    // so a fat tail moves the mean by at most 5% of mass times the
    // fence. Division-free thresholds (same trick as the weighted
    // median): pN = smallest value whose running count cross-multiplies
    // past N% of the group (20·cum ≥ n for p05, 20·cum ≥ 19·n for p95)
    // — no interpolation, both fences are actual data values, so every
    // output column is an exact integer. Duplicate cents collapse in a
    // pre-aggregate before the cumulative window (distinct values per
    // group, bounded frames at 100 TB); the 5-row fence table broadcasts
    // back onto the value-counts table, never the fact table.
    "winsorized_mean_price" -> ((s, dir) => {
      val o = orders(s, dir).select(col("o_orderpriority"),
        (d2(col("o_totalprice")) * 100).cast("long").as("cents"))
      // persisted: the (priority, cents) pre-aggregate feeds the
      // cumulative fence computation AND the final clamp join
      // (ScanAudit: orders x5 without the cache)
      val g = o.groupBy(col("o_orderpriority"), col("cents"))
        .agg(count(lit(1)).as("gn"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t = o.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      // Round-11: distributed grouped prefix sum — 5 priority groups
      // each carry a value-domain-sized distinct-cents tail, which a
      // priority-partitioned window would push through 5 tasks.
      val cum = graft.operators.Blocking.groupedPrefixSum(g,
          Seq("o_orderpriority"), Seq(col("cents")), "gn", "cum")
        .join(broadcast(t), Seq("o_orderpriority"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fences = cum.filter(col("cum") * 20 >= col("n"))
        .groupBy(col("o_orderpriority")).agg(min(col("cents")).as("p05"))
        .join(cum.filter(col("cum") * 20 >= col("n") * 19)
          .groupBy(col("o_orderpriority")).agg(min(col("cents")).as("p95")),
          Seq("o_orderpriority"))
      g.join(broadcast(fences), Seq("o_orderpriority"))
        .withColumn("clamped",
          least(greatest(col("cents"), col("p05")), col("p95")))
        .groupBy(col("o_orderpriority"), col("p05"), col("p95"))
        .agg(sum(col("gn")).as("n"),
          sum(col("gn") * col("clamped")).as("wsum_cents"))
        .select(col("o_orderpriority"), col("p05"), col("p95"), col("n"),
          col("wsum_cents"),
          expr("wsum_cents div n").as("wmean_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // Unpivot / melt — the inverse of pivot_orders: one wide aggregate
    // row per priority becomes one (metric, value) row per measure.
    // Spark's native unpivot (no UDTF, no explode-of-struct shim) keeps
    // the rewrite inside Catalyst: the plan is the same single hash
    // aggregate plus a local Expand, nothing re-shuffles on the metric
    // axis.
    "unpivot_orders" -> ((s, dir) => {
      val wide = orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum((d2(col("o_totalprice")) * 100).cast("long")).as("sum_cents"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L))
            .as("n_open"))
      wide.unpivot(
          Array(col("o_orderpriority")),
          Array(col("n_orders"), col("sum_cents"), col("n_open")),
          "metric", "value")
        .orderBy(col("o_orderpriority"), col("metric"))
    }),

    // Grouped mode with deterministic ties: the most frequent cents
    // value per event type, lowest value winning a frequency tie.
    // argmax as min(struct(-n, cents)) — two hash aggregates keyed by
    // bounded-cardinality keys, no ranking window, no skew (the struct
    // min combines map-side like any other agg).
    "mode_event_cents" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"), (d2(col("value")) * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"),
          struct((-col("n")).as("nn"), col("cents").as("c")).as("s"))
        .groupBy(col("event_type"))
        .agg(min(col("s")).as("m"))
        .select(col("event_type"), (-col("m.nn")).as("n_mode"),
          col("m.c").as("mode_cents"))
        .orderBy(col("event_type"))
    }),

    // SQL front end: the same engine surface through spark.sql over
    // registered views, with correlated EXISTS / NOT EXISTS subqueries —
    // customers holding a >400k order but no completed ('F') one.
    // Catalyst decorrelates both into semi/anti joins (pinned in
    // PlanShapeTest): the declarative SQL path and the DataFrame path
    // land on identical physical plans, which is the point.
    "sql_exists_customers" -> ((s, dir) => {
      customer(s, dir).createOrReplaceTempView("graft_sql_customer")
      orders(s, dir).createOrReplaceTempView("graft_sql_orders")
      s.sql("""
        SELECT c.c_custkey, c.c_name
        FROM graft_sql_customer c
        WHERE EXISTS (SELECT 1 FROM graft_sql_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM graft_sql_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        ORDER BY c.c_custkey""")
    }),

    // Running record lows — the 2-D Pareto frontier of (order date,
    // price): days whose cheapest order undercuts every earlier day.
    // The raw fact table pre-aggregates to one row per day FIRST (one
    // hash aggregate, map-side combined), so the prefix-min window runs
    // over a calendar-bounded set (one row per distinct day — tens of
    // thousands of rows after decades of data), not over the orders;
    // the single-partition window is bounded by the calendar, never by
    // data volume.
    "price_record_lows" -> ((s, dir) => {
      val daily = orders(s, dir)
        .groupBy(col("o_orderdate"))
        .agg(min((d2(col("o_totalprice")) * 100).cast("long")).as("min_cents"))
      val w = Window.orderBy(col("o_orderdate"))
        .rowsBetween(Window.unboundedPreceding, -1)
      daily
        .withColumn("prior_low",
          coalesce(min(col("min_cents")).over(w), lit(NO_PRIOR)))
        .filter(col("min_cents") < col("prior_low"))
        .select(tsUs(col("o_orderdate")).as("date_us"), col("min_cents"))
        .orderBy(col("date_us"))
    }),

    // 2-D Pareto skyline: the cheap-and-big part frontier (minimize
    // price, maximize size — size negated into the min-min operator).
    // The oracle is the O(n²) NOT EXISTS dominance definition; the plan
    // is operators/Skyline.scala's bucket-parallel two-phase pass — one
    // (min,max) broadcast, one bucket-keyed shuffle, windows partitioned
    // by bucket, and a B-row cumulative-min side table.
    "skyline_parts" -> ((s, dir) => {
      // persisted: the bucket-parallel frontier consumes the point table
      // in its local-frontier and global-filter passes (ScanAudit:
      // part x4)
      val pts = part(s, dir)
        .select(col("p_partkey"),
          (d2(col("p_retailprice")) * 100).cast("long").as("price_cents"),
          col("p_size").cast("long").as("p_size"),
          (-col("p_size")).cast("long").as("neg_size"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.operators.Skyline.skylineMinMin(pts, "price_cents", "neg_size")
        .select(col("p_partkey"), col("price_cents"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    // Ratio-to-report: each priority class's share of total order value
    // as exact integer permille — the share-of-total analytic without a
    // global window: one grouped aggregate plus a broadcast of the
    // 1-row total (a Window.orderBy(nothing) sum would single-partition
    // the whole table).
    "ratio_to_report_priority" -> ((s, dir) => {
      val byP = orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(sum((d2(col("o_totalprice")) * 100).cast("long")).as("cents"))
      val total = byP.agg(sum(col("cents")).as("total_cents"))
      byP.crossJoin(broadcast(total))
        .select(col("o_orderpriority"), col("cents"),
          expr("(1000 * cents) div total_cents").as("share_permille"))
        .orderBy(col("o_orderpriority"))
    }),

    // Exact weighted mean: quantity-weighted average unit price per
    // return flag — numerator and denominator as exact decimal/long
    // sums, ONE correctly-rounded division at the edge (the only
    // double), so the result is bit-portable.
    "weighted_avg_price" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          sum((d2(col("l_extendedprice")) * 100).cast("long") *
            col("l_quantity").cast("long")).as("wsum_cents"),
          sum(col("l_quantity").cast("long")).as("wtotal"))
        .withColumn("wavg_cents",
          (col("wsum_cents").cast("double") / col("wtotal")).as("wavg_cents"))
        .orderBy(col("l_returnflag"))
    }),

    // Rolling active users — distinct users in the trailing 4 ISO weeks,
    // per week: the sliding-window DISTINCT that a frame spec can't
    // express (distinct doesn't decompose over frames). Relational form:
    // the distinct (user, week) table fans out to the <=4 window-ends
    // each activity week feeds (explode over a 4-element sequence — a
    // constant fan-out, not a self-join), then one exact countDistinct
    // keyed by week. Phantom weeks past the data's horizon are dropped
    // by a semi join against the observed weeks.
    "rolling_active_users" -> ((s, dir) => {
      val uw = events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      val weeks = uw.select(col("w")).distinct()
      uw.select(col("user_id"), explode(sequence(lit(0), lit(3))).as("k"),
          col("w"))
        .select(col("user_id"),
          expr("w + k * interval '7' day").as("week_end"))
        .join(weeks.select(col("w").as("week_end")), Seq("week_end"),
          "left_semi")
        .groupBy(col("week_end"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .select(tsUs(col("week_end")).as("week_us"), col("active_users"))
        .orderBy(col("week_us"))
    }),

    // Incremental view maintenance: a materialized monthly aggregate is
    // kept current by MERGING the delta batch's partial aggregate into
    // the base — sum/count partials re-aggregate by key, so the merged
    // view is value-identical to a full recompute (which is exactly what
    // the oracle does). At 100 TB the nightly delta touches one day of
    // data instead of re-scanning the fact table; same shape for any
    // algebraic aggregate (sum/count/min/max), exact long cents here.
    "ivm_monthly_revenue" -> ((s, dir) => {
      val cutoff = to_timestamp(lit("1997-01-01"))
      val o = orders(s, dir).select(
        tsUs(date_trunc("month", col("o_orderdate"))).as("month_us"),
        (d2(col("o_totalprice")) * 100).cast("long").as("cents"),
        col("o_orderdate"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("month_us"))
          .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      val base = partial(o.filter(col("o_orderdate") < cutoff))
      val delta = partial(o.filter(col("o_orderdate") >= cutoff))
      base.unionByName(delta)
        .groupBy(col("month_us"))
        .agg(sum(col("n_orders")).as("n_orders"), sum(col("cents")).as("cents"))
        .orderBy(col("month_us"))
    }),

    // FULL OUTER reconciliation (§2.3 completeness — the one join type
    // the diff operators' anti/semi forms don't exercise): per-customer
    // order counts from two disjoint order slices, keeping customers
    // present in either side; the join coalesces the key, missing sides
    // count 0. One shuffle per pre-aggregate + the key-coalesced join.
    "full_outer_reconcile" -> ((s, dir) => {
      val o = orders(s, dir)
      val a = o.filter(col("o_orderkey") % 2 === 0)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_even"))
      val b = o.filter(col("o_orderkey") % 2 === 1)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_odd"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_even"), lit(0L)).as("n_even"),
          coalesce(col("n_odd"), lit(0L)).as("n_odd"))
        .withColumn("delta", col("n_even") - col("n_odd"))
        .orderBy(col("o_custkey"))
    }),

    // Anti-entropy table checksum — the distributed mirror-validation
    // primitive (the reference trusts truncate-and-load; a checksum
    // catches silent divergence without moving rows): each row renders
    // to a canonical string (explicit decimal/timestamp formatting — no
    // engine-dependent double/date rendering), md5's first 10 hex digits
    // become an int < 2^40, and the per-group SUM is order- and
    // partition-independent. int64 headroom to ~8M rows per group; a
    // 100 TB run lifts the sum to decimal(38,0) — same shape, one cast.
    // One map-side pass + one tiny grouped aggregate; mirrors compare
    // (n_rows, checksum) per group instead of shipping data.
    "mirror_checksum" -> ((s, dir) => {
      val rowStr = concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        d2(col("o_totalprice")).cast("string"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"),
        col("o_orderpriority"))
      orders(s, dir)
        .select(col("o_orderstatus"),
          conv(substring(md5(rowStr), 1, 10), 16, 10).cast("long").as("rh"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), sum(col("rh")).as("checksum"))
        .orderBy(col("o_orderstatus"))
    }),

    // Hierarchical (Merkle-style) range checksums — the NARROWING step
    // between mirror_checksum's "something differs" and mirror_quorum's
    // repair: the key space folds into fixed-width ranges (key div 4096)
    // with a per-range rolling checksum, plus one root row (level 0)
    // over everything. Two replicas exchange the root; on mismatch they
    // exchange the range level and re-sync ONLY the ranges that differ
    // — bytes shipped scale with divergence, not table size. Both
    // levels come from the same canonical row hash in ONE scan (the
    // range aggregate re-aggregates into the root — partial-agg merge,
    // no second pass); per-group SUM keeps every checksum order- and
    // partition-independent.
    "mirror_merkle" -> ((s, dir) => {
      val rowStr = concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        d2(col("o_totalprice")).cast("string"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"),
        col("o_orderpriority"))
      val ranges = orders(s, dir)
        .select(expr("o_orderkey div 4096").as("range_id"),
          conv(substring(md5(rowStr), 1, 10), 16, 10).cast("long").as("rh"))
        .groupBy(col("range_id"))
        .agg(count(lit(1)).as("n_rows"), sum(col("rh")).as("checksum"))
      ranges.select(lit(1L).as("level"), col("range_id"),
          col("n_rows"), col("checksum"))
        .unionByName(ranges.agg(sum(col("n_rows")).as("n_rows"),
            sum(col("checksum")).as("checksum"))
          .select(lit(0L).as("level"), lit(-1L).as("range_id"),
            col("n_rows"), col("checksum")))
        .orderBy(col("level"), col("range_id"))
    }),

    // 3-way quorum reconciliation — anti-entropy's REPAIR step next to
    // mirror_checksum's detection step: three replica mirrors (derived
    // deterministically — replica i corrupts o_orderstatus where a
    // keyed md5 digit fires, ~1/8 of rows each, independent per
    // replica) vote per key. Vote counts can only be {3}, {2,1} or
    // {1,1,1}: all_agree / majority-repairable / conflict. The
    // resolved-value checksum (mirror_checksum's rendering) proves
    // WHAT the repair converges to without shipping any rows. Shape:
    // one union of three map-side projections, two key-grouped hash
    // aggregates, a 3-row result.
    "mirror_quorum" -> ((s, dir) => {
      val base = orders(s, dir).select(col("o_orderkey"), col("o_orderstatus"))
      val reps = (0 to 2).map { i =>
        base.select(col("o_orderkey"),
          when(graft.functions.TextFns.hexVal(
            substring(md5(concat_ws("#", col("o_orderkey"), lit(i))), 1, 1)) < 2,
            concat(col("o_orderstatus"), lit(s"_X$i")))
            .otherwise(col("o_orderstatus")).as("v"))
      }.reduce(_ unionByName _)
      val votes = reps.groupBy(col("o_orderkey"), col("v"))
        .agg(count(lit(1)).as("n"))
      votes.groupBy(col("o_orderkey"))
        // argmax by (votes, value) — deterministic even in the
        // all-distinct conflict case (where the winner is unused)
        .agg(max(struct(col("n"), col("v"))).as("t"))
        .select(col("o_orderkey"), col("t.n").as("n_top"), col("t.v").as("v_top"))
        .withColumn("class",
          when(col("n_top") === 3, "all_agree")
            .when(col("n_top") === 2, "majority")
            .otherwise("conflict"))
        .withColumn("rh",
          when(col("n_top") >= 2,
            conv(substring(md5(concat_ws("|", col("o_orderkey"), col("v_top"))),
              1, 10), 16, 10).cast("long"))
            .otherwise(0L))
        .groupBy(col("class"))
        .agg(count(lit(1)).as("n_keys"), sum(col("rh")).as("resolved_checksum"))
        .orderBy(col("class"))
    }),

    // Exact proportional allocation (largest-remainder method): split a
    // fixed integer budget across segments proportionally to revenue so
    // the rounded parts sum EXACTLY to the budget — floor quotas, then
    // +1 to the largest remainders until the shortfall is spent. The
    // only window runs over the segment alphabet (bounded, never data-
    // sized); the two scalar aggregates broadcast. decimal(38,0) quota
    // math so a 100 TB revenue total times the budget cannot wrap.
    "allocate_budget" -> ((s, dir) => {
      val B = 1000000L
      // persisted: the per-segment aggregate (a fact-table join + agg)
      // feeds the total, the floor allocation, and the largest-remainder
      // pass (ScanAudit: orders x4, customer x4)
      val seg = orders(s, dir)
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum((d2(col("o_totalprice")) * 100).cast("long")).as("cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = seg.agg(sum(col("cents")).as("total"))
      val f = seg.crossJoin(broadcast(tot))
        .withColumn("alloc_floor",
          expr(s"(CAST($B AS DECIMAL(38,0)) * cents) div total"))
        .withColumn("rem",
          expr(s"CAST((CAST($B AS DECIMAL(38,0)) * cents) % total AS BIGINT)"))
      val short = f.agg((lit(B) - sum(col("alloc_floor"))).as("short"))
      f.crossJoin(broadcast(short))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("c_mktsegment"))))
        .select(col("c_mktsegment"), col("cents"),
          (col("alloc_floor") +
            when(col("rk") <= col("short"), 1L).otherwise(0L)).as("alloc"))
        .orderBy(col("c_mktsegment"))
    }),

    // Association mining over user behavior: for every event-type pair,
    // how many users did both, and the lift vs independence as exact
    // integer permille — lift = P(a,b) / (P(a)P(b)) cross-multiplied to
    // (1000 * n_ab * n_users) div (n_a * n_b), no doubles. Dataflow: one
    // distinct (user, type) projection, a self-join keyed by user_id
    // (per-user fan-out is bounded by the type-alphabet, C(|T|,2) pairs
    // max — never quadratic in events), then a pair-keyed aggregate with
    // the tiny per-type totals broadcast back. int64 headroom: n_ab and
    // n_users below ~3e9 keep the cross product under 2^63.
    "event_cooccurrence" -> ((s, dir) => {
      // persisted: the distinct (user, type) table feeds the self-join's
      // BOTH sides, the per-type totals, and the user count (ScanAudit:
      // events x5 — four distinct shuffles over the fact table otherwise)
      val ut = events(s, dir).select(col("user_id"), col("event_type"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = ut.as("x")
        .join(ut.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .select(col("x.event_type").as("a"), col("y.event_type").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      val totals = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val nUsers = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      pairs
        .join(broadcast(totals.select(col("event_type").as("a"),
          col("n").as("n_a"))), Seq("a"))
        .join(broadcast(totals.select(col("event_type").as("b"),
          col("n").as("n_b"))), Seq("b"))
        .crossJoin(broadcast(nUsers))
        .select(col("a"), col("b"), col("n_ab"),
          expr("(1000 * n_ab * n_users) div (n_a * n_b)").as("lift_permille"))
        .orderBy(col("a"), col("b"))
    })
  )

  private val cooccurrenceSql =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events),
      |pairs AS (
      |  SELECT x.event_type AS a, y.event_type AS b,
      |    CAST(count(*) AS BIGINT) AS n_ab
      |  FROM ut x JOIN ut y ON x.user_id = y.user_id
      |    AND x.event_type < y.event_type
      |  GROUP BY x.event_type, y.event_type),
      |totals AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM ut GROUP BY event_type),
      |u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut)
      |SELECT p.a, p.b, p.n_ab,
      |  (1000 * p.n_ab * u.n_users) // (ta.n * tb.n) AS lift_permille
      |FROM pairs p
      |JOIN totals ta ON ta.event_type = p.a
      |JOIN totals tb ON tb.event_type = p.b
      |CROSS JOIN u
      |ORDER BY p.a, p.b""".stripMargin

  /** hex digit b (1-based) of md5 string m as its integer value —
    * DuckDB-side twin of Spark's conv(); mirrors TextDedup.hexValSql.
    */
  private def hexDigitSql(m: String, b: Int) =
    s"(CASE WHEN ascii(substr($m, $b, 1)) >= 97 THEN ascii(substr($m, $b, 1)) - 87 ELSE ascii(substr($m, $b, 1)) - 48 END)"

  private val checksumSql = {
    val digits = (1 to 10)
      .map(b => s"CAST(${hexDigitSql("h", b)} AS BIGINT) * ${1L << (4 * (10 - b))}")
      .mkString(" +\n      ")
    s"""WITH r AS (
       |  SELECT o_orderstatus,
       |    md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
       |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
       |      strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)) AS h
       |  FROM orders),
       |v AS (
       |  SELECT o_orderstatus, CAST(
       |      $digits
       |    AS BIGINT) AS rh
       |  FROM r)
       |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(rh) AS BIGINT) AS checksum
       |FROM v GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  private val merkleSql = {
    val digits = (1 to 10)
      .map(b => s"CAST(${hexDigitSql("h", b)} AS BIGINT) * ${1L << (4 * (10 - b))}")
      .mkString(" +\n      ")
    s"""WITH r AS (
       |  SELECT o_orderkey // 4096 AS range_id,
       |    md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
       |      CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
       |      strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)) AS h
       |  FROM orders),
       |v AS (SELECT range_id, CAST(
       |      $digits
       |    AS BIGINT) AS rh FROM r),
       |g AS (SELECT range_id, CAST(count(*) AS BIGINT) AS n_rows,
       |        CAST(sum(rh) AS BIGINT) AS checksum
       |      FROM v GROUP BY range_id)
       |SELECT CAST(1 AS BIGINT) AS level, CAST(range_id AS BIGINT) AS range_id,
       |  n_rows, checksum FROM g
       |UNION ALL
       |SELECT CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
       |  CAST(sum(n_rows) AS BIGINT), CAST(sum(checksum) AS BIGINT) FROM g
       |ORDER BY level, range_id""".stripMargin
  }

  private val quorumSql = {
    val digits = (1 to 10)
      .map(b => s"CAST(${hexDigitSql("h", b)} AS BIGINT) * ${1L << (4 * (10 - b))}")
      .mkString(" +\n      ")
    def rep(i: Int) =
      s"SELECT o_orderkey, CASE WHEN ${hexDigitSql(s"md5(concat_ws('#', o_orderkey, $i))", 1)} < 2 " +
        s"THEN o_orderstatus || '_X$i' ELSE o_orderstatus END AS v FROM orders"
    s"""WITH reps AS (
       |  ${rep(0)}
       |  UNION ALL ${rep(1)}
       |  UNION ALL ${rep(2)}),
       |votes AS (
       |  SELECT o_orderkey, v, count(*) AS n FROM reps GROUP BY o_orderkey, v),
       |top AS (
       |  SELECT o_orderkey, n AS n_top, v AS v_top FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY n DESC, v DESC) AS rk
       |    FROM votes) WHERE rk = 1),
       |cls AS (
       |  SELECT
       |    CASE WHEN n_top = 3 THEN 'all_agree'
       |         WHEN n_top = 2 THEN 'majority' ELSE 'conflict' END AS class,
       |    CASE WHEN n_top >= 2
       |         THEN md5(concat_ws('|', o_orderkey, v_top)) END AS h
       |  FROM top),
       |v2 AS (
       |  SELECT class,
       |    CASE WHEN h IS NULL THEN 0 ELSE CAST(
       |      $digits
       |    AS BIGINT) END AS rh
       |  FROM cls)
       |SELECT class, count(*) AS n_keys, CAST(sum(rh) AS BIGINT) AS resolved_checksum
       |FROM v2 GROUP BY class ORDER BY class""".stripMargin
  }

  def oracles: Map[String, String] = Map(

    "weighted_median_price" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |g AS (SELECT l_returnflag, cents, CAST(SUM(w) AS BIGINT) AS gw
        |      FROM li GROUP BY 1, 2),
        |t AS (SELECT l_returnflag, CAST(SUM(w) AS BIGINT) AS total_weight
        |      FROM li GROUP BY 1),
        |c AS (SELECT l_returnflag, cents,
        |        CAST(SUM(gw) OVER (PARTITION BY l_returnflag ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum
        |      FROM g)
        |SELECT c.l_returnflag, CAST(MIN(cents) AS BIGINT) AS median_cents,
        |  total_weight
        |FROM c JOIN t ON c.l_returnflag = t.l_returnflag
        |WHERE cum * 2 >= total_weight
        |GROUP BY c.l_returnflag, total_weight
        |ORDER BY c.l_returnflag""".stripMargin,

    "winsorized_mean_price" ->
      """WITH o AS (
        |  SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |g AS (SELECT o_orderpriority, cents, COUNT(*) AS gn
        |      FROM o GROUP BY 1, 2),
        |t AS (SELECT o_orderpriority, COUNT(*) AS n FROM o GROUP BY 1),
        |c AS (SELECT g.o_orderpriority, cents, gn, n,
        |        SUM(gn) OVER (PARTITION BY g.o_orderpriority ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM g JOIN t ON g.o_orderpriority = t.o_orderpriority),
        |lo AS (SELECT o_orderpriority, MIN(cents) AS p05 FROM c
        |       WHERE cum * 20 >= n GROUP BY 1),
        |hi AS (SELECT o_orderpriority, MIN(cents) AS p95 FROM c
        |       WHERE cum * 20 >= n * 19 GROUP BY 1)
        |SELECT g.o_orderpriority, p05, p95,
        |  CAST(SUM(gn) AS BIGINT) AS n,
        |  CAST(SUM(gn * LEAST(GREATEST(cents, p05), p95)) AS BIGINT)
        |    AS wsum_cents,
        |  CAST(SUM(gn * LEAST(GREATEST(cents, p05), p95)) // SUM(gn)
        |    AS BIGINT) AS wmean_cents
        |FROM g
        |JOIN lo ON g.o_orderpriority = lo.o_orderpriority
        |JOIN hi ON g.o_orderpriority = hi.o_orderpriority
        |GROUP BY 1, 2, 3
        |ORDER BY 1""".stripMargin,

    "mirror_quorum" -> quorumSql,

    "allocate_budget" ->
      """WITH seg AS (
        |  SELECT c_mktsegment,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM seg),
        |f AS (SELECT c_mktsegment, cents,
        |    CAST((1000000 * CAST(cents AS HUGEINT)) // total AS BIGINT) AS alloc_floor,
        |    CAST((1000000 * CAST(cents AS HUGEINT)) % total AS BIGINT) AS rem
        |  FROM seg, t),
        |s AS (SELECT CAST(1000000 - sum(alloc_floor) AS BIGINT) AS short FROM f),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, c_mktsegment) AS rk FROM f)
        |SELECT c_mktsegment, cents,
        |  CAST(alloc_floor + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r, s ORDER BY c_mktsegment""".stripMargin,

    "event_cooccurrence" -> cooccurrenceSql,

    "mirror_checksum" -> checksumSql,

    "mirror_merkle" -> merkleSql,

    "skyline_parts" ->
      """WITH pts AS (
        |  SELECT p_partkey,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_cents,
        |    CAST(p_size AS BIGINT) AS p_size
        |  FROM part)
        |SELECT p_partkey, price_cents, p_size FROM pts q
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts p
        |  WHERE p.price_cents <= q.price_cents AND p.p_size >= q.p_size
        |    AND (p.price_cents < q.price_cents OR p.p_size > q.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "ratio_to_report_priority" ->
      """WITH byp AS (
        |  SELECT o_orderpriority,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY o_orderpriority),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM byp)
        |SELECT o_orderpriority, cents,
        |  (1000 * cents) // total_cents AS share_permille
        |FROM byp, t ORDER BY o_orderpriority""".stripMargin,

    "weighted_avg_price" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    * CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum_cents,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wtotal,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    * CAST(l_quantity AS BIGINT)) AS DOUBLE) / sum(CAST(l_quantity AS BIGINT))
        |    AS wavg_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "rolling_active_users" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
        |weeks AS (SELECT DISTINCT w FROM uw),
        |fan AS (
        |  SELECT uw.user_id, uw.w + k * INTERVAL 7 DAY AS week_end
        |  FROM uw, UNNEST([0, 1, 2, 3]) AS t(k))
        |SELECT epoch_us(week_end) AS week_us,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM fan
        |WHERE week_end IN (SELECT w FROM weeks)
        |GROUP BY week_end ORDER BY week_us""".stripMargin,

    // full recompute — the IVM merge must be value-identical to this
    "ivm_monthly_revenue" ->
      """SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM orders GROUP BY month_us ORDER BY month_us""".stripMargin,

    "full_outer_reconcile" ->
      """WITH a AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_even
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey),
        |b AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_odd
        |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_custkey)
        |SELECT o_custkey,
        |  coalesce(n_even, 0) AS n_even, coalesce(n_odd, 0) AS n_odd,
        |  coalesce(n_even, 0) - coalesce(n_odd, 0) AS delta
        |FROM a FULL JOIN b USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "unpivot_orders" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS sum_cents,
        |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_open
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, metric, value FROM (
        |  SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value
        |  FROM wide
        |  UNION ALL
        |  SELECT o_orderpriority, 'sum_cents', sum_cents FROM wide
        |  UNION ALL
        |  SELECT o_orderpriority, 'n_open', n_open FROM wide)
        |ORDER BY o_orderpriority, metric""".stripMargin,

    "mode_event_cents" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY event_type, cents)
        |SELECT event_type, n AS n_mode, cents AS mode_cents FROM (
        |  SELECT event_type, cents, n, row_number() OVER (
        |    PARTITION BY event_type ORDER BY n DESC, cents) AS rn
        |  FROM c)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "sql_exists_customers" ->
      """SELECT c.c_custkey, c.c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c.c_custkey""".stripMargin,

    "price_record_lows" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate,
         |    CAST(min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS BIGINT) AS min_cents
         |  FROM orders GROUP BY o_orderdate),
         |f AS (
         |  SELECT o_orderdate, min_cents,
         |    coalesce(min(min_cents) OVER (ORDER BY o_orderdate
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      ${NO_PRIOR}) AS prior_low
         |  FROM daily)
         |SELECT epoch_us(o_orderdate) AS date_us, min_cents FROM f
         |WHERE min_cents < prior_low ORDER BY date_us""".stripMargin
  )
}
