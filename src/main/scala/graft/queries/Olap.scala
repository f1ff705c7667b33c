package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import Util._

/** Classic multi-join OLAP surface (SURVEY §2.3 J8 / §2.4 A5 widened):
  * the TPC-H-shaped reporting queries expressible over the trimmed
  * synthetic schema (no partsupp / shipmode / container columns), each
  * chosen to exercise a distinct plan shape at scale:
  *
  *  - q7:  two-dimension-role join (the same nation dim joined twice
  *         under different roles) with a disjunctive cross-dim predicate
  *         — the dims are pre-filtered to the two-nation set BEFORE the
  *         fact join, so the fact side shrinks at the scan, not at the
  *         end.
  *  - q8:  market-share ratio — semi-join reductions (region-filtered
  *         customers, type-filtered parts) prune the fact rows before
  *         the one wide join; the share itself is exact integer permille.
  *  - q10: revenue-ranked top-k over a filtered fact join →
  *         TakeOrderedAndProject, never a global sort.
  *  - q14: conditional-share aggregate (promo revenue) — one pass, the
  *         CASE rides inside the same partial aggregate.
  *  - q19: disjunction of (brand, size, quantity) triples — the
  *         OR-of-conjuncts predicate that punishes engines which can't
  *         keep selective disjunctions next to the join.
  *
  * All money math follows the determinism toolkit: exact decimal/long
  * units internally, one cast to double (or an integer permille) at the
  * output edge, total-order sorts.
  */
object Olap {

  /** Revenue term in exact 10^-4 units (price scale 2 x discount scale 2). */
  private def revU(price: org.apache.spark.sql.Column,
                   discount: org.apache.spark.sql.Column) =
    (d2(price) * (lit(1) - d2(discount)) * 10000).cast("long")

  def queries: Map[String, Q] = Map(

    // Q7-shape: bilateral shipping volume between two nations by year.
    // Both nation roles are filtered to the 2-nation set and broadcast
    // BEFORE touching the fact tables — the supplier/customer sides
    // arrive at the big join already reduced ~2/25, and the remaining
    // disjunctive pair predicate runs over 4 surviving combinations.
    "q7_volume_shipping" -> ((s, dir) => {
      val pairNations = Seq("NATION_1", "NATION_2")
      val n1 = nation(s, dir).filter(col("n_name").isin(pairNations: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = nation(s, dir).filter(col("n_name").isin(pairNations: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val supp = supplier(s, dir)
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = customer(s, dir)
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select(col("c_custkey"), col("cust_nation"))
      lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q8-shape: NATION_3 suppliers' share of PROMO-part revenue sold to
    // AMERICA-region customers, by order year, as exact integer
    // permille. The region and part filters become broadcast semi-joins
    // that prune the fact before the wide join; the supplier nation
    // rides in as a broadcast dim for the CASE.
    "q8_market_share" -> ((s, dir) => {
      val amNations = nation(s, dir)
        .join(broadcast(region(s, dir).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = customer(s, dir)
        .join(broadcast(amNations), col("c_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("c_custkey"))
      val promoParts = part(s, dir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val supp = supplier(s, dir)
        .join(broadcast(nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      lineitem(s, dir)
        .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .withColumn("rev_u", revU(col("l_extendedprice"), col("l_discount")))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", col("rev_u"))
          .otherwise(0L)).as("nat_u"),
          sum(col("rev_u")).as("tot_u"))
        // decimal(38,0) before the scale-up: 1000x a 100 TB revenue sum
        // must not wrap a long
        .select(col("o_year"),
          expr("(CAST(nat_u AS DECIMAL(38,0)) * 1000) div CAST(tot_u AS DECIMAL(38,0))")
            .as("mkt_share_permille"))
        .orderBy(col("o_year"))
    }),

    // Q10-shape: top 20 customers by revenue lost to returns in one
    // order year. orderBy+limit plans TakeOrderedAndProject — each
    // partition ships only its local top 20, never a global sort.
    "q10_returned_items" -> ((s, dir) => {
      val cust = customer(s, dir)
        .join(broadcast(nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .join(orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14-shape: promo-part revenue share by ship year — the CASE sum
    // and the total ride in ONE partial aggregate (no second pass, no
    // self-join), share emitted as exact integer permille.
    "q14_promo_revenue" -> ((s, dir) => {
      lineitem(s, dir)
        .join(broadcast(part(s, dir).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .withColumn("rev_u", revU(col("l_extendedprice"), col("l_discount")))
        .groupBy(year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev_u")).otherwise(0L))
          .as("promo_u"),
          sum(col("rev_u")).as("tot_u"))
        .select(col("l_year"),
          expr("(CAST(promo_u AS DECIMAL(38,0)) * 1000) div CAST(tot_u AS DECIMAL(38,0))")
            .as("promo_permille"),
          col("tot_u"))
        .orderBy(col("l_year"))
    }),

    // Q19-shape: revenue under a disjunction of (brand, size-range,
    // quantity-range) conjunct triples. The OR can't split across the
    // join, but the part side IS reducible: only the three brands'
    // rows survive the dim filter, so the broadcast carries 3/16 of
    // the part table and the fact-side residual runs codegen'd.
    "q19_disjunctive" -> ((s, dir) => {
      val p = part(s, dir)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
            col("l_quantity").between(20, 50)))
        .groupBy(col("p_brand"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // Q6-shape: the forecasting-revenue-change scan — a pure
    // filter+aggregate with NO join at all, the canonical predicate-
    // pushdown probe: all three filters must reach the parquet scan
    // (PushedFilters) and the whole query is one codegen'd pass.
    // Discount compared in exact integer percent (5..7), quantity in
    // longs; the discount-revenue sum is exact decimal, one cast out.
    "q6_forecast_revenue" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          (d2(col("l_discount")) * 100).cast("long").between(5, 7) &&
          col("l_quantity").cast("long") < 24)
        .agg(sum(d2(col("l_extendedprice")) * d2(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Q13-shape: customer order-count distribution. The orders side is
    // pre-aggregated to (custkey, count) BEFORE meeting customers — the
    // outer join then carries one row per customer, not one per order —
    // and customers with zero qualifying orders surface as c_count=0
    // through the left join (the distribution's head). Two shuffles
    // total (orders by custkey, counts by c_count); both key spaces
    // shrink monotonically, so the shape is scale-stable.
    "q13_order_distribution" -> ((s, dir) => {
      val perCust = orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      customer(s, dir).select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q15-shape: top supplier(s) by quarterly revenue — the argmax-
    // against-a-scalar pattern: per-supplier revenue in exact 10^-4
    // units, the 1-row max broadcast back over the aggregate (never a
    // global sort), ties kept by exact long equality. The supplier dim
    // arrives broadcast for the name lookup after the argmax filter,
    // when only the winners remain.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .withColumn("rev_u", revU(col("l_extendedprice"), col("l_discount")))
        .groupBy(col("l_suppkey")).agg(sum(col("rev_u")).as("total_u"))
      val mx = rev.agg(max(col("total_u")).as("mx_u"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_u") === col("mx_u"))
        .join(broadcast(supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("total_u").cast("double") / 10000).as("total_rev"))
        .orderBy(col("s_suppkey"))
    }),

    // Q17-shape: small-quantity-order revenue for one brand. The
    // correlated "below 20% of this part's average quantity" becomes a
    // per-part aggregate joined back to the fact on the SAME key — both
    // sides shuffle on l_partkey once and co-partition, no window, no
    // second scan of the unfiltered fact (the brand broadcast prunes
    // first). avg comparison is exact: qty < sum/(5n) ⇔ qty·5·n < sum
    // in longs — no division ever happens.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val brandParts = part(s, dir).filter(col("p_brand") === "Brand#2")
        .select(col("p_partkey"))
      val li = lineitem(s, dir)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
          (d2(col("l_extendedprice")) * 100).cast("long").as("cents"))
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"))
      li.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("qty") * 5 * col("n") < col("sum_qty"))
        .agg(sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_items"))
        .select((col("sum_cents").cast("double") / 700).as("avg_yearly"),
          col("sum_cents"), col("n_items"))
    }),

    // Q18-shape: large-volume orders. HAVING sum(qty) > 150 reduces on
    // the fact's own grouping key (map-side combinable), the surviving
    // order keys join back as a SEMI filter, and the top-100 plans
    // TakeOrderedAndProject — each partition ships only its local 100.
    "q18_large_orders" -> ((s, dir) => {
      val big = lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(customer(s, dir).select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q22-shape: wealthy inactive customers. The "above the average
    // positive balance" scalar rides as an exact integer cross-predicate
    // (cents·n > sum_cents — no division, no double), broadcast from a
    // 1-row aggregate; "inactive" is an anti-join against the urgent-
    // order feed (this synthetic's every customer HAS orders, so the
    // reference's no-orders-at-all gate is re-aimed at no-URGENT-orders
    // to keep the anti-join load-bearing). cents ~1e6 · n ~1e10 at
    // 100 TB stays well under 2^63.
    "q22_inactive_customers" -> ((s, dir) => {
      val stats = customer(s, dir).filter(col("c_acctbal") > 0)
        .agg(sum((d2(col("c_acctbal")) * 100).cast("long")).as("sum_cents"),
          count(lit(1)).as("n"))
      val urgent = orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      customer(s, dir)
        .filter(col("c_nationkey").between(1, 10))
        .crossJoin(broadcast(stats))
        .filter((d2(col("c_acctbal")) * 100).cast("long") * col("n") >
          col("sum_cents"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(d2(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy(col("nationkey"))
    }),

    // Q16-shape: supplier variety per (brand, type, size). No partsupp
    // table, so the part-supplier relation derives from the observed
    // lineitem pairs (DISTINCT l_partkey, l_suppkey — same grain, one
    // map-side-combinable distinct); "complaint" suppliers (no comment
    // column) are re-aimed at negative account balance. The distinct
    // count groups on broadcast part attributes, so the only shuffle
    // after the derive is the 3-key aggregate.
    "q16_supplier_variety" -> ((s, dir) => {
      val ps = lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val bad = supplier(s, dir).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      val parts = part(s, dir)
        .filter(col("p_brand") =!= "Brand#5" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size").cast("long").as("p_size"))
      ps.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q21-shape: suppliers who soloed a late order — the double-
    // correlated EXISTS / NOT EXISTS optimizer stress test. l1 is the
    // late-lineitem feed (shipdate > orderdate + 90d, finished orders);
    // "some OTHER supplier in the same order" is a semi-join with a
    // non-equi suppkey disequality riding on the orderkey equi-key, and
    // "no OTHER supplier was late" is the same-shaped anti-join against
    // the late pairs. Both right sides are deduped to (order, supplier)
    // grain first — semi/anti joins never multiply, so the dedup only
    // bounds the join fan-out. Count stays at lineitem grain like the
    // reference query.
    "q21_sole_late_supplier" -> ((s, dir) => {
      val late = lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      val latePairs = late.select(col("l_orderkey").as("lo"),
        col("l_suppkey").as("ls")).distinct()
      val allPairs = lineitem(s, dir).select(col("l_orderkey").as("po"),
        col("l_suppkey").as("ps")).distinct()
      val natSupp = supplier(s, dir)
        .join(broadcast(nation(s, dir).filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      late.filter(col("o_orderstatus") === "F")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(allPairs, col("l_orderkey") === col("po") &&
          col("l_suppkey") =!= col("ps"), "left_semi")
        .join(latePairs, col("l_orderkey") === col("lo") &&
          col("l_suppkey") =!= col("ls"), "left_anti")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // §2.5 distribution windows: percent_rank + cume_dist per segment.
    // Both are a single int/int division per row (rank-1)/(n-1) and
    // rank/n — one correctly-rounded double each, bit-portable. The
    // (acctbal, custkey) order is tie-free, so cume_dist has no
    // peer-group ambiguity.
    "window_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    }),

    // ANALYZE-style column statistics in ONE aggregate pass — the
    // zone-map/optimizer-stats collector: min/max/ndv/null-count for
    // three lineitem columns computed together (Catalyst expands the
    // multi-distinct into one Expand + aggregate, still a single scan),
    // then reshaped to one row per column. Values leave in canonical
    // integer units (cents / epoch days) so the stats are engine-
    // portable.
    "table_stats" -> ((s, dir) => {
      val qty = col("l_quantity").cast("long")
      val cents = (d2(col("l_extendedprice")) * 100).cast("long")
      val day = datediff(col("l_shipdate"), lit("1970-01-01").cast("timestamp"))
        .cast("long")
      val a = lineitem(s, dir).agg(
        min(qty).as("qty_min"), max(qty).as("qty_max"),
        countDistinct(qty).as("qty_ndv"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("qty_nulls"),
        min(cents).as("price_min"), max(cents).as("price_max"),
        countDistinct(cents).as("price_ndv"),
        sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L)).as("price_nulls"),
        min(day).as("day_min"), max(day).as("day_max"),
        countDistinct(day).as("day_ndv"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("day_nulls"))
        // persisted: the three per-column report branches re-execute
        // this 1-row aggregate otherwise (ScanAudit: lineitem x3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Seq(("l_quantity", "qty"), ("l_extendedprice_cents", "price"),
        ("l_shipdate_day", "day"))
        .map { case (name, p) =>
          a.select(lit(name).as("col_name"), col(s"${p}_min").as("min_v"),
            col(s"${p}_max").as("max_v"), col(s"${p}_ndv").as("n_distinct"),
            col(s"${p}_nulls").as("n_nulls"))
        }
        .reduce(_ unionByName _)
        .orderBy(col("col_name"))
    }),

    // Z-order interleave — the multi-dimensional clustering key behind
    // data-skipping layouts: bit-interleave (partkey, suppkey) into one
    // locality-preserving long, then profile the coarse z-buckets (row
    // count + per-dimension key spread). A scan clustered by z serves
    // range predicates on EITHER dimension from few buckets — the
    // 100 TB pruning story the flat layouts can't give; pure map-side
    // bit arithmetic + one bucket-keyed aggregate.
    "zorder_layout" -> ((s, dir) => {
      val x = col("l_partkey") % 65536
      val y = col("l_suppkey") % 65536
      val z = (0 until 16).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
      lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"), z.as("zval"))
        .withColumn("z_bucket", expr("zval div 67108864"))
        .groupBy(col("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"))
        .orderBy(col("z_bucket"))
    }),

    // Equi-width histogram with data-driven bounds: one tiny min/max
    // aggregate broadcasts into a map-side bucket assignment — two scans,
    // zero shuffles before the 20-row result. All bucket math in exact
    // cent longs (ceil width, last bucket clamps the max), the same
    // overflow-safe shape as Skyline's decimal buckets.
    "histogram_prices" -> ((s, dir) => {
      val NB = 20
      val cents = (d2(col("o_totalprice")) * 100).cast("long")
      val stats = orders(s, dir).agg(min(cents).as("lo"), max(cents).as("hi"))
      orders(s, dir).select(cents.as("c"))
        .crossJoin(broadcast(stats))
        .withColumn("bucket",
          expr(s"least((c - lo) div greatest((hi - lo + $NB) div $NB, 1), ${NB - 1})"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("sum_cents"))
        .orderBy(col("bucket"))
    }),

    // Equi-depth (decile) histogram — the optimizer-statistics twin of
    // histogram_prices' equi-width buckets: boundaries are the nine
    // interior deciles, computed by Blocking.exactQuantiles (distinct-
    // cents counts + groupedPrefixSum + rank-interval interpolation,
    // bit-identical to the built-in Percentile) instead of one
    // percentile aggregate whose value→count buffer put the whole
    // distinct-cents domain through a single task (the round-11 6 s
    // organic dominator). Boundaries broadcast into a map-side bucket
    // assignment: bucket = how many boundaries sit strictly below the
    // value, so boundary ties deterministically fall to the lower
    // bucket on both engines. At 100 TB the exact side can still swap
    // to the sketch (approx_percentile, mergeable one-pass GK — the
    // oracle-bounded twin approx_percentile_orders pins that swap), but
    // the exact-distributed path no longer needs it.
    // The ENTIRE query factors through the distinct-cents counts table
    // (one fact scan, persisted): boundaries read the counts through
    // exactQuantilesFromCounts, and the per-bucket aggregates are the
    // count-weighted twins (sum(cnt), sum(c*cnt)) over the same table —
    // the fact side is never touched again after the first reduce.
    "histogram_equidepth" -> ((s, dir) => {
      val cents = (d2(col("o_totalprice")) * 100).cast("long")
      val counts = orders(s, dir).groupBy(cents.as("c"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      val bounds = graft.operators.Blocking.exactQuantilesFromCounts(
        counts, Nil, "c", "cnt", (1 to 9).map(_ / 10.0), qsName = "bs")
      counts.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          expr("cast(size(filter(bs, b -> c > b)) as bigint)"))
        .groupBy(col("bucket"))
        .agg(sum(col("cnt")).as("n_orders"), min(col("c")).as("min_cents"),
          max(col("c")).as("max_cents"),
          sum(col("c") * col("cnt")).as("sum_cents"))
        .orderBy(col("bucket"))
    }),

    // Q2-shape: groupwise-min "cheapest supplier per part" — the
    // correlated-scalar-subquery classic. Supply cost is adapted to the
    // trimmed schema (no partsupp) as each (part, supplier) pair's
    // minimum observed line price. The part filter broadcasts BEFORE
    // the fact aggregate so only LARGE-part lines reach the shuffle;
    // the per-part min is then a window over the ALREADY-REDUCED pair
    // frame (one row per part x supplier — dimension-product-sized, so
    // its re-shuffle is negligible next to the fact aggregate), not a
    // join-back that would rescan. Supplier + nation close over the
    // winners as broadcast dims. Cost stays decimal-exact to the edge.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val largeParts = part(s, dir).filter(col("p_type") === "LARGE")
        .select(col("p_partkey"))
      val pairCost = lineitem(s, dir)
        .join(broadcast(largeParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(d2(col("l_extendedprice"))).as("cost_d"))
      val w = Window.partitionBy(col("l_partkey"))
      pairCost
        .withColumn("min_cost_d", min(col("cost_d")).over(w))
        .filter(col("cost_d") === col("min_cost_d"))
        .join(broadcast(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("n_name"), col("cost_d").cast("double").as("min_cost"))
        .orderBy(col("p_partkey"), col("s_suppkey"))
    }),

    // Q9-shape: product-type profit by supplier nation and order year.
    // Profit adapts ps_supplycost to the trimmed schema as retailprice
    // x quantity. The LIKE filter prunes the part dim BEFORE it
    // broadcasts into the fact join (261/2000 parts at sf0.01), so the
    // fact side shrinks via the semi-ish inner broadcast join at the
    // scan edge; all money math is decimal until the final cast.
    "q9_product_profit" -> ((s, dir) => {
      val widgetParts = part(s, dir).filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supp = supplier(s, dir)
        .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      lineitem(s, dir)
        .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(d2(col("l_extendedprice")) * (lit(1) - d2(col("l_discount"))) -
          d2(col("p_retailprice")) * col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("profit"))
        .orderBy(col("n_name"), col("o_year"))
    }),

    // Q11-shape: "important stock" — per-part value filtered against a
    // fraction of the GLOBAL total (the scalar-subquery threshold).
    // Value adapts ps_supplycost x availqty to revenue shipped by
    // NATION_5 suppliers, in exact cent-quantity longs. The global
    // total is a one-row broadcast over the per-part aggregate (the
    // per-part frame is computed once and reused for both the total
    // and the filter — no second fact scan), and the comparison
    // happens in DECIMAL(38,0) so value*1000 can never wrap at 100 TB.
    "q11_important_stock" -> ((s, dir) => {
      val natSupp = supplier(s, dir)
        .join(broadcast(nation(s, dir).filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val perPart = lineitem(s, dir)
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum((d2(col("l_extendedprice")) * 100).cast("long") *
          col("l_quantity").cast("long")).as("value_u"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // TPC-H's q11 share threshold is 0.0001/SF — explicitly
      // scale-DEPENDENT, so a fixed fraction empties under scale-up
      // (the 10x gate passed on 0 rows). The scale-invariant form keeps
      // the gate meaningful at any corpus size: parts worth > 3x the
      // MEAN per-part stock value (value·nparts > 3·total, exact
      // integers; replication multiplies total and nparts equally).
      val total = perPart.agg(sum(col("value_u")).as("total_u"),
        count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(total))
        .filter(expr("CAST(value_u AS DECIMAL(38,0)) * n_parts > " +
          "CAST(total_u AS DECIMAL(38,0)) * 3"))
        .select(col("l_partkey"), col("value_u"))
        .orderBy(col("value_u").desc, col("l_partkey"))
    }),

    // Q12-shape: priority split by category — the join + conditional
    // two-way count. Ship mode doesn't exist in the trimmed schema, so
    // the category is l_returnflag; the CASE pair rides inside one
    // partial aggregate (a single fact pass, counts map-side combined),
    // and the date window prunes at the scan.
    "q12_priority_lines" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // Q20-shape: the nested-semi-join chain — suppliers who DOMINATED a
    // promo part's 1997 volume (pair share > 30% of the part's total,
    // adapting availqty > half-of-shipped to the trimmed schema), then
    // names for the EUROPE-region subset. Quantities stay integral
    // longs; the share test multiplies instead of divides (10*pair >
    // 3*total) so it's exact; each stage reduces before the next joins.
    "q20_dominant_suppliers" -> ((s, dir) => {
      val promoParts = part(s, dir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val promo97 = lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
      val pair = promo97.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("pair_qty"))
      val w = Window.partitionBy(col("l_partkey"))
      val dominant = pair
        .withColumn("part_qty", sum(col("pair_qty")).over(w))
        .filter(col("pair_qty") * 10 > col("part_qty") * 3)
        .select(col("l_suppkey")).distinct()
      val eurNations = nation(s, dir)
        .join(broadcast(region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      supplier(s, dir)
        .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH f AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS rev_u,
        |    n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE o_custkey IN (
        |      SELECT c_custkey FROM customer WHERE c_nationkey IN (
        |        SELECT n_nationkey FROM nation JOIN region
        |          ON n_regionkey = r_regionkey WHERE r_name = 'AMERICA'))
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO'))
        |SELECT o_year,
        |  CAST((1000 * CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_u ELSE 0 END) AS HUGEINT))
        |    // CAST(SUM(rev_u) AS HUGEINT) AS BIGINT) AS mkt_share_permille
        |FROM f GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q14_promo_revenue" ->
      """WITH f AS (
        |  SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) AS rev_u,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT l_year,
        |  CAST((1000 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) AS HUGEINT))
        |    // CAST(SUM(rev_u) AS HUGEINT) AS BIGINT) AS promo_permille,
        |  CAST(SUM(rev_u) AS BIGINT) AS tot_u
        |FROM f GROUP BY l_year ORDER BY l_year""".stripMargin,

    "q19_disjunctive" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 1 AND 15)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
        |    AND l_quantity BETWEEN 10 AND 30)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
        |    AND l_quantity BETWEEN 20 AND 50)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "table_stats" ->
      """WITH a AS (
        |  SELECT
        |    CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_min,
        |    CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_max,
        |    CAST(count(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_ndv,
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_nulls,
        |    CAST(min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS price_min,
        |    CAST(max(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS price_max,
        |    CAST(count(DISTINCT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS price_ndv,
        |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS price_nulls,
        |    CAST(min(date_diff('day', TIMESTAMP '1970-01-01', l_shipdate)) AS BIGINT) AS day_min,
        |    CAST(max(date_diff('day', TIMESTAMP '1970-01-01', l_shipdate)) AS BIGINT) AS day_max,
        |    CAST(count(DISTINCT date_diff('day', TIMESTAMP '1970-01-01', l_shipdate)) AS BIGINT) AS day_ndv,
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS day_nulls
        |  FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_name, qty_min AS min_v, qty_max AS max_v,
        |    qty_ndv AS n_distinct, qty_nulls AS n_nulls FROM a
        |  UNION ALL SELECT 'l_extendedprice_cents', price_min, price_max,
        |    price_ndv, price_nulls FROM a
        |  UNION ALL SELECT 'l_shipdate_day', day_min, day_max,
        |    day_ndv, day_nulls FROM a)
        |ORDER BY col_name""".stripMargin,

    "zorder_layout" -> {
      val zTerms = (0 until 16).map(i =>
        s"((((l_partkey % 65536) >> $i) & 1) << ${2 * i}) + " +
          s"((((l_suppkey % 65536) >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH z AS (
         |  SELECT l_partkey, l_suppkey, ($zTerms) AS zval FROM lineitem)
         |SELECT zval // 67108864 AS z_bucket, count(*) AS n_rows,
         |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
         |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp
         |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
    },

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) BETWEEN 5 AND 7
        |  AND CAST(l_quantity AS BIGINT) < 24""".stripMargin,

    "q13_order_distribution" ->
      """WITH pc AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey)
        |SELECT COALESCE(n, 0) AS c_count, COUNT(*) AS custdist
        |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT))
        |      AS BIGINT) AS total_u
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_u AS DOUBLE) / 10000 AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_u = (SELECT max(total_u) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2')),
        |pp AS (
        |  SELECT l_partkey AS pk, CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |    COUNT(*) AS n
        |  FROM li GROUP BY 1)
        |SELECT CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 700 AS avg_yearly,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_items
        |FROM li JOIN pp ON l_partkey = pk
        |WHERE qty * 5 * n < sum_qty""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |    AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q22_inactive_customers" ->
      """WITH s AS (
        |  SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS sum_cents, COUNT(*) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, s
        |WHERE c_nationkey BETWEEN 1 AND 10
        |  AND CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * n > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_supplier_variety" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q21_sole_late_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey, o_orderstatus
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
        |WHERE l1.o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "window_percent_rank" ->
      """SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "histogram_prices" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |s AS (SELECT min(c) AS lo, max(c) AS hi FROM c)
        |SELECT least((c - lo) // greatest((hi - lo + 20) // 20, 1), 19) AS bucket,
        |  count(*) AS n_orders, CAST(sum(c) AS BIGINT) AS sum_cents
        |FROM c, s GROUP BY bucket ORDER BY bucket""".stripMargin,

    "histogram_equidepth" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |b AS (SELECT quantile_cont(c, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
        |      FROM c)
        |SELECT CAST(len(list_filter(bs, x -> c > x)) AS BIGINT) AS bucket,
        |  count(*) AS n_orders, CAST(min(c) AS BIGINT) AS min_cents,
        |  CAST(max(c) AS BIGINT) AS max_cents, CAST(sum(c) AS BIGINT) AS sum_cents
        |FROM c, b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH pair AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost_d
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'LARGE')
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, min(cost_d) OVER (PARTITION BY l_partkey) AS min_cost_d
        |  FROM pair)
        |SELECT l_partkey AS p_partkey, s_suppkey, s_name, n_name,
        |  CAST(cost_d AS DOUBLE) AS min_cost
        |FROM ranked
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE cost_d = min_cost_d
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_important_stock" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * CAST(l_quantity AS BIGINT)) AS value_u
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation
        |      ON s_nationkey = n_nationkey WHERE n_name = 'NATION_5')
        |  GROUP BY 1),
        |tot AS (SELECT SUM(value_u) AS total_u, COUNT(*) AS n_parts
        |        FROM per_part)
        |SELECT l_partkey, CAST(value_u AS BIGINT) AS value_u
        |FROM per_part, tot
        |WHERE CAST(value_u AS HUGEINT) * n_parts
        |    > CAST(total_u AS HUGEINT) * 3
        |ORDER BY value_u DESC, l_partkey""".stripMargin,

    "q12_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH promo97 AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')),
        |pair AS (
        |  SELECT l_partkey, l_suppkey, SUM(qty) AS pair_qty
        |  FROM promo97 GROUP BY 1, 2),
        |dominant AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT *, SUM(pair_qty) OVER (PARTITION BY l_partkey) AS part_qty
        |    FROM pair)
        |  WHERE pair_qty * 10 > part_qty * 3)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
        |ORDER BY s_suppkey""".stripMargin
  )
}
