package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the scale properties SURVEY §4 promises
  * (pushdown, pruning, broadcast dims, partial top-k) asserted against
  * the actual physical plans, so a refactor that silently loses one
  * fails fast. sf0.001 keeps planning cheap; shapes are SF-independent
  * except where AQE picks join strategies at runtime (asserted on the
  * initial static plan).
  */
class PlanShapeTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("clean_conform pushes filters and prunes columns at the scan") {
    val p = plan("clean_conform")
    assert(p.contains("PushedFilters: [IsNotNull(c_name), IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0)]"), p)
    // projection pruning: only the 4 kept source columns are read
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double,c_mktsegment:string>"), p)
  }

  test("q5_region_revenue broadcasts the dimension chain") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("topk_orders plans a partial top-k (TakeOrderedAndProject), not a full sort") {
    val p = plan("topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("mirror_apply anti-joins the mirror against broadcast touched keys") {
    // The MERGE scale contract: the mirror side is pruned by a BROADCAST
    // anti-join on the churn-sized key set — the snapshot itself is
    // never shuffled, so at 100 TB only churn-proportional data moves.
    // The change-set side is a join output whose size is unknown at plan
    // time, so the conversion is AQE's runtime call: execute, then
    // assert on the final adaptive plan.
    val df = SparkEntry.queries("mirror_apply")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert("BroadcastHashJoin[^\\n]*LeftAnti".r.findFirstIn(p).isDefined, p)
    assert(p.contains("Union"), p)
  }

  test("missing_orders is an anti join, not a filter over a full outer") {
    val p = plan("missing_orders")
    assert(p.contains("LeftAnti"), p)
  }

  test("topk_orders_per_cust pushes the rank filter into WindowGroupLimit") {
    // rnk <= 3 over a per-customer window must become a
    // WindowGroupLimit(Partial) BELOW the shuffle: each map task keeps
    // its local top-3 per customer, so the exchange carries at most
    // 3·customers·tasks rows instead of every order — the window twin
    // of partial aggregation, and the property that makes per-entity
    // top-k affordable on a 100 TB fact table.
    val p = plan("topk_orders_per_cust")
    assert(p.contains("WindowGroupLimit"), p)
    // Match "Partial" ADJACENT to the WindowGroupLimit node: a bare
    // contains("Partial") passes vacuously on any partial HashAggregate
    // elsewhere in the plan, hiding a regression to Final-only mode.
    assert("WindowGroupLimit[^\\n]*Partial".r.findFirstIn(p).isDefined, p)
  }

  test("q1_pricing_summary partially aggregates before the shuffle") {
    val p = plan("q1_pricing_summary")
    // map-side partial agg: two HashAggregates around one Exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("ann_bruteforce_top5 pre-reduces top-k per partition, no full-shuffle ranking window") {
    val p = plan("ann_bruteforce_top5")
    // bounded TopKAgg: partial ObjectHashAggregate on the map side, final
    // after the exchange — the shuffle carries <= k rows per query per
    // partition instead of every scored candidate
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
  }

  test("decontaminate broadcasts the eval shingle set; corpus side never shuffles by shingle") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    // no sort-merge join: a SMJ would mean the corpus was exchanged on
    // the shingle key — the skew/scale failure the operator avoids.
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup_minhash_lsh materializes the inverted index once (cache, not re-scan)") {
    val p = plan("dedup_minhash_lsh")
    // signatures + verify sides + set sizes all read the persisted
    // shingle index; without it the corpus is re-scanned per consumer.
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("heavy_hitters_mg builds map-side partial sketches (bounded shuffle), no token exchange for the sketch") {
    val p = plan("heavy_hitters_mg")
    // the MG Aggregator must partially aggregate per partition so the
    // exchange carries <= k counters per partition, not the token stream
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
    // survivor-set join against the k-row sketch stays broadcast
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("mad_outliers broadcasts the per-type stats, never shuffles raw rows for the join") {
    val p = plan("mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pagerank_bipartite aggregates contributions partially before each shuffle") {
    val p = plan("pagerank_bipartite")
    assert(p.contains("partial_"), p)
    // final ranking is a bounded top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("scd2_intervals shuffles once by the natural key, top-level sort only at the edge") {
    val p = plan("scd2_intervals")
    // both window passes and the grouping key off user_id: no exchange
    // other than the user_id hash partitioning + the final total order
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n$p")
  }

  test("unpivot_orders is one hash aggregate plus a local Expand — no metric-axis shuffle") {
    val p = plan("unpivot_orders")
    assert(p.contains("Expand"), p)
    // the only exchanges: the priority-keyed agg + the final total order
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges\n$p")
  }

  test("mode_event_cents is two hash aggregates, no ranking window") {
    val p = plan("mode_event_cents")
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_"), p)
  }

  test("ann_pq_adc_top3 scores code lookups against a broadcast ADC table, top-k pre-reduced") {
    val p = plan("ann_pq_adc_top3")
    // the scoring join is broadcast (codes never shuffle by q_vec)...
    assert(p.contains("BroadcastHashJoin"), p)
    // ...and the final reduction is the bounded TopKAgg, not a window
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("ann_ivfpq_top3 scores via broadcast ADC + code tables, top-k pre-reduced") {
    val p = plan("ann_ivfpq_top3")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("sql_exists_customers decorrelates EXISTS/NOT EXISTS into semi + anti joins") {
    val p = plan("sql_exists_customers")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("dotQ similarity kernel is the native expression, computed pre-join where possible") {
    val p = plan("embed_near_dup")
    // the custom expression (not the HOF formulation) is in the plan, and
    // norms are projected per side BEFORE the pair join (codegen fusion
    // itself is pinned by DotProductQTest on an executed plan)
    assert(p.contains("graft_dotq"), p)
    assert(p.contains("SQRT(cast(graft_dotq"), p)
  }

  test("q10_returned_items ships per-partition top-20, never a global sort") {
    val p = plan("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the nation dim rides in broadcast, the returnflag filter reaches
    // the lineitem scan
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q8_market_share prunes the fact through broadcast semi joins") {
    val p = plan("q8_market_share")
    // both reductions (PROMO parts, AMERICA customers) must be
    // broadcast LeftSemi — the fact side is never shuffled to be pruned
    assert("BroadcastHashJoin[^\\n]*LeftSemi".r.findAllIn(p).size >= 2, p)
  }

  test("q7_volume_shipping filters both nation roles before the fact join") {
    val p = plan("q7_volume_shipping")
    // the 2-nation filter lands on the nation dim scans (pushed), not
    // as a post-join residual over the full fact output
    assert("PushedFilters: \\[[^\\]]*In\\(n_name".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("histogram_prices broadcasts the 1-row bounds — no pre-agg shuffle") {
    val p = plan("histogram_prices")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("histogram_equidepth has no percentile buffer over fact-scale input") {
    // The exact deciles come from distinct-value counts + grouped
    // prefix sums (Blocking.exactQuantilesFromCounts) — a `percentile`
    // aggregate here would put the whole distinct-cents domain through
    // one task's value→count buffer at 100 TB.
    val p = plan("histogram_equidepth")
    assert(!p.toLowerCase.contains("percentile"), p)
    assert(p.contains("InMemoryTableScan"), p) // counts table built once
  }

  test("q6_forecast_revenue pushes all three filters to the scan, zero joins") {
    val p = plan("q6_forecast_revenue")
    // shipdate range must prune at the parquet scan. The plan printer
    // truncates long filter lists at a fixed width, and the truncation
    // point shifts with attribute-id width — so accept the range
    // predicate in EITHER of the scan line's two spellings (DataFilters
    // infix / PushedFilters prefix), whichever survived truncation.
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    val scanLine = p.split("\n").filter(_.contains("FileScan")).mkString
    assert("GreaterThanOrEqual\\(l_shipda".r.findFirstIn(scanLine).isDefined ||
      "l_shipdate#\\d+ >= 19".r.findFirstIn(scanLine).isDefined, p)
    // no join operator anywhere — scan → filter → partial/final agg
    assert(!p.contains("Join"), p)
  }

  test("q18_large_orders ships per-partition top-100, never a global sort") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the HAVING reduction partially aggregates on the fact's own key
    // before its shuffle (map-side combine on l_orderkey)
    assert("partial_sum|Partial".r.findFirstIn(p).isDefined, p)
  }

  test("q17_small_qty_revenue co-partitions the per-part threshold join") {
    val p = plan("q17_small_qty_revenue")
    // brand pruning is a broadcast semi on the fact; the correlated
    // threshold is a same-key equi join (both sides hashed on partkey),
    // never a window over the unfiltered fact
    assert("BroadcastHashJoin[^\\n]*LeftSemi".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("Window"), p)
  }

  test("q22_inactive_customers broadcasts the scalar and anti-joins inactivity") {
    val p = plan("q22_inactive_customers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q16_supplier_variety anti-joins bad suppliers and broadcasts the part dim") {
    val p = plan("q16_supplier_variety")
    assert("BroadcastHashJoin[^\\n]*LeftAnti".r.findFirstIn(p).isDefined, p)
    // the derived partsupp distinct partially aggregates before its shuffle
    assert("partial".r.findFirstIn(p.toLowerCase).isDefined, p)
  }

  test("q21_sole_late_supplier decorrelates both EXISTS into semi + anti joins") {
    val p = plan("q21_sole_late_supplier")
    assert("LeftSemi".r.findFirstIn(p).isDefined, p)
    assert("LeftAnti".r.findFirstIn(p).isDefined, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("jw_best_match scores with the native codegen expression inside an equi-join") {
    val p = plan("jw_best_match")
    // the scorer is the native expression, not an interpreted fallback
    assert(p.contains("graft_jaro_winkler"), p)
    // the block key makes it an EQUI join — a cartesian/BNLJ here would
    // be the all-pairs mistake the blocking exists to prevent
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("time_weighted_value partially aggregates after one user-keyed window") {
    val p = plan("time_weighted_value")
    assert("partial".r.findFirstIn(p.toLowerCase).isDefined, p)
    // exactly one window operator (the lead); the aggregate is hash, not sort
    assert("(?s)Window.*Window".r.findFirstIn(p).isEmpty, p)
  }

  test("benford_prices reads only the price column") {
    val p = plan("benford_prices")
    assert(p.contains("ReadSchema: struct<o_totalprice:double>"), p)
  }

  test("cheapest_trade_route broadcasts dims into the fact join") {
    val p = plan("cheapest_trade_route")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("source_similarity broadcasts the per-source size table") {
    // The pair space is sources², so the size lookup must ride as a
    // broadcast — a shuffle join keyed by source would partition a
    // ~20-row table across the cluster.
    val p = plan("source_similarity")
    assert(p.contains("BroadcastHashJoin"), p)
    // intersection counts reduce map-side before the (sa, sb) shuffle
    assert(p.contains("partial_count"), p)
  }

  test("cusum_changepoint's global window runs over the daily aggregate") {
    // The single-partition cumulative window is calendar-bounded ONLY
    // because it consumes the per-day aggregate: the plan must place a
    // HashAggregate (daily rollup) below the Window operator, and the
    // final answer is a 1-row TakeOrdered, not a full sort.
    val p = plan("cusum_changepoint")
    assert("(?s)Window.*HashAggregate".r.findFirstIn(p).isDefined, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("novelty_by_slice reads only doc_id and text") {
    val p = plan("novelty_by_slice")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("hits_scores aggregates partially around every score shuffle, top-10 pre-reduced") {
    val p = plan("hits_scores")
    assert(p.contains("partial_"), p)
    // final ranking ships per-partition top-10, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("clustering_local enumerates wedges via equi-joins only — no cartesian anywhere") {
    // the projection build, the wedge self-join and the closing-edge
    // probe are all key-equi joins; a CartesianProduct/BNLJ would be the
    // all-pairs mistake the per-order fan-out bound exists to prevent
    val p = plan("clustering_local")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ewma_revenue's global window runs over the daily aggregate") {
    // same contract as cusum_changepoint: the single-partition window is
    // calendar-bounded only because a HashAggregate (daily rollup) sits
    // below it
    val p = plan("ewma_revenue")
    assert("(?s)Window.*HashAggregate".r.findFirstIn(p).isDefined, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("interval_coverage keeps every window user-partitioned — no single-partition stage") {
    val p = plan("interval_coverage")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("source_minhash_sim takes all 16 mins in one aggregate — no row blow-up, no window") {
    val p = plan("source_minhash_sim")
    // one partial/final min-aggregate pair keyed on source; the 16
    // permutations are agg expressions, not exploded rows
    assert(p.contains("partial_min"), p)
    assert(!p.contains("Window"), p)
    // the signature table is cached: the pair self-join reads the
    // corpus-scan subtree from memory, not twice from parquet
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("pit_feature_join stays co-keyed on user_id — no band join, no cartesian") {
    // the PIT lookup must be an equi-join on user_id with the interval
    // predicate as a residual filter; a range/cartesian join here would
    // pair every purchase with every interval corpus-wide
    val p = plan("pit_feature_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("attribution_linear has no join at all — window columns + one aggregate") {
    val p = plan("attribution_linear")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("partial_"), p)
  }

  test("capped_sample_by_lang reads only lang and doc_id") {
    val p = plan("capped_sample_by_lang")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>") ||
      p.contains("ReadSchema: struct<lang:string,doc_id:bigint>"), p)
  }

  test("hll_union_custkeys merges sketches through partial aggregation") {
    // both the per-month sketch build and the union re-aggregate must
    // partially aggregate (mergeable sketch state on the map side)
    val p = plan("hll_union_custkeys")
    assert(p.contains("partial_hll_sketch_agg") ||
      p.contains("partial_"), p)
    assert(p.contains("hll_union_agg"), p)
  }

  test("key_skew_profile is two hash aggregates with map-side combine") {
    val p = plan("key_skew_profile")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // 2 aggs x partial+final
    assert(p.contains("partial_"), p)
    // only the o_custkey column is read
    assert(p.contains("ReadSchema: struct<o_custkey:bigint>"), p)
  }

  test("semdedup_prune broadcasts the centroids and caches vecs + members") {
    // assignment is a broadcast nested-loop against the k centroids —
    // the corpus never shuffles for scoring — and the two multi-consumer
    // frames (quantized vecs, cluster members) come from cache
    val p = plan("semdedup_prune")
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("repeated_ngram_coverage tokenizes the corpus once (cache), no pair join") {
    val df = SparkEntry.queries("repeated_ngram_coverage")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both consumers (df aggregate + annotate join) read the cached
    // shingle table — two InMemoryTableScans, one Generate (inside the
    // cached build subtree, which the plan string includes)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("weighted_sample_docs is a map-side projection + partial top-k") {
    val p = plan("weighted_sample_docs")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p) // no shuffle at all before the take
  }

  test("jl_projection_audit pairs by an equi-join, never a cartesian") {
    val p = plan("jl_projection_audit")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_"), p)
  }

  test("ppr_part_seeds broadcasts the seed flags and partially aggregates") {
    val p = plan("ppr_part_seeds")
    assert(p.contains("BroadcastExchange") || p.contains("InMemoryTableScan"), p)
    assert(p.contains("partial_"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("quantile_sketch_union exact path pre-aggregates by (pri, cents)") {
    // the exact median must come from the distinct-cents cumulative —
    // a (pri, cents) hash aggregate with map-side combine — never a
    // fact-sized single-partition window
    val p = plan("quantile_sketch_union")
    assert(p.contains("partial_"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("join_size_estimate builds the frequency table once (cache) + partial top-k") {
    val df = SparkEntry.queries("join_size_estimate")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dedup_survivorship never pairs the corpus; window is cluster-keyed") {
    val df = SparkEntry.queries("dedup_survivorship")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the canonical-pick window partitions by rep_doc_id, never global
    assert(p.contains("windowspecdefinition(rep_doc_id"), p)
    assert(p.contains("partial_"), p)
  }

  test("k_anonymity_audit prunes the text column and partial-aggregates") {
    val p = plan("k_anonymity_audit")
    // the audit must never read the document bodies
    assert("ReadSchema: struct<[^>]*>".r.findFirstIn(p)
      .exists(s => !s.contains("text") && s.contains("n_chars")), p)
    assert(p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("theil_sen_trend scans the fact table once (cached monthly agg)") {
    // the pair join and windows run over the calendar-bounded monthly
    // table; both join sides read the CACHED monthly aggregate, so the
    // fact scan + partial aggregate happen exactly once
    // (the plan STRING inlines the cached relation's build plan under
    // every InMemoryTableScan, so FileScan occurrences can't be counted
    // textually; >=2 cache reads is what proves the single build)
    val df = SparkEntry.queries("theil_sen_trend")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("priority_drift_tv scans the fact table once and partial-aggregates") {
    val df = SparkEntry.queries("priority_drift_tv")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), p)
  }

  test("quality_decile_by_lang reads only (text, lang) and reuses the cached histogram") {
    val df = SparkEntry.queries("quality_decile_by_lang")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // quantiles come from the histogram-CDF: the (lang, qp) aggregate is
    // cached and read by both the CDF window and the per-lang totals —
    // the corpus itself is scored in one pass and never sorted
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    // column pruning: the documents scan reads text + lang, nothing else
    assert(p.contains("ReadSchema: struct<text:string,lang:string>"), p)
  }

  test("target_encode_oof scans the fact table once; prior rides a broadcast") {
    val df = SparkEntry.queries("target_encode_oof")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the (cat, fold) aggregate is cached and feeds the window AND the
    // 1-row prior; no second orders scan, no cartesian
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("feature_hash_collisions tokenizes once and stacks widths in-row") {
    val p = plan("feature_hash_collisions")
    // the 4 widths come from ONE explode over the same hash — a width
    // must never trigger its own corpus scan
    assert("FileScan parquet".r.findAllIn(p).size <= 1, p)
    assert(p.contains("Generate explode"), p)
  }

  test("peak_inflight_shipments: map-side delta reduce, supplier-keyed windows only") {
    val p = plan("peak_inflight_shipments")
    // the sweep deltas partial-aggregate before the shuffle, and every
    // window is supplier-partitioned — no single-partition stage exists
    assert(p.contains("partial_"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("golden_record_merge: stacked aggregates, no window, no member-table rescan") {
    val df = SparkEntry.queries("golden_record_merge")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // round-12 shape: ONE pass over the labels-joined members into the
    // (cluster, segment)-grain aggregate, then the cluster-grain
    // aggregate with min(struct(-cnt, segment)) as the segment mode —
    // no ranking window, no join-back of a second aggregate, so the
    // member table needs neither a cache nor a rescan
    assert(!p.contains("Window"), p)
    assert("min\\(struct\\(nc".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("seq_topk_refblock: refs broadcast, cells cached, no cartesian pairing") {
    val df = SparkEntry.queries("seq_topk_refblock")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the sequence table is built once (cached) and the probe/candidate
    // sides join through the cell key — the all-pairs quadratic never
    // exists in the plan
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("no corpus-proportional single-partition rank window (rfm, gini)") {
    // Round-11 contract: every ranking window over a per-customer table
    // must be partitioned (the Blocking.globalIndex _pid scheme); the
    // only permitted single-partition windows are the prefix-sum over
    // the numPartitions-row offsets table. ntile is gone entirely —
    // replaced by the exact distributed tile rule.
    for (name <- Seq("rfm_segments", "revenue_concentration")) {
      val p = plan(name)
      assert(!p.contains("ntile("), s"$name still plans a window ntile")
      val rankWindows =
        p.linesIterator.filter(_.contains("Window [row_number()")).toSeq
      assert(rankWindows.nonEmpty, s"$name lost its rank windows:\n$p")
      rankWindows.foreach { l =>
        assert(l.contains("windowspecdefinition(_pid"),
          s"$name has an unpartitioned rank window: $l")
      }
    }
    spark.catalog.clearCache()
  }

  test("round-11 contraction queries: no cartesian, members/index cached") {
    // The contraction expansions are joins on rep keys and the pair
    // joins stay blocked — a refactor that degrades any of them to a
    // cartesian (or loses the shared-member cache) fails here.
    for (name <- Seq("dedup_containment", "embed_near_dup",
        "seq_topk_refblock", "semdedup_prune", "dedup_lsh_recall")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian")
      assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
        s"$name lost its shared caches")
    }
    spark.catalog.clearCache()
  }

  test("embed_norm_outliers: one cached vector scan feeds both percentile passes") {
    val df = SparkEntry.queries("embed_norm_outliers")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // sqn table cached (median pass + dev build), dev table cached (MAD
    // pass + banding); the 1-row stats ride broadcasts, never a shuffle
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
