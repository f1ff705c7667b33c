package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns
import Util._

/** Round-9 "signals" pack: graph centrality beyond PageRank (HITS),
  * exact local clustering under a declared degree cap, dyadic-weight
  * EWMA smoothing, interval merge/coverage (gaps-and-islands), sketch
  * mergeability (KMV union), join-key skew profiling, and per-source
  * exact-dup rates. House rules as everywhere in the repo: exact
  * integer/decimal arithmetic at every oracle boundary, every query
  * ends in a total order, no UDFs, every pair space blocked or capped.
  */
object Signals {

  /** Portable 52-bit hash both engines compute bit-identically:
    * first 13 hex chars of md5 of the string form.
    */
  private def h52(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 13), 16, 10).cast("long")

  /** Local-clustering degree cap: nodes above it are excluded from the
    * wedge enumeration (per-node wedge work is then <= cap², a constant,
    * so the operator's cost is linear in nodes at any corpus size —
    * exactly the restriction production systems declare, because
    * clustering coefficients are only informative for low-degree nodes
    * anyway).
    */
  private val CC_DEG_CAP = 64

  def queries: Map[String, Q] = Map(
    // HITS hubs-and-authorities on the supplier→part bipartite graph —
    // the mutually-recursive sibling of pagerank_bipartite: a part is
    // authoritative when supplied by strong hubs, a supplier is a hub
    // when it supplies authoritative parts. Two synchronous unnormalized
    // rounds from h₀ = 1 (auth₁ = indegree, hub₁ = Σ auth₁, auth₂ =
    // Σ hub₁) keep everything in BIGINT — no float normalization, no
    // convergence races — and unroll to a plain CTE oracle. Each round
    // is one join of the frozen edge list against the (node-sized)
    // score table plus one hash aggregate: PageRank's scale shape.
    "hits_scores" -> ((s, dir) => {
      val e = lineitem(s, dir)
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val auth1 = e.groupBy(col("pk")).agg(count(lit(1)).as("a1"))
      val hub1 = e.join(auth1, "pk")
        .groupBy(col("sk")).agg(sum(col("a1")).as("h1"))
      e.join(hub1, "sk")
        .groupBy(col("pk")).agg(sum(col("h1")).as("auth_score"))
        .orderBy(col("auth_score").desc, col("pk"))
        .limit(10)
    }),

    // Exact local clustering coefficient on the BASKET graph (parts are
    // adjacent when some order contains both), computed for nodes with
    // degree <= CC_DEG_CAP. The projection is built per order — fan-out
    // bounded by items-per-order choose 2 — and both the graph's degree
    // distribution and the capped set are replication-invariant
    // (orders-per-part is a rate, not a volume), unlike the supplier
    // co-supply projection, which is near-complete and would leave the
    // capped set empty at every scale. The wedge enumeration runs only
    // from capped nodes, so per-node work is <= cap²·closing-join.
    // cc_permille = 1000·2·triangles(v) / (deg·(deg-1)) in pure integer
    // arithmetic.
    "clustering_local" -> ((s, dir) => {
      val e = lineitem(s, dir)
        .select(col("l_orderkey").as("pk"), col("l_partkey").as("sk"))
        .distinct()
      val proj = e.toDF("pk", "s1")
        .join(e.toDF("pk", "s2"), "pk")
        .filter(col("s1") < col("s2"))
        .select(col("s1"), col("s2"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sym = proj.union(proj.select(col("s2"), col("s1"))).toDF("u", "v")
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val capped = deg.filter(col("deg").between(2, CC_DEG_CAP))
      // wedges centered at capped u: two incident edges (u,x),(u,y)
      // with x < y; the closing join checks (x,y) ∈ proj
      val inc = sym.join(capped.select(col("u")), "u")
      val tri = inc.toDF("u", "x")
        .join(inc.toDF("u", "y"), "u")
        .filter(col("x") < col("y"))
        .join(proj.toDF("x", "y"), Seq("x", "y"))
        .groupBy(col("u")).agg(count(lit(1)).as("n_tri"))
      capped.join(tri, Seq("u"), "left")
        .select(col("u").as("partkey"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"))
        .withColumn("cc_permille",
          expr("(2000 * n_tri) div (deg * (deg - 1))"))
        .orderBy(col("cc_permille").desc, col("deg").desc, col("partkey"))
        .limit(20)
    }),

    // Dyadic-weight EWMA over daily revenue: an 8-term trailing window
    // with weights 2⁷..2⁰ (half-life one day, denominator 255) — every
    // product and sum is exact BIGINT cents, so the smoothing is
    // bit-portable where a real exp-decay float EWMA never is (float
    // sum order). The global window runs over the DAILY table,
    // calendar-bounded like cusum_changepoint's. Emits the 5 hottest
    // smoothed days.
    "ewma_revenue" -> ((s, dir) => {
      val daily = orders(s, dir)
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(d2(col("o_totalprice")) * 100).cast("long").as("cents"))
      val w = Window.orderBy(col("day"))
      val num = (0 to 7).map(k => coalesce(lag(col("cents"), k).over(w),
        lit(0L)) * lit(1L << (7 - k))).reduce(_ + _)
      daily
        .withColumn("rn", row_number().over(w))
        .withColumn("num", num)
        .withColumn("ewma_cents", expr("num div 255"))
        .filter(col("rn") >= 8)
        .select(col("day"), col("ewma_cents"))
        .orderBy(col("ewma_cents").desc, col("day"))
        .limit(5)
    }),

    // Interval merge + coverage (gaps-and-islands): each event opens a
    // 15-minute activity interval; overlapping intervals per user merge
    // into islands (start > running max of prior ends ⇒ new island),
    // and the user's coverage is the exact µs sum of merged island
    // lengths. Everything runs inside user-keyed windows — no global
    // state, partition-parallel at any scale. Emits the 20
    // highest-coverage users.
    "interval_coverage" -> ((s, dir) => {
      val width = 900000000L // 15 min in µs
      val ev = events(s, dir)
        .select(col("user_id"), tsUs(col("ts")).as("st"), col("event_id"))
        .withColumn("en", col("st") + lit(width))
      graft.operators.Intervals
        .coverage(ev, col("user_id"), col("st"), col("en"), col("event_id"))
        .select(col("k").as("user_id"), col("n_islands"),
          col("coverage").as("coverage_us"))
        .orderBy(col("coverage_us").desc, col("user_id"))
        .limit(20)
    }),

    // KMV sketch MERGEABILITY: two disjoint halves of lineitem each
    // build a k=64 KMV sketch of their distinct partkeys; the union's
    // distinct count is estimated from the MERGED sketch (the k smallest
    // of the union of the two hash sets — exactly what a combiner does
    // with per-partition sketches at 100 TB) and reported against the
    // exact union count. Same 52-bit portable hash as
    // kmv_distinct_parts.
    "kmv_union_distinct" -> ((s, dir) => {
      val k = 64
      val keyed = lineitem(s, dir)
        .select((col("l_orderkey") % 2).as("half"), col("l_partkey"))
        .distinct()
        .withColumn("h", h52(col("l_partkey")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perHalf = keyed
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("half")).orderBy(col("h"), col("l_partkey"))))
        .filter(col("rn") <= k)
      val merged = perHalf.select(col("h")).distinct()
        .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
        .filter(col("rn") === k)
        .select(col("h").as("h_k"))
      val exact = keyed.agg(
        countDistinct(col("l_partkey")).as("exact_union"))
      exact.crossJoin(merged)
        .select(
          expr(s"(${k - 1} * CAST(4503599627370496 AS BIGINT)) div h_k")
            .as("est_union"),
          col("exact_union"),
          expr(s"(1000 * ((${k - 1} * CAST(4503599627370496 AS BIGINT)) " +
            "div h_k)) div exact_union").as("ratio_permille"))
    }),

    // KMV sketch INTERSECTION (Beyer et al., "On synopses for
    // distinct-value estimation under multiset operations"): from the
    // same two per-half k=64 KMV sketches, the merged sketch K(A∪B) is
    // the k smallest hashes of K(A)∪K(B); ρ = |K(A∪B) ∩ K(A) ∩ K(B)|
    // estimates the Jaccard of the two key sets, and
    // est_inter = ρ · est_union div k — set algebra entirely on
    // catalog-sized sketches, the reason mergeable summaries can answer
    // overlap questions about 100 TB partitions without a join of the
    // raw tables. Everything after the per-half sketch build runs over
    // ≤ 2k rows (the bounded global window + 1-row crossJoins below),
    // so cost is the one distinct + one windowed top-k pass.
    "kmv_intersect_parts" -> ((s, dir) => {
      val k = 64
      val keyed = lineitem(s, dir)
        .select((col("l_orderkey") % 2).as("half"), col("l_partkey"))
        .distinct()
        .withColumn("h", h52(col("l_partkey")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perHalf = keyed
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("half")).orderBy(col("h"), col("l_partkey"))))
        .filter(col("rn") <= k)
      // membership of each sketch hash in A's / B's sketch; the global
      // row_number window runs over <= 2k rows — bounded by design
      val memb = perHalf.groupBy(col("h")).agg(
        max(when(col("half") === 0, 1L).otherwise(0L)).as("in_a"),
        max(when(col("half") === 1, 1L).otherwise(0L)).as("in_b"))
      val merged = memb
        .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
        .filter(col("rn") <= k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kth = merged.filter(col("rn") === k).select(col("h").as("h_k"))
      val rho = merged.agg(
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("rho"))
      val exact = keyed.groupBy(col("l_partkey"))
        .agg(countDistinct(col("half")).as("nh"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("nh") === 2, 1L).otherwise(0L)).as("exact_inter"))
      val estU = s"(${k - 1} * CAST(4503599627370496 AS BIGINT)) div h_k"
      exact.crossJoin(kth).crossJoin(rho)
        .select(
          expr(estU).as("est_union"),
          col("exact_union"),
          col("rho"),
          expr(s"(rho * ($estU)) div $k").as("est_inter"),
          col("exact_inter"))
    }),

    // MinHash SKETCH of each source's shingle set (16 portable
    // permutations) and the pairwise signature-match estimate of
    // cross-source Jaccard — the scale path for source_similarity: the
    // exact inverted-index join reads every shingle ONCE PER PAIR
    // CANDIDATE, while the sketch reduces each source to 16 longs in a
    // single pass (min per permutation is map-side combinable) and the
    // pair comparison runs over a sources×16 table — catalog-sized, so
    // at 100 TB the cross-source similarity matrix costs one corpus
    // scan regardless of source count. Estimates are deterministic
    // integers: n_match of 16 permutations, est_permille granularity
    // 62.5.
    "source_minhash_sim" -> ((s, dir) => {
      val nPerms = 16
      // One 52-bit base hash per shingle OCCURRENCE (min ignores
      // duplicates, so no distinct pass is needed), 16 affine
      // permutations h_p = (h0·(2p+3) + p) mod 2^52 derived
      // arithmetically (products stay < 2^58 — exact in BIGINT in both
      // engines), and all 16 mins taken in ONE hash aggregate over the
      // un-exploded table: no 16x row blow-up, map-side combine down to
      // sources×16 longs per partition.
      val sh = documents(s, dir)
        .select(col("source"), explode(TextFns.shingleSet(col("text"), 3)).as("sh"))
        .select(col("source"), h52(col("sh")).as("h0"))
      val minExprs = (0 until nPerms).map(p =>
        min(expr(s"(h0 * ${2 * p + 3} + $p) % 4503599627370496"))
          .as(s"mh$p"))
      // persist: the self-join below reads sig twice, and without the
      // cache each side would re-scan + re-tokenize the whole corpus
      val sig = sh.groupBy(col("source")).agg(minExprs.head, minExprs.tail: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      val b = sig.columns.foldLeft(sig)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      val nMatch = (0 until nPerms).map(p =>
        when(col(s"a_mh$p") === col(s"b_mh$p"), 1L).otherwise(0L))
        .reduce(_ + _)
      a.join(b, col("a_source") < col("b_source"))
        .select(col("a_source").as("sa"), col("b_source").as("sb"),
          nMatch.as("n_match"))
        .withColumn("est_permille", expr(s"(1000 * n_match) div $nPerms"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Join-key skew profile: the log2-bucket histogram of o_custkey
    // frequencies in orders — the diagnostic read BEFORE choosing a
    // join strategy (a fat top bucket ⇒ salt or skew-hint that key).
    // bucket = ⌊log2 f⌋ via binary string length: pure integer, no
    // float log. One hash aggregate over keys, one over buckets.
    "key_skew_profile" -> ((s, dir) => {
      orders(s, dir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("f"))
        .withColumn("bucket", length(bin(col("f"))).cast("long") - 1)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_keys"), sum(col("f")).as("n_rows"),
          max(col("f")).as("max_f"))
        .orderBy(col("bucket"))
    }),

    // POINT-IN-TIME feature join — the leakage-safe training join: each
    // purchase is credited with the user's status (last non-purchase
    // event type) VALID AT the purchase's own timestamp, never a later
    // one — the classic "feature as of label time" discipline. The
    // status dimension is built as SCD2 runs (change-compress + lead
    // close) and the PIT lookup is a user-keyed equi-join with an
    // interval filter — fan-out = runs × purchases per user, co-keyed,
    // never a corpus-wide band join. Output: revenue by status-at-
    // purchase.
    "pit_feature_join" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"),
          tsUs(col("ts")).as("ts"), col("event_id"),
          d2(col("value")).as("v"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val dim = ev.filter(col("event_type") =!= "purchase")
        .withColumn("p", lag(col("event_type"), 1).over(w))
        .filter(col("p").isNull || col("p") =!= col("event_type"))
        .withColumn("vt", lead(col("ts"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))))
        .select(col("user_id"), col("event_type").as("status"),
          col("ts").as("vf"), coalesce(col("vt"), lit(Long.MaxValue)).as("vt"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("v"))
      facts.join(dim, Seq("user_id"))
        .filter(col("ts") >= col("vf") && col("ts") < col("vt"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("v") * 100).cast("long").as("cents"))
        .orderBy(col("status"))
    }),

    // Capped per-class downsampling: each language keeps its K docs
    // with the smallest portable hash — the deterministic "no class
    // exceeds its budget" rebalancer (stratified_sample_docs keeps a
    // RATE; this keeps a COUNT). The kept set is content-verified via
    // an order-independent id sum, not just counted. One lang-keyed
    // ranking window; at extreme skew the same contract runs as a
    // TopKAgg per-partition pre-reduction with the window unchanged in
    // semantics.
    "capped_sample_by_lang" -> ((s, dir) => {
      val k = 100
      val ranked = documents(s, dir)
        .select(col("lang"), col("doc_id"), h52(col("doc_id")).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
      ranked.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rn") <= k, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") <= k, col("doc_id")).otherwise(0L))
            .as("kept_id_sum"))
        .orderBy(col("lang"))
    }),

    // LINEAR multi-touch attribution — the equal-credit sibling of
    // attribution_last_touch: each purchase's cents split 1/n across
    // ALL the user's preceding touches, by channel. The naive form
    // joins purchases to their touch sets (quadratic in user history);
    // here the bounded channel alphabet turns it into |channels|
    // conditional running-count window columns + one aggregate — no
    // join, no fan-out, one user-keyed shuffle. Credits are exact
    // millicents (cents·1000·cnt div total, deterministic truncation);
    // touchless purchases credit 'direct'.
    "attribution_linear" -> ((s, dir) => {
      val channels = Seq("click", "error", "signup", "view")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val base = events(s, dir)
        .select(col("user_id"), col("event_type"),
          col("ts"), col("event_id"),
          (d2(col("value")) * 100).cast("long").as("cents"))
      val withCnt = channels.foldLeft(base)((d, t) =>
        d.withColumn(s"c_$t",
          sum(when(col("event_type") === t, 1L).otherwise(0L)).over(w)))
      val tot = channels.map(t => col(s"c_$t")).reduce(_ + _)
      val p = withCnt.filter(col("event_type") === "purchase")
        .withColumn("tot", tot)
      val aggs = channels.map(t =>
        sum(when(col("tot") > 0,
          expr(s"(cents * 1000 * c_$t) div tot")).otherwise(0L))
          .as(s"m_$t")) :+
        sum(when(col("tot") === 0, col("cents") * 1000).otherwise(0L))
          .as("m_direct")
      val stackArgs = (channels.map(t => s"'$t', m_$t") :+
        "'direct', m_direct").mkString(", ")
      p.agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${channels.size + 1}, $stackArgs) " +
          "AS (channel, millicents)"))
        .orderBy(col("channel"))
    }),

    // STORED-sketch mergeability (DataSketches HLL): per-month HLL
    // sketches of the customer set are built once, then UNION-MERGED per
    // priority without touching raw rows again — the two-level summary-
    // table pattern that answers "distinct users this quarter" at 100 TB
    // from kilobytes of stored sketch state instead of a fact rescan.
    // Oracle-gated by construction like approx_distinct_parts: exact
    // twin beside the estimate, within-5% boolean pinned true.
    "hll_union_custkeys" -> ((s, dir) => {
      val monthly = orders(s, dir)
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("m"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      val merged = monthly
        .groupBy(col("o_orderpriority"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
          count(lit(1)).as("n_months"))
      val exact = orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_cust"))
      exact.join(merged, "o_orderpriority")
        .select(col("o_orderpriority"), col("exact_cust"), col("n_months"),
          (abs(col("est") - col("exact_cust")).cast("double") <=
            lit(0.05) * col("exact_cust").cast("double")).as("approx_ok"))
        .orderBy(col("o_orderpriority"))
    }),

    // Join-size estimation from per-key frequency statistics — the
    // optimizer-grade diagnostic next to key_skew_profile: the
    // self-join size on l_partkey is EXACTLY Σf² (what a skewed key
    // does to a join is this number exploding), and the estimate is
    // the classic end-biased synopsis (Ioannidis/Christodoulakis):
    // the H=64 heaviest keys kept exactly (they dominate Σf² under
    // skew), the tail assumed uniform at (Σ_tail f)² / ndv_tail. At
    // 100 TB the synopsis is one hash aggregate + a TakeOrdered of 64
    // rows per table — what a CBO actually materializes — while the
    // exact Σf² here prices how good that synopsis is. All integers.
    "join_size_estimate" -> ((s, dir) => {
      val H = 64
      val freq = lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Squared terms go through decimal(38,0): sum(f*f) and the
      // uniform-tail (total-head)^2 wrap silently in non-ANSI long
      // arithmetic past ~3e9 rows (DuckDB would error instead) — the
      // decimal width buys the full 100 TB headroom, then the final
      // values cast back to BIGINT to keep the oracle schema.
      val fD = col("f").cast("decimal(38,0)")
      val exact = freq
        .agg(sum(fD * fD).cast("long").as("exact_size"))
      val topStats = freq.orderBy(col("f").desc, col("l_partkey")).limit(H)
        .agg(sum(fD * fD).cast("long").as("head_size"),
          count(lit(1)).as("n_head"), sum(col("f")).as("head_rows"))
      val allStats = freq.agg(count(lit(1)).as("ndv"),
        sum(col("f")).as("total_rows"))
      exact.crossJoin(topStats).crossJoin(allStats)
        .select(col("exact_size"),
          expr("CAST(head_size + CASE WHEN ndv > n_head THEN " +
            "CAST((CAST(total_rows AS DECIMAL(38,0)) - head_rows) * " +
            "(CAST(total_rows AS DECIMAL(38,0)) - head_rows) " +
            "div (ndv - n_head) AS LONG) ELSE 0 END AS LONG)")
            .as("est_size"),
          col("ndv"), col("total_rows"))
        .select(col("exact_size"), col("est_size"), col("ndv"),
          col("total_rows"),
          expr("(1000 * abs(est_size - exact_size)) div exact_size")
            .as("err_permille"))
    }),

    // AMS (Alon–Matias–Szegedy) F2 sketch — the one-pass streaming
    // estimate of the same Σf² that join_size_estimate prices from a
    // top-k synopsis: 16 ±1-signed counters (sign = bit j of the
    // portable 52-bit hash), each an UNBIASED estimator of F2 when
    // squared, averaged. The whole sketch is ONE hash aggregate whose
    // 16 sums are map-side combinable — at 100 TB the counters reduce
    // per partition and 16 longs cross the wire, the property that
    // makes F2 (join size, self-join skew, repeat rate) streamable.
    // Exact integers end to end: counters < Σf, squares < 2⁶³.
    "ams_f2_estimate" -> ((s, dir) => {
      val nSk = 16
      val freq = lineitem(s, dir)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
        .withColumn("h", h52(col("l_partkey")))
      val sums = (0 until nSk).map(j =>
        sum(expr(s"f * (1 - 2 * ((h div ${1L << j}) % 2))")).as(s"c$j")) ++
        Seq(sum(expr("f * f")).as("exact_f2"))
      val est = (0 until nSk).map(j => s"c$j * c$j").mkString(" + ")
      freq.agg(sums.head, sums.tail: _*)
        .select(col("exact_f2"), expr(s"($est) div $nSk").as("est_f2"))
        .select(col("exact_f2"), col("est_f2"),
          expr("(1000 * abs(est_f2 - exact_f2)) div exact_f2")
            .as("err_permille"))
    }),

    // Mergeable QUANTILE sketch (the GK/KLL shape in relational form):
    // each (priority, month) shard keeps K=32 evenly-rank-spaced order
    // statistics of the price distribution — point r is selected iff
    // floor(rK/n) > floor((r-1)K/n), an exact-integer predicate — each
    // carrying the number of rows since the previous selected point, so
    // shard weights sum to n exactly. Shards merge per priority by
    // UNION + cumulative weight (associative/commutative — the
    // combiner property that lets 100 TB of per-partition sketches
    // reduce in one shuffle of K rows per shard), and the merged lower
    // weighted median is compared against the exact one computed by
    // the distinct-cents cumulative trick (bounded by value
    // cardinality, never a fact-sized window). All integers: the
    // estimate, the exact value, and the permille error are
    // deterministic in both engines. The per-shard rank window is the
    // sketch BUILD — per-shard sort, parallel across shards, the cost
    // a sketch pass pays anywhere.
    "quantile_sketch_union" -> ((s, dir) => {
      val K = 32
      // persisted: the sketch ranking, the per-priority totals, and the
      // exact-median twin all consume this projection (ScanAudit:
      // orders x4)
      val rows = orders(s, dir).select(col("o_orderpriority").as("pri"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"),
        (d2(col("o_totalprice")) * 100).cast("long").as("cents"),
        col("o_orderkey"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val shardW = Window.partitionBy(col("pri"), col("m"))
        .orderBy(col("cents"), col("o_orderkey"))
      // r is cast to long IMMEDIATELY: row_number() is IntegerType and
      // (r * 32) would wrap 32-bit for shards past ~67M rows, silently
      // diverging from the oracle's CAST(r AS BIGINT). All arithmetic
      // on r (selection predicate, carried weights) is 64-bit.
      val ranked = rows
        .withColumn("r", row_number().over(shardW).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("pri"), col("m"))))
      val selected = ranked
        .filter(expr(s"(r * $K) div n > ((r - 1) * $K) div n"))
        .withColumn("w", col("r") - coalesce(lag(col("r"), 1).over(
          Window.partitionBy(col("pri"), col("m")).orderBy(col("r"))),
          lit(0L)))
      // merged estimate: cumulative weight over the sketch points only
      // (<= K * shards rows per priority — sketch-sized by design)
      val mergedW = Window.partitionBy(col("pri"))
        .orderBy(col("cents"), col("m"), col("r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = rows.groupBy(col("pri")).agg(count(lit(1)).as("n_rows"))
      val est = selected.withColumn("cum", sum(col("w")).over(mergedW))
        .join(broadcast(tot), Seq("pri"))
        .filter(col("cum") * 2 >= col("n_rows"))
        .groupBy(col("pri"), col("n_rows"))
        .agg(min(col("cents")).as("est_median_cents"))
      // exact lower weighted median via distinct-cents cumulative —
      // running count from the distributed grouped prefix sum (round 11:
      // 5 pri groups each carry a value-domain-sized distinct-cents
      // tail; a pri-partitioned window would push each through one task)
      val grouped = rows.groupBy(col("pri"), col("cents"))
        .agg(count(lit(1)).as("gw"))
      val exact = graft.operators.Blocking.groupedPrefixSum(grouped,
          Seq("pri"), Seq(col("cents")), "gw", "cum")
        .join(broadcast(tot), Seq("pri"))
        .filter(col("cum") * 2 >= col("n_rows"))
        .groupBy(col("pri"))
        .agg(min(col("cents")).as("exact_median_cents"))
      est.join(exact, Seq("pri"))
        .select(col("pri"), col("n_rows"), col("est_median_cents"),
          col("exact_median_cents"),
          expr("(1000 * abs(est_median_cents - exact_median_cents)) " +
            "div exact_median_cents").as("err_permille"))
        .orderBy(col("pri"))
    }),

    // Per-source exact-duplicate rate: a doc is a duplicate when an
    // earlier doc (smaller doc_id) has the same fingerprint — the
    // "which ingestion source is re-crawling content" table that
    // decides where dedup budget goes. The fingerprint hashes the
    // first 60 chars of the normalized text (excerpt-class boilerplate
    // re-crawls share openings long before they share full bodies), so
    // the signal is nonzero even on small slices where full-body exact
    // dups are absent. The min-per-fingerprint runs in a
    // fingerprint-keyed window (replica groups are small), then one
    // aggregate per source.
    "dup_rate_by_source" -> ((s, dir) => {
      val fp = md5(substring(
        trim(regexp_replace(lower(col("text")), "\\s+", " ")), 1, 60))
      documents(s, dir)
        .select(col("doc_id"), col("source"), fp.as("fp"))
        .withColumn("rep", min(col("doc_id")).over(
          Window.partitionBy(col("fp"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") > col("rep"), 1L).otherwise(0L))
            .as("n_dups"))
        .withColumn("dup_permille", expr("(1000 * n_dups) div n_docs"))
        .orderBy(col("source"))
    })
  )

  def oracles: Map[String, String] = Map(
    "hits_scores" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
        |auth1 AS (SELECT pk, count(*) AS a1 FROM e GROUP BY pk),
        |hub1 AS (
        |  SELECT e.sk, SUM(a.a1) AS h1 FROM e JOIN auth1 a ON a.pk = e.pk
        |  GROUP BY e.sk)
        |SELECT e.pk, CAST(SUM(h.h1) AS BIGINT) AS auth_score
        |FROM e JOIN hub1 h ON h.sk = e.sk
        |GROUP BY e.pk
        |ORDER BY auth_score DESC, pk LIMIT 10""".stripMargin,

    "clustering_local" ->
      s"""WITH e AS (
         |  SELECT DISTINCT l_orderkey AS pk, l_partkey AS sk FROM lineitem),
         |proj AS (
         |  SELECT DISTINCT x.sk AS s1, y.sk AS s2
         |  FROM e x JOIN e y ON x.pk = y.pk AND x.sk < y.sk),
         |sym AS (
         |  SELECT s1 AS u, s2 AS v FROM proj
         |  UNION ALL SELECT s2, s1 FROM proj),
         |deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
         |capped AS (
         |  SELECT u, deg FROM deg WHERE deg BETWEEN 2 AND $CC_DEG_CAP),
         |inc AS (SELECT s.u, s.v FROM sym s JOIN capped c ON c.u = s.u),
         |tri AS (
         |  SELECT a.u, count(*) AS n_tri
         |  FROM inc a JOIN inc b ON a.u = b.u AND a.v < b.v
         |  JOIN proj p ON p.s1 = a.v AND p.s2 = b.v
         |  GROUP BY a.u)
         |SELECT c.u AS partkey, CAST(c.deg AS BIGINT) AS deg,
         |  CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
         |  (2000 * CAST(coalesce(t.n_tri, 0) AS BIGINT))
         |    // (c.deg * (c.deg - 1)) AS cc_permille
         |FROM capped c LEFT JOIN tri t ON t.u = c.u
         |ORDER BY cc_permille DESC, deg DESC, partkey LIMIT 20""".stripMargin,

    "ewma_revenue" -> {
      val terms = (0 to 7).map(k =>
        s"coalesce(lag(cents, $k) OVER (ORDER BY day), 0) * ${1L << (7 - k)}")
        .mkString(" + ")
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
         |      AS cents
         |  FROM orders GROUP BY 1),
         |sm AS (
         |  SELECT day, row_number() OVER (ORDER BY day) AS rn,
         |    ($terms) // 255 AS ewma_cents
         |  FROM daily)
         |SELECT day, CAST(ewma_cents AS BIGINT) AS ewma_cents FROM sm
         |WHERE rn >= 8
         |ORDER BY ewma_cents DESC, day LIMIT 5""".stripMargin
    },

    "interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + 900000000 AS en, event_id
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, st, en, event_id,
        |    CASE WHEN max(en) OVER (PARTITION BY user_id
        |        ORDER BY st, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR st > max(en) OVER (PARTITION BY user_id
        |        ORDER BY st, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS new_island
        |  FROM iv),
        |isl AS (
        |  SELECT user_id, st, en,
        |    SUM(new_island) OVER (PARTITION BY user_id
        |      ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged),
        |merged AS (
        |  SELECT user_id, island, min(st) AS ist, max(en) AS ien
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(ien - ist) AS BIGINT) AS coverage_us
        |FROM merged GROUP BY user_id
        |ORDER BY coverage_us DESC, user_id LIMIT 20""".stripMargin,

    "kmv_union_distinct" ->
      """WITH keyed AS (
        |  SELECT half, l_partkey,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS h
        |  FROM (SELECT DISTINCT l_orderkey % 2 AS half, l_partkey
        |        FROM lineitem)),
        |per_half AS (
        |  SELECT h FROM (
        |    SELECT half, h, row_number() OVER (PARTITION BY half
        |      ORDER BY h, l_partkey) AS rn
        |    FROM keyed) WHERE rn <= 64),
        |merged AS (
        |  SELECT h AS h_k FROM (
        |    SELECT h, row_number() OVER (ORDER BY h) AS rn
        |    FROM (SELECT DISTINCT h FROM per_half)) WHERE rn = 64),
        |exact AS (
        |  SELECT count(DISTINCT l_partkey) AS exact_union FROM keyed)
        |SELECT (63 * CAST(4503599627370496 AS BIGINT)) // h_k AS est_union,
        |  CAST(exact_union AS BIGINT) AS exact_union,
        |  (1000 * ((63 * CAST(4503599627370496 AS BIGINT)) // h_k))
        |    // exact_union AS ratio_permille
        |FROM exact, merged""".stripMargin,

    // Mirrors kmv_intersect_parts: identical sketches, merged-sketch
    // membership flags, rho over the k smallest, inclusion–exclusion-free
    // intersection estimate rho * est_union // k.
    "kmv_intersect_parts" ->
      """WITH keyed AS (
        |  SELECT half, l_partkey,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS h
        |  FROM (SELECT DISTINCT l_orderkey % 2 AS half, l_partkey
        |        FROM lineitem)),
        |per_half AS (
        |  SELECT half, h FROM (
        |    SELECT half, h, row_number() OVER (PARTITION BY half
        |      ORDER BY h, l_partkey) AS rn
        |    FROM keyed) WHERE rn <= 64),
        |memb AS (
        |  SELECT h, max(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS in_b
        |  FROM per_half GROUP BY h),
        |merged AS (
        |  SELECT h, in_a, in_b, rn FROM (
        |    SELECT h, in_a, in_b, row_number() OVER (ORDER BY h) AS rn
        |    FROM memb) WHERE rn <= 64),
        |kth AS (SELECT h AS h_k FROM merged WHERE rn = 64),
        |rho AS (
        |  SELECT CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS rho
        |  FROM merged),
        |exact AS (
        |  SELECT CAST(count(*) AS BIGINT) AS exact_union,
        |    CAST(SUM(CASE WHEN nh = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS exact_inter
        |  FROM (SELECT l_partkey, count(DISTINCT half) AS nh
        |        FROM keyed GROUP BY l_partkey))
        |SELECT (63 * CAST(4503599627370496 AS BIGINT)) // h_k AS est_union,
        |  exact_union, rho,
        |  (rho * ((63 * CAST(4503599627370496 AS BIGINT)) // h_k)) // 64
        |    AS est_inter,
        |  exact_inter
        |FROM exact, kth, rho""".stripMargin,

    // Mirrors ams_f2_estimate: same hash-bit signs, 16 counters, mean
    // of squares.
    "ams_f2_estimate" -> {
      val cs = (0 until 16).map(j =>
        s"CAST(SUM(f * (1 - 2 * ((h // ${1L << j}) % 2))) AS BIGINT) AS c$j")
        .mkString(",\n        |    ")
      val est = (0 until 16).map(j => s"c$j * c$j").mkString(" + ")
      s"""WITH freq AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS f,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS h
        |  FROM lineitem GROUP BY 1),
        |cnt AS (
        |  SELECT
        |    $cs,
        |    CAST(SUM(f * f) AS BIGINT) AS exact_f2
        |  FROM freq),
        |est AS (SELECT exact_f2, ($est) // 16 AS est_f2 FROM cnt)
        |SELECT exact_f2, est_f2,
        |  (1000 * abs(est_f2 - exact_f2)) // exact_f2 AS err_permille
        |FROM est""".stripMargin
    },

    // Mirrors join_size_estimate: same top-64 head by (f DESC, key),
    // same uniform-tail estimate.
    "join_size_estimate" ->
      """WITH freq AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS f
        |  FROM lineitem GROUP BY 1),
        |top_ AS (
        |  SELECT f FROM (
        |    SELECT f, row_number() OVER (ORDER BY f DESC, l_partkey)
        |      AS rn FROM freq) WHERE rn <= 64),
        |hs AS (SELECT CAST(SUM(f * f) AS BIGINT) AS head_size,
        |         CAST(count(*) AS BIGINT) AS n_head,
        |         CAST(SUM(f) AS BIGINT) AS head_rows FROM top_),
        |als AS (SELECT CAST(count(*) AS BIGINT) AS ndv,
        |          CAST(SUM(f) AS BIGINT) AS total_rows FROM freq),
        |ex AS (SELECT CAST(SUM(f * f) AS BIGINT) AS exact_size FROM freq),
        |joined AS (
        |  SELECT exact_size,
        |    CAST(head_size + CASE WHEN ndv > n_head THEN
        |      ((total_rows - head_rows) * (total_rows - head_rows))
        |        // (ndv - n_head) ELSE 0 END AS BIGINT) AS est_size,
        |    ndv, total_rows
        |  FROM ex, hs, als)
        |SELECT exact_size, est_size, ndv, total_rows,
        |  (1000 * abs(est_size - exact_size)) // exact_size
        |    AS err_permille
        |FROM joined""".stripMargin,

    // Mirrors quantile_sketch_union: same rank-spaced selection
    // predicate, carried-row weights, merged cumulative median, and
    // distinct-cents exact median.
    "quantile_sketch_union" ->
      """WITH rows_ AS (
        |  SELECT o_orderpriority AS pri,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS m,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_orderkey
        |  FROM orders),
        |ranked AS (
        |  SELECT pri, m, cents,
        |    CAST(row_number() OVER (PARTITION BY pri, m
        |      ORDER BY cents, o_orderkey) AS BIGINT) AS r,
        |    CAST(count(*) OVER (PARTITION BY pri, m) AS BIGINT) AS n
        |  FROM rows_),
        |sel AS (
        |  SELECT pri, m, cents, r,
        |    r - CAST(coalesce(lag(r) OVER (PARTITION BY pri, m
        |      ORDER BY r), 0) AS BIGINT) AS w
        |  FROM ranked
        |  WHERE (r * 32) // n > ((r - 1) * 32) // n),
        |tot AS (SELECT pri, CAST(count(*) AS BIGINT) AS n_rows
        |        FROM rows_ GROUP BY pri),
        |est AS (
        |  SELECT pri, n_rows, min(cents) AS est_median_cents
        |  FROM (SELECT sel.pri, sel.cents, tot.n_rows,
        |          CAST(SUM(w) OVER (PARTITION BY sel.pri
        |            ORDER BY cents, m, r
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS cum
        |        FROM sel JOIN tot ON sel.pri = tot.pri)
        |  WHERE cum * 2 >= n_rows GROUP BY pri, n_rows),
        |g AS (SELECT pri, cents, CAST(count(*) AS BIGINT) AS gw
        |      FROM rows_ GROUP BY pri, cents),
        |ex AS (
        |  SELECT pri, min(cents) AS exact_median_cents
        |  FROM (SELECT g.pri, g.cents, tot.n_rows,
        |          CAST(SUM(gw) OVER (PARTITION BY g.pri ORDER BY cents
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS cum
        |        FROM g JOIN tot ON g.pri = tot.pri)
        |  WHERE cum * 2 >= n_rows GROUP BY pri)
        |SELECT est.pri, est.n_rows, est.est_median_cents,
        |  ex.exact_median_cents,
        |  (1000 * abs(est_median_cents - exact_median_cents))
        |    // exact_median_cents AS err_permille
        |FROM est JOIN ex ON est.pri = ex.pri
        |ORDER BY est.pri""".stripMargin,

    "source_minhash_sim" -> {
      val mins = (0 until 16).map(p =>
        s"min((h0 * ${2 * p + 3} + $p) % 4503599627370496) AS mh$p")
        .mkString(",\n        |    ")
      val matches = (0 until 16).map(p =>
        s"CASE WHEN a.mh$p = b.mh$p THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH sh AS (
         |  SELECT source,
         |    CAST(('0x' || substr(md5(s), 1, 13)) AS BIGINT) AS h0
         |  FROM (
         |    SELECT source, unnest(
         |      CASE WHEN len(toks) >= 3
         |        THEN list_distinct(list_transform(range(1, len(toks)-1),
         |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         |        ELSE []::VARCHAR[] END) AS s
         |    FROM (SELECT source, regexp_extract_all(lower(text), '\\S+') AS toks
         |          FROM documents))),
         |sig AS (
         |  SELECT source,
         |    $mins
         |  FROM sh GROUP BY source)
         |SELECT a.source AS sa, b.source AS sb,
         |  CAST($matches AS BIGINT) AS n_match,
         |  (1000 * ($matches)) // 16 AS est_permille
         |FROM sig a JOIN sig b ON a.source < b.source
         |ORDER BY sa, sb""".stripMargin
    },

    "key_skew_profile" ->
      """WITH freq AS (
        |  SELECT o_custkey, count(*) AS f FROM orders GROUP BY o_custkey)
        |SELECT CAST(length(bin(f)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(f) AS BIGINT) AS n_rows,
        |  CAST(max(f) AS BIGINT) AS max_f
        |FROM freq GROUP BY 1 ORDER BY bucket""".stripMargin,

    "pit_feature_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts, event_id,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |runs AS (
        |  SELECT user_id, event_type AS status, ts, event_id FROM (
        |    SELECT user_id, event_type, ts, event_id,
        |      lag(event_type) OVER w AS p
        |    FROM ev WHERE event_type <> 'purchase'
        |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |  WHERE p IS NULL OR p <> status),
        |dim AS (
        |  SELECT user_id, status, ts AS vf,
        |    coalesce(lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id), 9223372036854775807) AS vt
        |  FROM runs)
        |SELECT d.status, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(f.v * 100) AS BIGINT) AS cents
        |FROM (SELECT user_id, ts, v FROM ev
        |      WHERE event_type = 'purchase') f
        |JOIN dim d ON d.user_id = f.user_id
        |  AND f.ts >= d.vf AND f.ts < d.vt
        |GROUP BY d.status ORDER BY d.status""".stripMargin,

    "capped_sample_by_lang" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |        AS BIGINT), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN rn <= 100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN rn <= 100 THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS kept_id_sum
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,

    "attribution_linear" -> {
      val channels = Seq("click", "error", "signup", "view")
      val cnts = channels.map(t =>
        s"""SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)
           |      OVER w AS c_$t""".stripMargin).mkString(",\n    ")
      val tot = channels.map(t => s"c_$t").mkString(" + ")
      val sums = channels.map(t =>
        s"SUM(CASE WHEN tot > 0 THEN (cents * 1000 * c_$t) // tot " +
          s"ELSE 0 END) AS m_$t").mkString(",\n  ")
      val rows = (channels.map(t => s"SELECT '$t' AS channel, m_$t AS millicents FROM agg") :+
        "SELECT 'direct', m_direct FROM agg").mkString("\n  UNION ALL ")
      s"""WITH base AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM events),
         |cnt AS (
         |  SELECT user_id, event_type, cents,
         |    $cnts
         |  FROM base
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         |p AS (
         |  SELECT *, $tot AS tot FROM cnt WHERE event_type = 'purchase'),
         |agg AS (
         |  SELECT
         |  $sums,
         |  SUM(CASE WHEN tot = 0 THEN cents * 1000 ELSE 0 END) AS m_direct
         |  FROM p)
         |SELECT channel, CAST(millicents AS BIGINT) AS millicents FROM (
         |  $rows)
         |ORDER BY channel""".stripMargin
    },

    "hll_union_custkeys" ->
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS exact_cust,
        |  COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
        |  true AS approx_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "dup_rate_by_source" ->
      """WITH fps AS (
        |  SELECT doc_id, source,
        |    md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |        1, 60)) AS fp
        |  FROM documents),
        |marked AS (
        |  SELECT source, doc_id,
        |    min(doc_id) OVER (PARTITION BY fp) AS rep
        |  FROM fps)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN doc_id > rep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dups,
        |  CAST((1000 * SUM(CASE WHEN doc_id > rep THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS dup_permille
        |FROM marked GROUP BY source ORDER BY source""".stripMargin
  )
}
