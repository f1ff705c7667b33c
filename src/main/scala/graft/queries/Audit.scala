package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables._
import Util._

/** Round-10 audit pack: the whole-warehouse integrity and policy checks a
  * platform team runs BEFORE trusting any downstream query — referential
  * integrity across every FK edge in one artifact, directed association
  * rules (the Apriori rule-generation step over the basket projection),
  * a bucketed numeric band join (the non-equi-join scale pattern), a
  * calendar seasonality profile, and a Simpson effective-domain diversity
  * index for mixing policy. House rules: exact integer/decimal arithmetic
  * at every oracle boundary, every query ends in a total order, no UDFs.
  *
  * The reference's integrity posture is per-feed anti-joins
  * (reference: src/integrator.py:61-87, one "missing" frame per entity);
  * `fk_integrity_audit` generalizes that to the full FK graph in one
  * relation, the way a warehouse-wide DQ dashboard needs it.
  */
object Audit {

  /** Deterministic parent-corruption slice for the FK audit: parents with
    * key % 97 == 13 are treated as lost (a ~1% deterministic "bad feed"
    * at every scale), so the audit exercises nonzero orphan counts at
    * gate scale — an all-zero audit row would be a vacuous gate (the
    * dup_rate_by_source lesson from round 9).
    */
  private val LOST = "% 97 = 13"

  /** One FK edge: group the child by its key (counts reduce map-side),
    * left-join the surviving parent key dictionary, and fold totals AND
    * orphan counts out of that single joined pass — child_rows is the
    * sum of per-key weights, so no second child scan exists anywhere.
    * At 100 TB the join runs over the key dictionary while row counts
    * ride along as weights; parent sides are key projections of
    * dimension scans and AQE broadcasts the small ones.
    */
  private def fkEdge(edge: String, child: DataFrame, childKey: String,
                     parent: DataFrame, parentKey: String): DataFrame = {
    val keyed = child.groupBy(col(childKey).cast("long").as("k"))
      .agg(count(lit(1)).as("n_rows"))
    val kept = parent
      .filter(expr(s"NOT ($parentKey $LOST)"))
      .select(col(parentKey).cast("long").as("k"), lit(1).as("present"))
    keyed.join(kept, Seq("k"), "left")
      .agg(sum(col("n_rows")).as("child_rows"),
        count(when(col("present").isNull, 1)).as("orphan_keys"),
        coalesce(sum(when(col("present").isNull, col("n_rows"))), lit(0L))
          .as("orphan_rows"))
      .select(lit(edge).as("edge"), col("child_rows"),
        col("orphan_keys"), col("orphan_rows"))
  }

  def queries: Map[String, Q] = Map(
    // Referential integrity over the FULL FK graph in one relation: per
    // edge, total child rows plus orphaned keys/rows against a parent
    // set with a deterministic ~1% "lost feed" slice removed (so the
    // audit is exercised, not vacuous). Each edge is a map-side-reduced
    // key histogram anti-joined against the parent key dictionary —
    // never a row-level join — and the seven edges union into one
    // 7-row artifact. At 100 TB each edge's cost is one child scan +
    // one key-dictionary join; dimensions broadcast, and the one fact
    // table with three outgoing edges (lineitem) is scanned ONCE — its
    // 3-key projection is persisted and all three edges read the cache
    // (ScanAudit held this query at lineitem x6 before the fold-and-
    // share rewrite; x1 after).
    "fk_integrity_audit" -> ((s, dir) => {
      val li = lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val edges = Seq(
        fkEdge("customer.nation", customer(s, dir), "c_nationkey",
          nation(s, dir), "n_nationkey"),
        fkEdge("lineitem.orders", li, "l_orderkey",
          orders(s, dir), "o_orderkey"),
        fkEdge("lineitem.part", li, "l_partkey",
          part(s, dir), "p_partkey"),
        fkEdge("lineitem.supplier", li, "l_suppkey",
          supplier(s, dir), "s_suppkey"),
        fkEdge("nation.region", nation(s, dir), "n_regionkey",
          region(s, dir), "r_regionkey"),
        fkEdge("orders.customer", orders(s, dir), "o_custkey",
          customer(s, dir), "c_custkey"),
        fkEdge("supplier.nation", supplier(s, dir), "s_nationkey",
          nation(s, dir), "n_nationkey"))
      edges.reduce(_ unionByName _).orderBy(col("edge"))
    }),

    // Directed association rules — the Apriori rule-generation step the
    // symmetric basket_pairs stops short of: from the same distinct
    // (order, part) projection, emit BOTH directions a→b with
    // confidence_permille = 1000·s_ab/s_a, gated on support ≥ 2 and
    // confidence ≥ 100 (10%). The pair space is in-order items squared
    // (bounded by basket size), counts reduce map-side, and the
    // direction split is a union of two projections of ONE joined
    // aggregate — the pair table is computed once and persisted.
    "assoc_rules_conf" -> ((s, dir) => {
      val op = lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val supp = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("sp"))
      val pairs = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
        .join(op.select(col("l_orderkey"), col("l_partkey").as("pb")),
          "l_orderkey")
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("s_ab"))
        .filter(col("s_ab") >= 2)
        .join(supp.select(col("l_partkey").as("pa"), col("sp").as("s_a")), "pa")
        .join(supp.select(col("l_partkey").as("pb"), col("sp").as("s_b")), "pb")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val fwd = pairs.select(col("pa").as("antecedent"),
        col("pb").as("consequent"), col("s_ab"), col("s_a").as("s_ante"))
      val rev = pairs.select(col("pb").as("antecedent"),
        col("pa").as("consequent"), col("s_ab"), col("s_b").as("s_ante"))
      fwd.unionByName(rev)
        .withColumn("conf_permille", expr("(1000 * s_ab) div s_ante"))
        .filter(col("conf_permille") >= 100)
        .orderBy(col("antecedent"), col("consequent"))
    }),

    // Numeric band join via bucketing — the scale pattern for non-equi
    // joins: substitutable-part pairs (same size, retail price within
    // ±$0.50, different brands) counted per brand pair. The naive form
    // is a theta join (quadratic); here each part lands in a 50-cent
    // price bucket, the probe side expands to its 3 candidate buckets
    // (b-1, b, b+1 — each true pair matched exactly once because the
    // build side keeps its exact bucket), and the join is equi on
    // (size, bucket) so it hashes and AQE-balances like any FK join.
    // Output is brand-pair counts: 25 brands → ≤300 rows at any scale.
    // The projected part table is persisted so probe and build read one
    // scan.
    "band_join_parts" -> ((s, dir) => {
      val p = part(s, dir).select(col("p_partkey"), col("p_brand"),
          col("p_size"),
          expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        .withColumn("bucket", expr("cents div 50"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val probe = p.select(col("p_partkey").as("ka"), col("p_brand").as("ba"),
          col("p_size"), col("cents").as("ca"),
          explode(array(col("bucket") - 1, col("bucket"),
            col("bucket") + 1)).as("bucket"))
      val build = p.select(col("p_partkey").as("kb"), col("p_brand").as("bb"),
        col("p_size"), col("cents").as("cb"), col("bucket"))
      probe.join(build, Seq("p_size", "bucket"))
        .filter(col("ka") < col("kb") && col("ba") =!= col("bb") &&
          abs(col("ca") - col("cb")) <= 50)
        .groupBy(least(col("ba"), col("bb")).as("brand_lo"),
          greatest(col("ba"), col("bb")).as("brand_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("brand_lo"), col("brand_hi"))
    }),

    // Calendar seasonality profile in exact integers: orders and revenue
    // cents per day-of-week, with each day's traffic as a permille of
    // the uniform expectation (7000·n_d/total — 1000 = flat). Dow is
    // days-since-epoch mod 7 (0 = Thursday, 1970-01-01) — identical
    // integer arithmetic on both engines, no locale-dependent dayofweek
    // numbering. One scan, one 7-group aggregate, one broadcast total.
    "dow_seasonality" -> ((s, dir) => {
      val byDow = orders(s, dir)
        .groupBy(pmod(datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")), lit(7)).cast("long").as("dow"))
        .agg(count(lit(1)).as("n_orders"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)" +
            " AS BIGINT)").as("revenue_cents"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val tot = byDow.agg(sum(col("n_orders")).as("t"))
      byDow.crossJoin(broadcast(tot))
        .select(col("dow"), col("n_orders"), col("revenue_cents"),
          expr("(7000 * n_orders) div t").as("traffic_permille"))
        .orderBy(col("dow"))
    }),

    // Simpson diversity of the corpus mix, exact: per weighting (docs,
    // chars), the concentration sum Σcᵢ² over the squared total, as
    // simpson_ppm (10⁶·Σcᵢ²/N² — higher = more concentrated) and the
    // effective source count ×1000 (N²/Σcᵢ² — "how many equal-sized
    // domains is this mix worth"), the number a mixing recipe actually
    // compares against its target. One scan, one source-group aggregate
    // (catalog-bounded), squares in decimal(38,0) so 100-TB char counts
    // cannot overflow.
    "domain_diversity" -> ((s, dir) => {
      val bySrc = documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      def one(metric: String, c: String): DataFrame =
        bySrc.agg(count(lit(1)).as("n_sources"),
            expr(s"sum(CAST($c AS DECIMAL(38,0)))").as("total"),
            expr(s"sum(CAST($c AS DECIMAL(38,0)) * CAST($c AS DECIMAL(38,0)))")
              .as("sq"))
          .select(lit(metric).as("metric"),
            col("n_sources"),
            col("total").cast("long").as("total"),
            expr("CAST((1000000 * sq) div (total * total) AS BIGINT)")
              .as("simpson_ppm"),
            expr("CAST((1000 * total * total) div sq AS BIGINT)")
              .as("effective_sources_x1000"))
      one("chars", "chars").unionByName(one("docs", "docs"))
        .orderBy(col("metric"))
    })
  )

  def oracles: Map[String, String] = Map(
    "fk_integrity_audit" -> {
      def edge(name: String, child: String, ck: String,
               parent: String, pk: String): String =
        s"""SELECT '$name' AS edge,
           |  (SELECT count(*) FROM $child) AS child_rows,
           |  CAST(count(*) AS BIGINT) AS orphan_keys,
           |  CAST(coalesce(sum(n_rows), 0) AS BIGINT) AS orphan_rows
           |FROM (SELECT CAST($ck AS BIGINT) AS k, count(*) AS n_rows
           |      FROM $child GROUP BY 1) c
           |WHERE NOT EXISTS (SELECT 1 FROM $parent
           |                  WHERE NOT ($pk % 97 = 13)
           |                    AND CAST($pk AS BIGINT) = c.k)""".stripMargin
      Seq(
        edge("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("lineitem.orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
        edge("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    "assoc_rules_conf" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |supp AS (SELECT l_partkey, count(*) AS sp FROM op GROUP BY 1),
        |pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS s_ab
        |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |joined AS (
        |  SELECT p.pa, p.pb, p.s_ab, sa.sp AS s_a, sb.sp AS s_b
        |  FROM pairs p
        |  JOIN supp sa ON sa.l_partkey = p.pa
        |  JOIN supp sb ON sb.l_partkey = p.pb),
        |rules AS (
        |  SELECT pa AS antecedent, pb AS consequent, s_ab, s_a AS s_ante
        |  FROM joined
        |  UNION ALL
        |  SELECT pb, pa, s_ab, s_b FROM joined)
        |SELECT antecedent, consequent, CAST(s_ab AS BIGINT) AS s_ab,
        |  CAST(s_ante AS BIGINT) AS s_ante,
        |  (1000 * s_ab) // s_ante AS conf_permille
        |FROM rules
        |WHERE (1000 * s_ab) // s_ante >= 100
        |ORDER BY antecedent, consequent""".stripMargin,

    "band_join_parts" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, p_size,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM part)
        |SELECT least(a.p_brand, b.p_brand) AS brand_lo,
        |  greatest(a.p_brand, b.p_brand) AS brand_hi,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p a JOIN p b
        |  ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        |  AND a.p_brand <> b.p_brand AND abs(a.cents - b.cents) <= 50
        |GROUP BY 1, 2
        |ORDER BY brand_lo, brand_hi""".stripMargin,

    "dow_seasonality" ->
      """WITH d AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01',
        |           CAST(o_orderdate AS DATE)) % 7 AS BIGINT) AS dow,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |      AS revenue_cents
        |  FROM orders GROUP BY 1)
        |SELECT dow, CAST(n_orders AS BIGINT) AS n_orders, revenue_cents,
        |  CAST((7000 * n_orders) // (SELECT sum(n_orders) FROM d) AS BIGINT)
        |    AS traffic_permille
        |FROM d ORDER BY dow""".stripMargin,

    "domain_diversity" ->
      """WITH s AS (
        |  SELECT source, count(*) AS docs, sum(n_chars) AS chars
        |  FROM documents GROUP BY 1),
        |m AS (
        |  SELECT 'chars' AS metric, count(*) AS n_sources,
        |    sum(CAST(chars AS HUGEINT)) AS total,
        |    sum(CAST(chars AS HUGEINT) * CAST(chars AS HUGEINT)) AS sq
        |  FROM s
        |  UNION ALL
        |  SELECT 'docs', count(*), sum(CAST(docs AS HUGEINT)),
        |    sum(CAST(docs AS HUGEINT) * CAST(docs AS HUGEINT))
        |  FROM s)
        |SELECT metric, CAST(n_sources AS BIGINT) AS n_sources,
        |  CAST(total AS BIGINT) AS total,
        |  CAST((1000000 * sq) // (total * total) AS BIGINT) AS simpson_ppm,
        |  CAST((1000 * total * total) // sq AS BIGINT)
        |    AS effective_sources_x1000
        |FROM m ORDER BY metric""".stripMargin
  )
}
