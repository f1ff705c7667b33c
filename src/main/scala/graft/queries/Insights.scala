package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns
import graft.operators.Ivm
import Util._

/** Round-9 corpus-insight pack: the cross-cutting diagnostics a curation
  * team reads BEFORE deciding dedup/mixing policy — cross-source content
  * overlap, vocabulary novelty over ingest order, and changepoint
  * detection on the revenue series. House rules: exact integer/decimal
  * arithmetic at every oracle boundary, every query ends in a total
  * order, no UDFs.
  */
object Insights {

  /** Ingest-order slices for novelty: 10 equal doc_id ranges, computed
    * scale-relatively so replication keeps the slice count fixed.
    */
  private val N_SLICES = 10

  def queries: Map[String, Q] = Map(
    // Cross-SOURCE content overlap: exact Jaccard between each source
    // pair's distinct 3-gram shingle sets — the "which domains are
    // mirrors of each other" signal that decides whether dedup must run
    // across domain boundaries (and which domains double-count in a
    // mixing recipe). The pair space is SOURCES squared (bounded, ~20²),
    // never docs squared: the inverted index joins on shingle with
    // per-shingle fan-out capped at n_sources², and counts reduce
    // map-side. At 100 TB the same plan holds — source cardinality is a
    // catalog property, not a data property.
    "source_similarity" -> ((s, dir) => {
      val inv = documents(s, dir)
        .select(col("source"), explode(TextFns.shingleSet(col("text"), 3)).as("sh"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sizes = inv.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val inter = inv.toDF("sa", "sh")
        .join(inv.toDF("sb", "sh"), "sh")
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.toDF("sa", "sza")), "sa")
        .join(broadcast(sizes.toDF("sb", "szb")), "sb")
        .select(col("sa"), col("sb"), col("n_inter"),
          expr("(1000 * n_inter) div (sza + szb - n_inter)")
            .as("jaccard_permille"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Vocabulary novelty over ingest order: split the corpus into 10
    // equal doc_id slices and report, per slice, how many distinct
    // shingles appear and what fraction is NEW (first occurrence) — the
    // "is fresh data still adding content or just re-treading" curve
    // that decides when a crawl stops paying. First-occurrence is one
    // min-aggregate keyed by shingle; everything is exact integers.
    "novelty_by_slice" -> ((s, dir) => {
      val docs = documents(s, dir)
      val mx = docs.agg(max(col("doc_id")).as("mx"))
      val occ = docs
        .select(col("doc_id"), explode(TextFns.shingleSet(col("text"), 3)).as("sh"))
        .crossJoin(broadcast(mx))
        .select(expr(s"(doc_id * $N_SLICES) div (mx + 1)").as("slice"), col("sh"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perSlice = occ.groupBy(col("slice"))
        .agg(count(lit(1)).as("n_shingles"))
      val novel = occ.groupBy(col("sh")).agg(min(col("slice")).as("slice"))
        .groupBy(col("slice")).agg(count(lit(1)).as("n_new"))
      perSlice.join(novel, Seq("slice"), "left")
        .select(col("slice"), col("n_shingles"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("novelty_permille",
          expr("(1000 * n_new) div n_shingles"))
        .orderBy(col("slice"))
    }),

    // IVM with RETRACTIONS: the signed (bag-algebra) delta-join product
    // rule — inserts AND deletes maintain a grouped join view without
    // rescanning the base join, and groups whose multiplicity reaches
    // zero drop, keeping the maintained state bit-equal to a full
    // recompute over the post-change tables (which is exactly what the
    // oracle computes). Deterministic split: lineitem rows with
    // orderkey % 7 == 3 arrive as inserts, % 7 == 1 leave as deletes;
    // orders with orderkey % 11 == 5 arrive as dimension inserts.
    "ivm_retract_view" -> ((s, dir) => {
      // persisted: the base/delta slices of BOTH relations derive from
      // these projections (ScanAudit: lineitem x6, orders x4)
      val li = lineitem(s, dir).select(col("l_orderkey"),
        col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ord = orders(s, dir).select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a0 = li.filter(col("l_orderkey") % 7 =!= 3)
      val da = li.filter(col("l_orderkey") % 7 === 3)
        .withColumn("sign", lit(1L))
        .unionByName(li.filter(col("l_orderkey") % 7 === 1)
          .withColumn("sign", lit(-1L)))
      val b0 = ord.filter(col("l_orderkey") % 11 =!= 5)
      val db = ord.filter(col("l_orderkey") % 11 === 5)
        .withColumn("sign", lit(1L))
      Ivm.maintainJoinAggSigned(a0, da, b0, db, "l_orderkey",
          Seq("l_returnflag", "o_orderpriority"), "qty")
        .withColumnRenamed("qty", "total_qty")
        .orderBy(col("l_returnflag"), col("o_orderpriority"))
    }),

    // CUSUM changepoint on the daily-revenue series: the day where the
    // cumulative deviation from the period mean peaks in magnitude —
    // the standard "when did the level shift" detector. Everything is
    // exact: deviations are scaled by n_days (dev = cents·n − total) so
    // no division happens anywhere (floor-vs-trunc of negatives is the
    // classic engine divergence), and the output carries the scale.
    // The cumulative window is global but runs over the DAILY table —
    // bounded by the calendar (~2.4k rows), not the fact table.
    "cusum_changepoint" -> ((s, dir) => {
      val daily = orders(s, dir)
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(d2(col("o_totalprice")) * 100).cast("decimal(38,0)")
          .as("cents"))
      val tot = daily.agg(
        sum(col("cents")).cast("decimal(38,0)").as("total"),
        count(lit(1)).as("n_days"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(broadcast(tot))
        .withColumn("dev", col("cents") * col("n_days") - col("total"))
        .withColumn("s", sum(col("dev")).over(w))
        .select(col("day"), col("s"), col("n_days"))
        .orderBy(abs(col("s")).desc, col("day"))
        .limit(1)
        .select(col("day"),
          col("s").cast("long").as("cusum_scaled"),
          col("n_days"))
    }),

    // Theil–Sen trend over monthly revenue — the robust slope estimator
    // (median of all pairwise slopes; Sen 1968) that OLS-vs-outliers
    // audits need beside ols_price_on_qty. Everything stays exact: the
    // median slope is reported as the rational pair (slope_num cents,
    // slope_den months) of the median-ranked pair, never divided. The
    // DOUBLE dc/dm appears ONLY as a sort key — both inputs are exact
    // integers < 2^53 so the IEEE division is correctly rounded and
    // identical on any engine; (i, j) breaks value ties. Lower median at
    // rank (n+1) div 2 on positive ints avoids the floor-vs-trunc
    // divergence entirely. Scale shape: the pair self-join and the
    // global windows run over the MONTHLY table — bounded by the
    // calendar (~84 rows → ~3.5k pairs), never the fact table; the only
    // corpus-scale work is the one monthly hash aggregate.
    "theil_sen_trend" -> ((s, dir) => {
      // persisted: both sides of the pair self-join read the monthly
      // table — without the cache each side re-scans + re-aggregates
      // the fact table (plan-asserted in PlanShapeTest)
      val monthly = orders(s, dir)
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .as("m"))
        .agg(sum(d2(col("o_totalprice")) * 100).cast("decimal(38,0)")
          .as("cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = monthly.select(col("m").as("i"), col("cents").as("ca"))
      val b = monthly.select(col("m").as("j"), col("cents").as("cb"))
      val pairs = a.join(b, col("j") > col("i"))
        .select(col("i"), col("j"),
          (col("cb") - col("ca")).as("dc"),
          (col("j") - col("i")).as("dm"))
      val bySlope = Window.orderBy(
        (col("dc").cast("double") / col("dm")).asc, col("i"), col("j"))
      val all = Window.partitionBy()
      pairs
        .withColumn("rn", row_number().over(bySlope))
        .withColumn("n", count(lit(1)).over(all))
        .withColumn("n_up",
          sum(when(col("dc") > 0, 1L).otherwise(0L)).over(all))
        .withColumn("n_down",
          sum(when(col("dc") < 0, 1L).otherwise(0L)).over(all))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("dc").cast("long").as("slope_num"),
          col("dm").cast("long").as("slope_den"),
          col("n").as("n_pairs"), col("n_up"), col("n_down"))
    }),

    // Distribution-drift monitor — the training-data shift audit every
    // recurring ingest needs: compare the categorical distribution of a
    // column between two snapshot slices (here order priority, early
    // years vs late) as exact-integer total-variation numerators. Per
    // category the TV term is |n_early·N_late − n_late·N_early| over the
    // common denominator N_early·N_late — no division, no floats, so the
    // statistic is engine-portable and never vacuously zero (sampling
    // noise alone makes the cross-products differ). tv_total carries the
    // summed numerator; TV distance = tv_total / (2·N_early·N_late).
    // Scale shape: one hash aggregate over the fact table, then
    // category-bounded (≤5 rows) broadcast totals and windows.
    "priority_drift_tv" -> ((s, dir) => {
      // persisted: the totals aggregate and the per-category probe both
      // read buckets — the cache keeps the fact scan single
      val buckets = orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(year(col("o_orderdate")) <= 1995, 1L).otherwise(0L))
            .as("n_early"),
          sum(when(year(col("o_orderdate")) > 1995, 1L).otherwise(0L))
            .as("n_late"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = buckets.agg(sum(col("n_early")).as("t_early"),
        sum(col("n_late")).as("t_late"))
      buckets.crossJoin(broadcast(tot))
        .withColumn("tv_num",
          abs(col("n_early") * col("t_late") - col("n_late") * col("t_early")))
        .withColumn("tv_total",
          sum(col("tv_num")).over(Window.partitionBy()))
        .select(col("o_orderpriority"), col("n_early"), col("n_late"),
          col("tv_num"), col("tv_total"), col("t_early"), col("t_late"))
        .orderBy(col("o_orderpriority"))
    })
  )

  def oracles: Map[String, String] = Map(
    "source_similarity" ->
      """WITH inv AS (
        |  SELECT DISTINCT source, s FROM (
        |    SELECT source, unnest(
        |      CASE WHEN len(toks) >= 3
        |        THEN list_distinct(list_transform(range(1, len(toks)-1),
        |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |        ELSE []::VARCHAR[] END) AS s
        |    FROM (SELECT source, regexp_extract_all(lower(text), '\S+') AS toks
        |          FROM documents))),
        |sizes AS (SELECT source, count(*) AS sz FROM inv GROUP BY source),
        |inter AS (
        |  SELECT x.source AS sa, y.source AS sb, count(*) AS n_inter
        |  FROM inv x JOIN inv y ON x.s = y.s AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT i.sa, i.sb, CAST(i.n_inter AS BIGINT) AS n_inter,
        |  (1000 * i.n_inter) // (a.sz + b.sz - i.n_inter) AS jaccard_permille
        |FROM inter i
        |JOIN sizes a ON a.source = i.sa
        |JOIN sizes b ON b.source = i.sb
        |ORDER BY sa, sb""".stripMargin,

    "novelty_by_slice" ->
      s"""WITH occ AS (
         |  SELECT DISTINCT
         |    (doc_id * $N_SLICES) // ((SELECT max(doc_id) FROM documents) + 1)
         |      AS slice, s
         |  FROM (
         |    SELECT doc_id, unnest(
         |      CASE WHEN len(toks) >= 3
         |        THEN list_distinct(list_transform(range(1, len(toks)-1),
         |               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         |        ELSE []::VARCHAR[] END) AS s
         |    FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
         |          FROM documents))),
         |per_slice AS (
         |  SELECT slice, count(*) AS n_shingles FROM occ GROUP BY slice),
         |novel AS (
         |  SELECT slice, count(*) AS n_new FROM (
         |    SELECT s, min(slice) AS slice FROM occ GROUP BY s)
         |  GROUP BY slice)
         |SELECT p.slice, CAST(p.n_shingles AS BIGINT) AS n_shingles,
         |  CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
         |  (1000 * CAST(coalesce(n.n_new, 0) AS BIGINT)) // p.n_shingles
         |    AS novelty_permille
         |FROM per_slice p LEFT JOIN novel n ON n.slice = p.slice
         |ORDER BY p.slice""".stripMargin,

    // Full recompute over the post-change tables: A_post = base minus
    // deletes plus inserts = every row with orderkey % 7 <> 1 (inserts
    // are % 7 == 3, already in the complement); B_post = all orders.
    // Bit-equality of the engine's MAINTAINED state against this
    // recompute is the IVM correctness contract.
    "ivm_retract_view" ->
      """WITH a_post AS (
        |  SELECT l_orderkey, l_returnflag, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem WHERE l_orderkey % 7 <> 1)
        |SELECT l_returnflag, o_orderpriority,
        |  CAST(SUM(qty) AS BIGINT) AS total_qty
        |FROM a_post JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS HUGEINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT SUM(cents) AS total, COUNT(*) AS n_days FROM daily),
        |cur AS (
        |  SELECT day,
        |    SUM(cents * n_days - total) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
        |    n_days
        |  FROM daily, tot)
        |SELECT day, CAST(s AS BIGINT) AS cusum_scaled,
        |  CAST(n_days AS BIGINT) AS n_days
        |FROM cur ORDER BY abs(s) DESC, day LIMIT 1""".stripMargin,

    // Mirrors theil_sen_trend: monthly cents, all ordered pairs, lower
    // median by the (exact-input) double slope sort key.
    "theil_sen_trend" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS HUGEINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT a.m AS i, b.m AS j,
        |    b.cents - a.cents AS dc, b.m - a.m AS dm
        |  FROM monthly a JOIN monthly b ON b.m > a.m),
        |ranked AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY CAST(dc AS DOUBLE) / dm, i, j) AS rn,
        |    count(*) OVER () AS n,
        |    SUM(CASE WHEN dc > 0 THEN 1 ELSE 0 END) OVER () AS n_up,
        |    SUM(CASE WHEN dc < 0 THEN 1 ELSE 0 END) OVER () AS n_down
        |  FROM pairs)
        |SELECT CAST(dc AS BIGINT) AS slope_num,
        |  CAST(dm AS BIGINT) AS slope_den,
        |  CAST(n AS BIGINT) AS n_pairs,
        |  CAST(n_up AS BIGINT) AS n_up,
        |  CAST(n_down AS BIGINT) AS n_down
        |FROM ranked WHERE rn = (n + 1) // 2""".stripMargin,

    // Mirrors priority_drift_tv: exact-integer TV numerators between the
    // early/late order-priority distributions.
    "priority_drift_tv" ->
      """WITH buckets AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CASE WHEN year(o_orderdate) <= 1995 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_early,
        |    CAST(SUM(CASE WHEN year(o_orderdate) > 1995 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_late
        |  FROM orders GROUP BY o_orderpriority),
        |tot AS (SELECT CAST(SUM(n_early) AS BIGINT) AS t_early,
        |          CAST(SUM(n_late) AS BIGINT) AS t_late FROM buckets),
        |terms AS (
        |  SELECT o_orderpriority, n_early, n_late,
        |    CAST(abs(n_early * t_late - n_late * t_early) AS BIGINT) AS tv_num,
        |    t_early, t_late
        |  FROM buckets, tot)
        |SELECT o_orderpriority, n_early, n_late, tv_num,
        |  CAST(SUM(tv_num) OVER () AS BIGINT) AS tv_total, t_early, t_late
        |FROM terms ORDER BY o_orderpriority""".stripMargin
  )
}
