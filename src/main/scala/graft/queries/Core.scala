package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.operators.{CleanSpec, Diff}
import graft.functions.Terms
import Util._

/** Reference-surface queries: clean/conform, diff/sync, term algebra, FK
  * join chains (SURVEY §2.2, §2.3, §2.4 A3).
  */
object Core {

  def queries: Map[String, Q] = Map(

    // A5 hash agg with partial aggregation; TPC-H Q1 shape over lineitem.
    "q1_pricing_summary" -> ((s, dir) => {
      lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (sum(d2(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1-P4, P7-P9 (CleanSpec = reference src/canvas.py:62-104 reified).
    "clean_conform" -> ((s, dir) => {
      val spec = CleanSpec(
        keep = Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
        rename = Map("c_custkey" -> "id_num", "c_name" -> "login_id"),
        filters = Seq(col("c_acctbal").isNotNull, col("c_acctbal") > 0,
          col("c_name").rlike("^Customer#[0-9]+$")),
        recodes = Map("c_mktsegment" ->
          CleanSpec.boolToSentinel(col("c_mktsegment") === "BUILDING")),
        literals = Seq(
          "yr_cde" -> lit("25"), "trm_cde" -> lit("1S"),
          "load_date" -> to_date(lit("2026-01-01"))))
      spec(customer(s, dir)).orderBy(col("id_num"))
    }),

    // J2: MissingFacultyUsers (reference src/jenzabar.py:52, output
    // contract tests/test_connect.py:117-124) — ERP faculty (stand-in:
    // supplier) with no Canvas mirror row, shaped as the users upload:
    // id_num / canvas_user / login_id / load_date, demo accounts
    // excluded (the reference pins login_id never contains "sdemo").
    "missing_faculty_users" -> ((s, dir) => {
      val truth = supplier(s, dir).filter(!col("s_name").contains("sdemo"))
      val mirror = supplier(s, dir).filter(col("s_suppkey") % 10 =!= 0)
      Diff.missingRows(truth, mirror, Seq("s_suppkey"))
        .select(col("s_suppkey").as("id_num"),
          (col("s_suppkey") + 900000L).as("canvas_user"),
          col("s_name").as("login_id"),
          to_date(lit("2026-01-01")).as("load_date"))
        .orderBy(col("id_num"))
    }),

    // J3: MissingStudentUsers (src/jenzabar.py:53) — same users contract,
    // student role (stand-in: customer).
    "missing_student_users" -> ((s, dir) => {
      val truth = customer(s, dir).filter(!col("c_name").contains("sdemo"))
      val mirror = customer(s, dir).filter(col("c_custkey") % 11 =!= 0)
      Diff.missingRows(truth, mirror, Seq("c_custkey"))
        .select(col("c_custkey").as("id_num"),
          (col("c_custkey") + 100000L).as("canvas_user"),
          col("c_name").as("login_id"),
          to_date(lit("2026-01-01")).as("load_date"))
        .orderBy(col("id_num"))
    }),

    // J4: MissingCourses (src/jenzabar.py:54, contract
    // tests/test_connect.py:127-137): yr_cde / trm_cde / crs_cde /
    // canvas_course_id / load_date / status (stand-in: part).
    "missing_courses" -> ((s, dir) => {
      val truth = part(s, dir)
      val mirror = part(s, dir).filter(col("p_partkey") % 8 =!= 0)
      Diff.missingRows(truth, mirror, Seq("p_partkey"))
        .select(lit("25").as("yr_cde"), lit("1S").as("trm_cde"),
          concat(lit("CRS"), col("p_partkey")).as("crs_cde"),
          col("p_partkey").as("canvas_course_id"),
          to_date(lit("2026-01-01")).as("load_date"),
          lit("active").as("status"))
        .orderBy(col("canvas_course_id"))
    }),

    // J5: MissingSections (src/jenzabar.py:55, contract
    // tests/test_connect.py:140-151): the 10-column sections upload incl.
    // the created_by_sis BIT sentinel (stand-in: orders as sections of
    // their o_custkey-derived course).
    "missing_sections" -> ((s, dir) => {
      val truth = orders(s, dir)
      val mirror = orders(s, dir).filter(col("o_orderkey") % 12 =!= 0)
      Diff.missingRows(truth, mirror, Seq("o_orderkey"))
        .select(lit("25").as("yr_cde"), lit("1S").as("trm_cde"),
          concat(lit("CRS"), col("o_orderkey") % 2000L).as("crs_cde"),
          col("o_orderkey").as("section_id"),
          concat(lit("Section "), col("o_orderkey")).as("name"),
          when(col("o_orderstatus") === "O", "active").otherwise("concluded")
            .as("status"),
          col("o_custkey").as("account_id"),
          (col("o_orderkey") + 500000L).as("canvas_section_id"),
          CleanSpec.boolToSentinel(col("o_orderstatus") === "F")
            .as("created_by_sis"),
          to_date(lit("2026-01-01")).as("load_date"))
        .orderBy(col("section_id"))
    }),

    // J2-J5 generic shape: anti-join "missing rows" on the raw fact.
    "missing_orders" -> ((s, dir) => {
      val truth = orders(s, dir)
      val mirror = orders(s, dir).filter(col("o_orderkey") % 10 =!= 0)
      Diff.missingRows(truth, mirror, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // MERGE upsert pipeline: changeSet detects the day's churn (inserts,
    // updates, deletes) against yesterday's mirror; applyChanges folds it
    // back in. The synthetic mirror has all three churn classes: keys
    // %10==3 missing (inserts), %10==5 stale-priced (updates), plus
    // retired negative-key rows (deletes). The oracle is the FULL
    // RECOMPUTE — plain truth — so a hash match proves the incremental
    // path reproduces truncate-reload exactly without rewriting the
    // mirror.
    "mirror_apply" -> ((s, dir) => {
      // persisted: truth feeds the 3 mirror branches, the change set,
      // and the merge (ScanAudit: orders x11) — in production these are
      // two distinct tables; the harness derives both from one scan
      val truth = orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mirror = truth.filter(col("o_orderkey") % 10 =!= 3)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 5, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .unionByName(truth.filter(col("o_orderkey") % 10 === 7)
          .withColumn("o_orderkey", -col("o_orderkey")))
      val changes = Diff.changeSet(truth, mirror, Seq("o_orderkey"))
      Diff.applyChanges(mirror, changes, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // The change set itself, oracle-gated: churn-proportional output
    // (only keys %10 in {3,5} as upserts and the retired negative keys
    // as deletes — identical rows produce nothing).
    "mirror_changeset" -> ((s, dir) => {
      val truth = orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val mirror = truth.filter(col("o_orderkey") % 10 =!= 3)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 5, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .unionByName(truth.filter(col("o_orderkey") % 10 === 7)
          .withColumn("o_orderkey", -col("o_orderkey")))
      Diff.changeSet(truth, mirror, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // J6: symmetric diff with status derivation (DailyEnrollment).
    "daily_enrollment_diff" -> ((s, dir) => {
      val truth = lineitem(s, dir).filter(col("l_quantity") <= 45)
      val mirror = lineitem(s, dir).filter(col("l_discount") < 0.09)
      Diff.changedRows(truth, mirror, Seq("l_orderkey", "l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // A3: per-entity change statistics over a diff.
    "change_stats" -> ((s, dir) => {
      val truth = lineitem(s, dir).filter(col("l_quantity") <= 45)
      val mirror = lineitem(s, dir).filter(col("l_discount") < 0.09)
      val diff = Diff.changedRows(truth, mirror, Seq("l_orderkey", "l_linenumber"))
      Diff.changeStats(diff, "Enrollment").orderBy(col("entity"), col("status"))
    }),

    // J7: CtlLibrary* — the org-unit-scoped anti-join (a missing-rows
    // diff restricted to one organizational subset; reference
    // src/jenzabar.py:57-58). "Library" stand-in: BRASS-type parts.
    "ctl_library_missing" -> ((s, dir) => {
      val library = part(s, dir).filter(col("p_type").contains("BRASS"))
      val mirror = library.filter(col("p_partkey") % 7 =!= 0)
      Diff.missingRows(library, mirror, Seq("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))
    }),

    // F1-F4: term decompose / pack / increment over a derived term dim.
    "term_increment" -> ((s, dir) => {
      orders(s, dir)
        .select(
          date_format(col("o_orderdate"), "yy").as("yr_cde"),
          when(month(col("o_orderdate")) <= 6, "1S").otherwise("2S").as("trm_cde"))
        .distinct()
        .withColumn("term", Terms.packTerm(col("yr_cde"), col("trm_cde")))
        .withColumn("next_term", Terms.nextTerm(col("yr_cde"), col("trm_cde")))
        .orderBy(col("yr_cde"), col("trm_cde"))
    }),

    // J1 + J8: broadcast dim lookup and FK inner-join chain; revenue per
    // region/nation. Dim side (region ⋈ nation) is broadcast; the big
    // fact join shuffles once on the FK.
    "q5_region_revenue" -> ((s, dir) => {
      val geo = nation(s, dir).join(region(s, dir),
        col("n_regionkey") === col("r_regionkey"))
      val cust = Diff.dimLookup(customer(s, dir), geo, "c_nationkey", "n_nationkey",
        "inner")
      val fact = lineitem(s, dir)
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
      fact.groupBy(col("r_name"), col("n_name"))
        .agg(
          revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // J8 left_semi: customers with at least one finalized order.
    "semi_join_customers" -> ((s, dir) => {
      customer(s, dir)
        .join(orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Bloom-gated exact semi join: "new-batch" orders (orderkey % 10 >=
    // 8) from customers already seen in the base slice. The bloom
    // pre-filter (operators/BloomGate.scala) cuts never-seen keys before
    // the semi-join shuffle; the verify join makes the result exact, so
    // the oracle is the plain EXISTS with no bloom anywhere.
    "bloom_semi_orders" -> ((s, dir) => {
      val o = orders(s, dir)
      graft.operators.BloomGate.semiJoin(
        probe = o.filter(col("o_orderkey") % 10 >= 8),
        build = o.filter(col("o_orderkey") % 10 < 8)
          .select(col("o_custkey")),
        key = "o_custkey",
        expectedItems = 100000L, numBits = 800000L)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    })
  )

  def oracles: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "clean_conform" ->
      """SELECT c_custkey AS id_num, c_name AS login_id,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN -1 ELSE 0 END AS c_mktsegment,
        |  c_acctbal,
        |  '25' AS yr_cde, '1S' AS trm_cde, DATE '2026-01-01' AS load_date
        |FROM customer
        |WHERE c_acctbal IS NOT NULL AND c_acctbal > 0
        |  AND regexp_matches(c_name, '^Customer#[0-9]+$')
        |ORDER BY id_num""".stripMargin,

    "missing_faculty_users" ->
      """SELECT s_suppkey AS id_num, s_suppkey + 900000 AS canvas_user,
        |  s_name AS login_id, DATE '2026-01-01' AS load_date
        |FROM supplier t
        |WHERE t.s_name NOT LIKE '%sdemo%'
        |  AND NOT EXISTS (SELECT 1 FROM supplier m
        |    WHERE m.s_suppkey % 10 <> 0 AND m.s_suppkey = t.s_suppkey)
        |ORDER BY id_num""".stripMargin,

    "missing_student_users" ->
      """SELECT c_custkey AS id_num, c_custkey + 100000 AS canvas_user,
        |  c_name AS login_id, DATE '2026-01-01' AS load_date
        |FROM customer t
        |WHERE t.c_name NOT LIKE '%sdemo%'
        |  AND NOT EXISTS (SELECT 1 FROM customer m
        |    WHERE m.c_custkey % 11 <> 0 AND m.c_custkey = t.c_custkey)
        |ORDER BY id_num""".stripMargin,

    "missing_courses" ->
      """SELECT '25' AS yr_cde, '1S' AS trm_cde,
        |  'CRS' || p_partkey AS crs_cde,
        |  p_partkey AS canvas_course_id,
        |  DATE '2026-01-01' AS load_date, 'active' AS status
        |FROM part t
        |WHERE NOT EXISTS (SELECT 1 FROM part m
        |  WHERE m.p_partkey % 8 <> 0 AND m.p_partkey = t.p_partkey)
        |ORDER BY canvas_course_id""".stripMargin,

    "missing_sections" ->
      """SELECT '25' AS yr_cde, '1S' AS trm_cde,
        |  'CRS' || (o_orderkey % 2000) AS crs_cde,
        |  o_orderkey AS section_id,
        |  'Section ' || o_orderkey AS name,
        |  CASE WHEN o_orderstatus = 'O' THEN 'active' ELSE 'concluded' END AS status,
        |  o_custkey AS account_id,
        |  o_orderkey + 500000 AS canvas_section_id,
        |  CASE WHEN o_orderstatus = 'F' THEN -1 ELSE 0 END AS created_by_sis,
        |  DATE '2026-01-01' AS load_date
        |FROM orders t
        |WHERE NOT EXISTS (SELECT 1 FROM orders m
        |  WHERE m.o_orderkey % 12 <> 0 AND m.o_orderkey = t.o_orderkey)
        |ORDER BY section_id""".stripMargin,

    "missing_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders m
        |  WHERE m.o_orderkey % 10 <> 0 AND m.o_orderkey = t.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "mirror_apply" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "mirror_changeset" ->
      """WITH truth AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |mirror AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <> 3
        |  UNION ALL
        |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 7)
        |SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice,
        |  'upsert' AS op
        |FROM truth t LEFT JOIN mirror m ON t.o_orderkey = m.o_orderkey
        |WHERE m.o_orderkey IS NULL
        |   OR t.o_custkey IS DISTINCT FROM m.o_custkey
        |   OR t.o_orderstatus IS DISTINCT FROM m.o_orderstatus
        |   OR t.o_totalprice IS DISTINCT FROM m.o_totalprice
        |UNION ALL
        |SELECT m.o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |  CAST(NULL AS DOUBLE), 'delete' AS op
        |FROM mirror m LEFT JOIN truth t ON m.o_orderkey = t.o_orderkey
        |WHERE t.o_orderkey IS NULL
        |ORDER BY o_orderkey""".stripMargin,

    "daily_enrollment_diff" ->
      """WITH truth AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity <= 45),
        |     mirror AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount < 0.09)
        |SELECT t.l_orderkey, t.l_linenumber, 'active' AS status FROM truth t
        |WHERE NOT EXISTS (SELECT 1 FROM mirror m
        |  WHERE m.l_orderkey = t.l_orderkey AND m.l_linenumber = t.l_linenumber)
        |UNION ALL
        |SELECT m.l_orderkey, m.l_linenumber, 'deleted' AS status FROM mirror m
        |WHERE NOT EXISTS (SELECT 1 FROM truth t
        |  WHERE t.l_orderkey = m.l_orderkey AND t.l_linenumber = m.l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "change_stats" ->
      """WITH truth AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity <= 45),
        |     mirror AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount < 0.09),
        |     diff AS (
        |  SELECT 'active' AS status FROM truth t
        |  WHERE NOT EXISTS (SELECT 1 FROM mirror m
        |    WHERE m.l_orderkey = t.l_orderkey AND m.l_linenumber = t.l_linenumber)
        |  UNION ALL
        |  SELECT 'deleted' AS status FROM mirror m
        |  WHERE NOT EXISTS (SELECT 1 FROM truth t
        |    WHERE t.l_orderkey = m.l_orderkey AND t.l_linenumber = m.l_linenumber))
        |SELECT 'Enrollment' AS entity, status, COUNT(*) AS n
        |FROM diff GROUP BY status ORDER BY entity, status""".stripMargin,

    "ctl_library_missing" ->
      """SELECT p_partkey, p_name, p_type
        |FROM part t
        |WHERE p_type LIKE '%BRASS%'
        |  AND NOT EXISTS (
        |    SELECT 1 FROM part m
        |    WHERE m.p_type LIKE '%BRASS%' AND m.p_partkey % 7 <> 0
        |      AND m.p_partkey = t.p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "term_increment" ->
      """WITH terms AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%y') AS yr_cde,
        |    CASE WHEN month(o_orderdate) <= 6 THEN '1S' ELSE '2S' END AS trm_cde
        |  FROM orders)
        |SELECT yr_cde, trm_cde, yr_cde || trm_cde AS term,
        |  CASE WHEN trm_cde = '2S'
        |    THEN lpad(CAST(CAST(yr_cde AS INT) + 1 AS VARCHAR), 2, '0') || '1S'
        |    ELSE yr_cde || '2S' END AS next_term
        |FROM terms ORDER BY yr_cde, trm_cde""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "semi_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "bloom_semi_orders" ->
      """SELECT n.o_orderkey, n.o_custkey
        |FROM orders n
        |WHERE n.o_orderkey % 10 >= 8
        |  AND EXISTS (SELECT 1 FROM orders e
        |              WHERE e.o_orderkey % 10 < 8
        |                AND e.o_custkey = n.o_custkey)
        |ORDER BY o_orderkey""".stripMargin
  )
}
