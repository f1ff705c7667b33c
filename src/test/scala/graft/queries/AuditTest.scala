package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force cross-checks for the round-10 audit pack: each query is
  * recomputed on the driver from the same sf0.001 parquet with naive
  * scala collections — an independent check the mirrored DuckDB oracle
  * cannot provide (a shared SQL mistake passes the oracle but fails
  * here).
  */
class AuditTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("fk_integrity_audit equals naive orphan counts on every edge") {
    def keys(table: String, col: String): Seq[Long] =
      graft.Tables.table(spark, sf, table).select(col).collect()
        .map(_.get(0).toString.toLong).toSeq
    val edges = Seq(
      ("customer.nation", keys("customer", "c_nationkey"), keys("nation", "n_nationkey")),
      ("lineitem.orders", keys("lineitem", "l_orderkey"), keys("orders", "o_orderkey")),
      ("lineitem.part", keys("lineitem", "l_partkey"), keys("part", "p_partkey")),
      ("lineitem.supplier", keys("lineitem", "l_suppkey"), keys("supplier", "s_suppkey")),
      ("nation.region", keys("nation", "n_regionkey"), keys("region", "r_regionkey")),
      ("orders.customer", keys("orders", "o_custkey"), keys("customer", "c_custkey")),
      ("supplier.nation", keys("supplier", "s_nationkey"), keys("nation", "n_nationkey")))
    val expected = edges.map { case (name, child, parent) =>
      val kept = parent.filter(k => k % 97 != 13).toSet
      val orphanRows = child.filterNot(kept.contains)
      (name, child.size.toLong, orphanRows.distinct.size.toLong,
        orphanRows.size.toLong)
    }
    val out = rows("fk_integrity_audit")
    assert(out.length == 7)
    out.zip(expected).foreach { case (r, (name, cr, ok, orows)) =>
      assert(r.getAs[String]("edge") == name)
      assert(r.getAs[Long]("child_rows") == cr, name)
      assert(r.getAs[Long]("orphan_keys") == ok, name)
      assert(r.getAs[Long]("orphan_rows") == orows, name)
    }
    // Non-vacuity: the deterministic lost-parent slice must produce
    // orphans somewhere, or the audit tests nothing.
    assert(expected.map(_._4).sum > 0)
  }

  test("assoc_rules_conf equals brute-force directed rules") {
    val op = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val supp = op.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val pairCnt = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2)
    val expected = pairCnt.toSeq.flatMap { case ((a, b), sab) =>
      Seq((a, b, sab, supp(a)), (b, a, sab, supp(b)))
    }.map { case (ante, cons, sab, sa) =>
      (ante, cons, sab, sa, 1000 * sab / sa)
    }.filter(_._5 >= 100).sortBy(t => (t._1, t._2))
    val out = rows("assoc_rules_conf")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (ante, cons, sab, sa, conf)) =>
      assert(r.getAs[Long]("antecedent") == ante)
      assert(r.getAs[Long]("consequent") == cons)
      assert(r.getAs[Long]("s_ab") == sab)
      assert(r.getAs[Long]("s_ante") == sa)
      assert(r.getAs[Long]("conf_permille") == conf)
    }
  }

  test("band_join_parts equals the naive theta join") {
    val parts = graft.Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        (BigDecimal(r.getDouble(3)).setScale(2) * 100).toLongExact))
    val expected = (for {
      a <- parts; b <- parts
      if a._3 == b._3 && a._1 < b._1 && a._2 != b._2 &&
        math.abs(a._4 - b._4) <= 50
    } yield {
      val lo = if (a._2 < b._2) a._2 else b._2
      val hi = if (a._2 < b._2) b._2 else a._2
      (lo, hi)
    }).groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val out = rows("band_join_parts")
    assert(out.length == expected.length)
    assert(expected.nonEmpty) // vacuity guard
    out.zip(expected).foreach { case (r, (lo, hi, n)) =>
      assert(r.getAs[String]("brand_lo") == lo)
      assert(r.getAs[String]("brand_hi") == hi)
      assert(r.getAs[Long]("n_pairs") == n)
    }
  }

  test("dow_seasonality equals naive epoch-day arithmetic") {
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderdate", "o_totalprice").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate.toEpochDay % 7,
        (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact))
    val total = orders.size.toLong
    val expected = orders.groupBy(_._1).map { case (dow, xs) =>
      (dow, xs.size.toLong, xs.map(_._2).sum,
        7000L * xs.size / total)
    }.toSeq.sortBy(_._1)
    val out = rows("dow_seasonality")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (dow, n, cents, perm)) =>
      assert(r.getAs[Long]("dow") == dow)
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Long]("revenue_cents") == cents)
      assert(r.getAs[Long]("traffic_permille") == perm)
    }
  }

  test("domain_diversity equals naive Simpson arithmetic") {
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (srcName, xs) =>
      (srcName, xs.size.toLong, xs.map(_._2).sum)
    }.toSeq
    def simpson(cs: Seq[Long]): (Long, Long, Long, Long) = {
      val total = cs.map(BigInt(_)).sum
      val sq = cs.map(c => BigInt(c) * BigInt(c)).sum
      (cs.size.toLong, total.toLong,
        ((BigInt(1000000) * sq) / (total * total)).toLong,
        ((BigInt(1000) * total * total) / sq).toLong)
    }
    val expected = Seq(
      ("chars", simpson(bySrc.map(_._3))),
      ("docs", simpson(bySrc.map(_._2))))
    val out = rows("domain_diversity")
    assert(out.length == 2)
    out.zip(expected).foreach { case (r, (m, (n, tot, ppm, eff))) =>
      assert(r.getAs[String]("metric") == m)
      assert(r.getAs[Long]("n_sources") == n)
      assert(r.getAs[Long]("total") == tot)
      assert(r.getAs[Long]("simpson_ppm") == ppm)
      assert(r.getAs[Long]("effective_sources_x1000") == eff)
    }
  }
}
