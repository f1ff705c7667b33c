package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Brute-force cross-checks for the round-10 robust-stats / curation
  * queries: each query's distributed formulation is recomputed on the
  * driver from the same sf0.001 parquet with naive scala collections,
  * so a wrong window frame, tie-break, or aggregate boundary fails here
  * even though the DuckDB oracle (being a mirror of the same SQL) might
  * share the mistake.
  */
class RobustStatsTest extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("theil_sen_trend equals the brute-force median of pairwise slopes") {
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderdate", "o_totalprice").collect()
    val monthly = orders.groupBy { r =>
      val d = r.getAs[java.time.LocalDateTime](0)
      d.getYear * 12 + d.getMonthValue
    }.map { case (m, rs) =>
      val cents = rs.map(r => BigDecimal(r.getDouble(1)).setScale(2) * 100)
        .sum.toBigInt
      (m, cents)
    }.toSeq.sortBy(_._1)
    val pairs = for {
      (i, ca) <- monthly; (j, cb) <- monthly if j > i
    } yield (i, j, cb - ca, j - i)
    val sorted = pairs.sortBy { case (i, j, dc, dm) =>
      (dc.toDouble / dm, i, j)
    }
    val med = sorted((pairs.size + 1) / 2 - 1)
    val nUp = pairs.count(_._3 > 0)
    val nDown = pairs.count(_._3 < 0)

    val out = rows("theil_sen_trend")
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("slope_num") == med._3.toLong)
    assert(r.getAs[Long]("slope_den") == med._4.toLong)
    assert(r.getAs[Long]("n_pairs") == pairs.size.toLong)
    assert(r.getAs[Long]("n_up") == nUp.toLong)
    assert(r.getAs[Long]("n_down") == nDown.toLong)
  }

  test("priority_drift_tv equals the brute-force TV numerators") {
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderdate").collect()
    val byPri = orders.groupBy(_.getString(0)).map { case (p, rs) =>
      val early = rs.count(
        _.getAs[java.time.LocalDateTime](1).getYear <= 1995)
      (p, early.toLong, (rs.length - early).toLong)
    }.toSeq.sortBy(_._1)
    val tEarly = byPri.map(_._2).sum
    val tLate = byPri.map(_._3).sum
    val expected = byPri.map { case (p, ne, nl) =>
      (p, ne, nl, math.abs(ne * tLate - nl * tEarly))
    }
    val tvTotal = expected.map(_._4).sum

    val out = rows("priority_drift_tv")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (p, ne, nl, tv)) =>
      assert(r.getAs[String]("o_orderpriority") == p)
      assert(r.getAs[Long]("n_early") == ne)
      assert(r.getAs[Long]("n_late") == nl)
      assert(r.getAs[Long]("tv_num") == tv)
      assert(r.getAs[Long]("tv_total") == tvTotal)
      assert(r.getAs[Long]("t_early") == tEarly)
      assert(r.getAs[Long]("t_late") == tLate)
    }
  }

  test("dedup_survivorship picks max-n_chars (min doc_id) per dedup_clusters cluster") {
    val chars = graft.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = rows("dedup_clusters")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep_doc_id")))
      .groupBy(_._2)
    assert(clusters.nonEmpty, "sf0.001 corpus must have dup clusters")
    val out = rows("dedup_survivorship")
    assert(out.length == clusters.size)
    out.foreach { r =>
      val rep = r.getAs[Long]("rep_doc_id")
      val members = clusters(rep).map(_._1)
      val kept = members.minBy(d => (-chars(d), d))
      assert(r.getAs[Long]("kept_doc_id") == kept)
      assert(r.getAs[Long]("n_members") == members.length.toLong)
      assert(r.getAs[Long]("chars_kept") == chars(kept))
      assert(r.getAs[Long]("chars_dropped") ==
        members.filterNot(_ == kept).map(chars).sum)
    }
  }

  test("k_anonymity_audit equals the brute-force QI-class profile") {
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "n_chars", "lang").collect()
      .map(r => (r.getString(0), r.getLong(1) / 256, r.getString(2)))
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val classes = rs.groupBy(_._2).values.toSeq
      val sizes = classes.map(_.length.toLong)
      val lDivs = classes.map(_.map(_._3).distinct.length.toLong)
      (src, classes.length.toLong, sizes.min,
        sizes.count(_ < 5).toLong, sizes.filter(_ < 5).sum, lDivs.min)
    }.toSeq.sortBy(_._1)
    val out = rows("k_anonymity_audit")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getAs[String]("source"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("min_class_size"), r.getAs[Long]("classes_below_k"),
        r.getAs[Long]("rows_at_risk"), r.getAs[Long]("min_l_diversity")) == e)
    }
  }

  /** Doubled median (2x the interpolated 0.5-quantile) of a sorted array —
    * the exact-integer form percentile()/quantile_cont() agree on.
    */
  private def med2x(xs: Array[Long]): Long = {
    val n = xs.length
    if (n % 2 == 1) 2 * xs(n / 2) else xs(n / 2 - 1) + xs(n / 2)
  }

  test("embed_norm_outliers equals the brute-force median/MAD banding") {
    val sqns = graft.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map { r =>
        r.getSeq[Float](0).map { x =>
          val q = math.floor(x.toDouble * 10000 + 0.5).toLong; q * q
        }.sum
      }
    val m2 = med2x(sqns.sorted)
    val devs = sqns.map(s => math.abs(2 * s - m2))
    val mad4 = med2x(devs.sorted)
    def band(dev2: Long): Long =
      if (10000L * dev2 > 22239L * mad4) 3L
      else if (10000L * dev2 > 14826L * mad4) 2L
      else if (10000L * dev2 > 7413L * mad4) 1L
      else 0L
    val expected = sqns.zip(devs).groupBy { case (_, d) => band(d) }
      .map { case (b, rs) =>
        (b, rs.length.toLong, rs.map(_._1).min, rs.map(_._1).max)
      }.toSeq.sortBy(_._1)
    val out = rows("embed_norm_outliers")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getAs[Long]("band"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("min_sqn"), r.getAs[Long]("max_sqn")) == e)
    }
    // the audit's reason to exist: the planted scaled copies land
    // beyond the 3-sigma fence, so the outlier band is never vacuous
    assert(expected.exists(_._1 == 3L))
  }

  test("target_encode_oof equals the brute-force out-of-fold encoder") {
    val orders = graft.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getLong(1) % 5,
        (BigDecimal(r.getDouble(2)).setScale(2) * 100).toLongExact))
    val cf = orders.groupBy(o => (o._1, o._2)).map { case ((c, f), rs) =>
      (c, f, rs.length.toLong, rs.map(_._3).sum)
    }.toSeq
    val gs = cf.map(_._4).sum; val gn = cf.map(_._3).sum
    val prior = gs / gn
    val expected = cf.map { case (c, f, n, s) =>
      val tn = cf.filter(_._1 == c).map(_._3).sum
      val ts = cf.filter(_._1 == c).map(_._4).sum
      (c, f, n, ((ts - s) + 10 * prior) / ((tn - n) + 10))
    }.sortBy(e => (e._1, e._2))
    val out = rows("target_encode_oof")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getAs[String]("cat"), r.getAs[Long]("fold"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("encoded_cents")) == e)
    }
  }

  test("feature_hash_collisions equals the brute-force bucket profile") {
    val docs = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val vocab = docs.flatMap { t =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.iterator.zip(toks.iterator.drop(1)).map { case (a, b) => s"$a $b" }
    }.distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    def h52(s: String): Long = {
      md.reset()
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    val hs = vocab.map(h52)
    val expected = Seq(16L, 256L, 1024L, 4096L).map { d =>
      val loads = hs.groupBy(_ % d).values.map(_.length.toLong).toSeq
      (d, loads.sum, loads.size.toLong, loads.sum - loads.size,
        loads.max, (1000 * loads.size) / d)
    }
    val out = rows("feature_hash_collisions")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getAs[Long]("dim"), r.getAs[Long]("vocab_size"),
        r.getAs[Long]("buckets_used"), r.getAs[Long]("excess_features"),
        r.getAs[Long]("max_load"), r.getAs[Long]("occupancy_permille")) == e)
    }
    // width 16 is saturated at every SF — the collision path is never
    // vacuously zero, even on the smoke corpus
    assert(expected.head._4 > 0)
  }

  test("seq_topk_refblock equals the brute-force reference-blocked search") {
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1),
        r.getLong(2), r.getString(3).take(1)))
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length).toLong
    }
    val seqs = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
        .map(_._4).mkString.take(40)
    }
    val refs = seqs.filter(_._1 < 8).toSeq.sortBy(_._1)
    val cells = seqs.map { case (u, s) =>
      val best = refs.map { case (rid, rs) => (lev(s, rs), rid) }.min
      (u, s, best._2)
    }.toSeq
    val expected = cells.filter(_._1 % 7 == 3).flatMap { case (p, ps, cell) =>
      cells.filter(c => c._3 == cell && c._1 != p)
        .map(c => (lev(ps, c._2), c._1))
        .sorted.take(3).zipWithIndex
        .map { case ((d, cand), i) => (p, i + 1L, cand, d) }
    }.sortBy(e => (e._1, e._2))
    val out = rows("seq_topk_refblock")
    assert(out.length == expected.length && expected.nonEmpty)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getAs[Long]("probe"), r.getAs[Long]("rnk"),
        r.getAs[Long]("cand"), r.getAs[Long]("dist")) == e)
    }
  }

  test("peak_inflight_shipments equals the brute-force sweep") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate")
      .collect()
      .map { r =>
        val day = r.get(3) match {
          case t: java.sql.Timestamp => java.time.Duration
            .between(java.time.Instant.EPOCH, t.toInstant).toDays
          case d: java.time.LocalDateTime => java.time.Duration
            .between(java.time.LocalDateTime.of(1970, 1, 1, 0, 0), d).toDays
        }
        (r.getLong(0), day,
          day + 3 + (r.getLong(1) + r.getInt(2)) % 12)
      }
    val expected = li.groupBy(_._1).map { case (supp, rs) =>
      val deltas = rs.flatMap(r => Seq((r._2, 1L), (r._3 + 1, -1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val run = deltas.scanLeft((0L, 0L)) { case ((_, acc), (day, d)) =>
        (day, acc + d) }.drop(1)
      val peak = run.map(_._2).max
      val day = run.find(_._2 == peak).get._1
      (supp, peak, day)
    }.toSeq.sortBy(_._1)
    val out = rows("peak_inflight_shipments")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getAs[Long]("l_suppkey"), r.getAs[Long]("peak_inflight"),
        r.getAs[Long]("peak_day")) == e)
    }
    // the sweep is exercised: some supplier genuinely overlaps shipments
    assert(expected.exists(_._2 >= 2))
  }

  test("golden_record_merge applies the field rules over the ER labels") {
    val lbl = rows("er_clusters")
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("rep_custkey")))
    val cust = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1),
        (BigDecimal(r.getDouble(2)).setScale(2) * 100).toLongExact,
        r.getString(3))).map(c => c._1 -> c).toMap
    val expected = lbl.groupBy(_._2).map { case (rep, ms) =>
      val rows = ms.map(m => cust(m._1))
      val name = rows.map(_._2).maxBy(n => (n.length, n))
      rep -> ((rep, ms.length.toLong, name, rows.map(_._3).max))
    }
    // mode with (count desc, segment asc) tie-break, computed plainly
    val segOf = lbl.groupBy(_._2).map { case (rep, ms) =>
      val counts = ms.map(m => cust(m._1)._4).groupBy(identity)
        .map { case (s2, xs) => (s2, xs.size) }.toSeq
      val best = counts.sortBy { case (s2, n) => (-n, s2) }.head._1
      rep -> best
    }
    val out = rows("golden_record_merge")
    assert(out.length == expected.size && expected.nonEmpty)
    out.foreach { r =>
      val rep = r.getAs[Long]("rep_custkey")
      val e = expected(rep)
      assert(r.getAs[Long]("n_members") == e._2)
      assert(r.getAs[String]("golden_name") == e._3)
      assert(r.getAs[Long]("golden_bal_cents") == e._4)
      assert(r.getAs[String]("golden_segment") == segOf(rep))
    }
  }

  test("quality_decile_by_lang equals brute-force per-lang lower deciles") {
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def qp(text: String): Long = {
      val lower = text.toLowerCase
      val toks = lower.split("\\s+").filter(_.nonEmpty)
      val stops = Set("the", "a", "and", "of", "is")
      val nTokens = toks.length.toLong
      val stopHits = toks.count(stops).toLong
      val punct = lower.replaceAll("[a-z0-9 ]", "").length.toLong
      val nChars = text.length.toLong
      (if (nTokens > 0) (500 * stopHits) / nTokens else 0L) +
        (300 * (nChars - punct)) / nChars +
        math.min(2 * nTokens, 200L)
    }
    val expected = docs.groupBy(_._1).map { case (lang, rs) =>
      val sorted = rs.map(d => qp(d._2)).sorted
      val n = sorted.length.toLong
      def lower(k: Long, of: Long): Long = // smallest v with of*cum >= k*n
        sorted(((k * n + of - 1) / of - 1).toInt)
      (lang, n, lower(1, 10), lower(1, 2), lower(9, 10))
    }.toSeq.sortBy(_._1)
    val out = rows("quality_decile_by_lang")
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, e) =>
      assert((r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("p10"), r.getAs[Long]("p50"), r.getAs[Long]("p90")) == e)
    }
  }
}
