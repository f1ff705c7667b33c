package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.functions.TextFns

/** Stage-timing probe for dedup_containment on the organic 10x corpus:
  * the committed full-run entry is 12.6 s (round-12) and the isolated
  * unit measures the same under the current host, so the gap is NOT
  * harness cache pressure — this isolates the real stages (shingle
  * index build, the guard's two fanout aggregates, the plain-tier
  * verify join, the aggregate, the expansion) so the next cut targets
  * the dominator. Tooling only — not part of any query path.
  */
object ProfileContain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("tmp_sf1_organic")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // warm scan + codegen
    SparkEntry.queries("dedup_exact")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      spark.catalog.clearCache()
      val docs = Tables.documents(spark, dir)
      val cap = math.max(20L, docs.count() / 500L).toInt // TextDedup.MAX_DF
      val (num, den, minSize) = (4, 5, 5)

      val members = t("members (fingerprint window)") {
        val m = docs
          .select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
          .withColumn("rep", min(col("doc_id")).over(
            Window.partitionBy(col("fp"))))
          .select(col("rep"), col("doc_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.count(); m
      }
      val weights = members.groupBy(col("rep")).agg(count(lit(1)).as("k"))
      val repDocs = docs.join(
        weights.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
      val inv = t("inv index (df cap + sz windows)") {
        val invAll = Dedup.shingleRows(repDocs, 3)
          .join(weights.select(col("rep").as("doc_id"), col("k")), "doc_id")
        val w = Window.partitionBy(col("s"))
        val i = invAll.withColumn("_df", sum(col("k")).over(w))
          .filter(col("_df") <= cap).drop("_df", "k")
          .withColumn("sz",
            count(lit(1)).over(Window.partitionBy(col("doc_id"))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  inv rows = ${i.count()}"); i
      }
      val pre = t("prefix rows build") {
        val p = Dedup.prefixRowsExact(inv, num, den)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  pre rows = ${p.count()}"); p
      }
      def fanout(left: DataFrame, right: DataFrame): Long = {
        val lf = left.groupBy(col("s")).agg(count(lit(1)).as("lf"))
        val rf = right.groupBy(col("s")).agg(count(lit(1)).as("rf"))
        val r = lf.join(rf, "s")
          .agg(sum(col("lf") * col("rf")).as("c")).first()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      t("guard fanout(pre,inv)")(println(s"  preF = ${fanout(pre, inv)}"))
      t("guard fanout(inv,inv)")(println(s"  invF = ${fanout(inv, inv)}"))
      val szOk = col("a") =!= col("b") &&
        col("_sza") >= minSize &&
        col("_szb") * den >= col("_sza") * num
      t("plain join + szOk (count rows)") {
        val n = inv.select(col("s"), col("doc_id").as("a"), col("sz").as("_sza"))
          .join(inv.select(col("s"), col("doc_id").as("b"),
            col("sz").as("_szb")), Seq("s"))
          .filter(szOk).count()
        println(s"  szOk join rows = $n")
      }
      val inter = t("plain inter groupBy(a,b)") {
        val it = inv.select(col("s"), col("doc_id").as("a"), col("sz").as("_sza"))
          .join(inv.select(col("s"), col("doc_id").as("b"),
            col("sz").as("_szb")), Seq("s"))
          .filter(szOk)
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  inter pairs = ${it.count()}"); it
      }
      t("threshold filter (count)") {
        val sizes = inv.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val n = inter
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sz_a")), "a")
          .filter(col("sz_a") >= minSize)
          .filter(col("inter") * den >= col("sz_a") * num).count()
        println(s"  qualifying rep pairs = $n")
      }
      // --- candidate-restricted verify experiment (PPJoin+ flavored) ---
      // invR: inv + per-doc global-order rank (df asc, s) — the same
      // canonical order prefixRowsBy uses, so prefix = rnk <= sz-Ta+1.
      val invR = t("invR (rank window)") {
        val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
        val r = inv.join(dfreq, "s")
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
          .withColumn("ta", expr(s"(${num}L * sz + ${den - 1}L) div ${den}L"))
          .select(col("s"), col("doc_id"), col("sz"), col("rnk"), col("ta"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.count(); r
      }
      val candStats = t("cand stats (kpre/pbmax agg)") {
        val preR = invR.filter(col("rnk") <= col("sz") - col("ta") + 1)
        val cs = preR.select(col("s"), col("doc_id").as("a"),
            col("sz").as("_sza"), col("ta"))
          .join(invR.select(col("s"), col("doc_id").as("b"),
            col("sz").as("_szb"), col("rnk").as("pb")), Seq("s"))
          .filter(szOk)
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("kpre"), max(col("pb")).as("pbmax"),
            first(col("_sza")).as("sza"), first(col("_szb")).as("szb"),
            first(col("ta")).as("ta"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  distinct candidates = ${cs.count()}"); cs
      }
      val candPos = t("positional filter (count)") {
        val cp = candStats.filter(
          col("kpre") + least(col("ta") - 1, col("szb") - col("pbmax"))
            >= col("ta"))
          .select(col("a"), col("b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  positional survivors = ${cp.count()}"); cp
      }
      t("bcast-verify agg (count)") {
        val matches = inv.select(col("s"), col("doc_id").as("a"),
            col("sz").as("_sza"))
          .join(inv.select(col("s"), col("doc_id").as("b"),
            col("sz").as("_szb")), Seq("s"))
          .filter(szOk)
        val n = matches
          .join(broadcast(candPos), Seq("a", "b"), "left_semi")
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"), first(col("_sza")).as("sz_a"))
          .filter(col("inter") * den >= col("sz_a") * num)
          .count()
        println(s"  qualifying rep pairs (new verify) = $n")
      }
      val docsArr = t("docsArr (collect_list agg)") {
        val d = inv.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("s"))).as("arr"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  rep docs with arrays = ${d.count()}"); d
      }
      t("array-intersect verify (count)") {
        val n = candPos
          .join(broadcast(docsArr.select(col("doc_id").as("a"),
            col("arr").as("arr_a"))), "a")
          .join(broadcast(docsArr.select(col("doc_id").as("b"),
            col("arr").as("arr_b"))), "b")
          .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
          .withColumn("sz_a", size(col("arr_a")))
          .filter(col("inter") * den >= col("sz_a") * num)
          .count()
        println(s"  qualifying rep pairs (array verify) = $n")
      }
      t("end-to-end cand tier (no interm. persists)") {
        val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("df"))
        val ivr = inv.join(dfreq, "s")
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
          .withColumn("ta", expr(s"(${num}L * sz + ${den - 1}L) div ${den}L"))
          .select(col("s"), col("doc_id"), col("sz"), col("rnk"), col("ta"))
        val preR = ivr.filter(col("rnk") <= col("sz") - col("ta") + 1)
        val cand = preR.select(col("s"), col("doc_id").as("a"),
            col("sz").as("_sza"), col("ta"))
          .join(ivr.select(col("s"), col("doc_id").as("b"),
            col("sz").as("_szb"), col("rnk").as("pb")), Seq("s"))
          .filter(szOk)
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("kpre"), max(col("pb")).as("pbmax"),
            first(col("_szb")).as("szb"), first(col("ta")).as("tA"))
          .filter(col("kpre") + least(col("tA") - 1, col("szb") - col("pbmax"))
            >= col("tA"))
          .select(col("a"), col("b"))
        val n = cand
          .join(broadcast(docsArr.select(col("doc_id").as("a"),
            col("arr").as("arr_a"))), "a")
          .join(broadcast(docsArr.select(col("doc_id").as("b"),
            col("arr").as("arr_b"))), "b")
          .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))))
          .withColumn("sz_a", size(col("arr_a")))
          .filter(col("inter") * den >= col("sz_a") * num)
          .count()
        println(s"  qualifying rep pairs (e2e cand tier) = $n")
      }
      spark.catalog.clearCache()
      val cap2 = math.max(20L, docs.count() / 500L).toInt
      t("operator repPairs-only (warm cache)") {
        // same operator, same caches as the full query, no expansion
        Dedup.containmentPairsTier(docs, 3, num, den, minSize,
          Some(cap2), forceCandidate = Some(true), bcastDocsCap = 200000)
          .write.format("noop").mode("overwrite").save()
      }
      t("operator 2nd run (cache reuse)") {
        Dedup.containmentPairsTier(docs, 3, num, den, minSize,
          Some(cap2), forceCandidate = Some(true), bcastDocsCap = 200000)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      t("full query (noop)")(
        SparkEntry.queries("dedup_containment")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      t("full query 2nd (warm)")(
        SparkEntry.queries("dedup_containment")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
