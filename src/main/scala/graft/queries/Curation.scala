package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns
import graft.operators.Dedup
import Util._

/** The flagship training-data curation pipeline (SURVEY §2.9 [EXT]):
  * quality filter → exact dedup → near-dup cluster drop → deterministic
  * split, composed from the declared operators into ONE flow over the
  * documents table — the shape a 100 TB pre-training corpus actually
  * runs, end to end:
  *
  *   1. quality gate: the `quality_score` formula, docs below threshold
  *      dropped at the scan (predicate over scalar exprs — pushable).
  *   2. exact dedup: keep the min-doc_id representative per normalized
  *      fingerprint (one hash shuffle).
  *   3. near-dup drop: MinHash/LSH candidate pairs (df-ceiling capped) →
  *      exact Jaccard verify → connected components → drop every
  *      clustered doc except its representative (anti-join).
  *   4. split: content-hash train/val/test assignment (survives
  *      reshuffles and engine changes).
  *
  * Output is the per-split/lang corpus summary — the small deterministic
  * surface a curation job reports.
  *
  * The DuckDB oracle mirrors every stage (quality doubles, md5
  * fingerprints, LSH chain, recursive-CTE components, hex-digit split),
  * so the WHOLE pipeline hash-matches, not just its pieces.
  */
object Curation {

  private val QUALITY_MIN = 0.40
  private val JACCARD_MIN = 0.5

  /** The quality_score formula as reusable columns — the single shared
    * definition (identical doubles to the `quality_score` query/oracle).
    */
  private def withQuality(docs: DataFrame): DataFrame =
    TextFns.withQualityCols(docs)

  /** Context length for the packing planner (tokens per pack). */
  private val CTX = 512
  /** Shard fan-out for packing — WIRED TO CLUSTER PARALLELISM so the
    * declared query demonstrates the scaling shape: every core packs its
    * own shard. Capped at 256 (two content-hash hex digits drive the
    * shard assignment). The oracle reads the same value through the
    * active session at dump time, so both sides always agree.
    */
  private def shardsOf(parallelism: Int): Int = math.min(parallelism, 256)

  private def activeShards: Int =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(s => shardsOf(s.sparkContext.defaultParallelism))
      .getOrElse(4)

  def queries: Map[String, Q] = Map(

    // Sequence-packing planner: the concat-and-chunk shape GPT-style
    // pre-training uses. Docs are sharded by a content-hash digit
    // (shard count scales with the cluster), ordered within shard, and
    // assigned to the pack where their first token lands
    // (pack_id = start_offset div CTX). One shuffle keyed by shard;
    // the per-shard running sum is the sequential scan a packer does
    // anyway, parallel ACROSS shards.
    "pack_sequences" -> ((s, dir) => {
      val nShards = shardsOf(s.sparkContext.defaultParallelism)
      val shard = (TextFns.hexVal(
        substring(TextFns.fingerprint(col("text")), 1, 1)) * 16 +
        TextFns.hexVal(
          substring(TextFns.fingerprint(col("text")), 2, 1))) % nShards
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      documents(s, dir)
        .withColumn("n_tokens", size(TextFns.tokens(col("text"))).cast("long"))
        .withColumn("shard", shard)
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tokens")) / CTX))
        .groupBy(col("shard"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
        .orderBy(col("shard"), col("pack_id"))
    }),

    // Domain mixing: deterministic per-source downsampling via a
    // content-hash threshold (rate16/16 of each source survives, chosen
    // by the source's numeric suffix). Pure map-side filter — at 100 TB
    // the mix is applied at the scan with zero shuffles; the summary
    // aggregate is the only exchange.
    "domain_mix" -> ((s, dir) => {
      val srcNum = regexp_extract(col("source"), "src(\\d+)", 1).cast("int")
      val rate16 = when(srcNum < 5, 16).when(srcNum < 10, 8)
        .when(srcNum < 15, 4).otherwise(2)
      val d = TextFns.hexVal(substring(TextFns.fingerprint(col("text")), 2, 1))
      documents(s, dir)
        .withColumn("n_tokens", size(TextFns.tokens(col("text"))).cast("long"))
        .withColumn("kept", d < rate16)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
        .orderBy(col("source"))
    }),

    // Domain reweighting to a uniform target mix — the third leg next
    // to domain_mix (hard downsample) and quality_weighted_sample (soft
    // drop): KEEP every doc, weight it so each source contributes
    // equally in expectation. Per-source weight = (1000·N) div (S·n_s)
    // permille, and the variance cost of the reweighting ships as the
    // effective-sample-size ratio ESS/N = (Σw)² / (N·Σw²) in permille —
    // both pure integer cross-multiplications over the per-source count
    // table (decimal-38 for the squared sums), so the whole diagnostic
    // is one corpus scan plus arithmetic over S rows. The global row
    // rides back onto the S-row table as a broadcast, the shape that is
    // free at any corpus size.
    "domain_reweight" -> ((s, dir) => {
      val d38 = "decimal(38,0)"
      // persisted: the per-source counts feed the totals aggregate AND
      // the weight projection (ScanAudit: documents x4)
      val bySrc = documents(s, dir)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nSrc = bySrc.agg(count(lit(1)).as("n_sources"),
        sum(col("n_docs")).as("n_total"))
      val weighted = bySrc.crossJoin(broadcast(nSrc))
        .withColumn("weight_permille",
          expr("(1000 * n_total) div (n_sources * n_docs)"))
      val ess = weighted
        .agg(sum(col("n_docs") * col("weight_permille")).cast(d38).as("sw"),
          sum(col("n_docs") * col("weight_permille") * col("weight_permille"))
            .cast(d38).as("sw2"),
          sum(col("n_docs")).as("n"))
        .select(expr("(1000 * sw * sw) div (n * sw2)").as("ess_permille"))
      weighted.crossJoin(broadcast(ess))
        .select(col("source"), col("n_docs"), col("weight_permille"),
          col("ess_permille"))
        .orderBy(col("source"))
    }),

    // Quality-weighted importance sampling: each doc survives with
    // probability equal to its quality score, decided by a content-hash
    // digit (deterministic — same corpus, same sample, any engine or
    // partitioning). The soft alternative to a hard quality cutoff:
    // high-quality docs are kept densely, junk sparsely, nothing is
    // categorically excluded. Map-side filter at the scan; the per-lang
    // summary is the only shuffle.
    "quality_weighted_sample" -> ((s, dir) => {
      val d = TextFns.hexVal(
        substring(TextFns.fingerprint(col("text")), 3, 1))
      withQuality(documents(s, dir))
        .withColumn("kept", d.cast("double") / 16.0 < col("score"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
        .orderBy(col("lang"))
    }),

    // PII-style redaction report — the masking pass a curation job runs
    // before text leaves the lake, audited as exact integers. Digit
    // runs are the identifier shape this schema actually carries (a
    // 9-digit account id inside every customer name, a numeric payload
    // inside event props); the same four regex aggregates generalize to
    // SSN/phone/email patterns unchanged. Everything is map-side
    // (regexp_count / regexp_replace are codegen'd row expressions at
    // the scan); each table collapses to ONE report row before the
    // two-row union, so nothing wide ever shuffles — at 100 TB the cost
    // is the scan, as a redaction pass should be. The masked-form ndv
    // (count of distinct post-mask strings) is the k-anonymity-style
    // check that masking actually collapsed identifiers.
    "scrub_mask_report" -> ((s, dir) => {
      def report(df: DataFrame, c: String, label: String): DataFrame =
        df.select(col(c).as("v"))
          .agg(count(lit(1)).as("rows_total"),
            sum(when(regexp_count(col("v"), lit("[0-9]+")) > 0, 1L)
              .otherwise(0L)).as("rows_hit"),
            sum(regexp_count(col("v"), lit("[0-9]+")).cast("long"))
              .as("digit_runs"),
            sum(length(col("v")) -
              length(regexp_replace(col("v"), "[0-9]+", "")))
              .cast("long").as("chars_masked"),
            countDistinct(regexp_replace(col("v"), "[0-9]+", "#"))
              .as("masked_ndv"))
          .select(lit(label).as("src"), col("rows_total"), col("rows_hit"),
            col("digit_runs"), col("chars_masked"), col("masked_ndv"))
      report(customer(s, dir), "c_name", "customer_name")
        .unionAll(report(events(s, dir), "props", "event_props"))
        .orderBy(col("src"))
    }),

    "curate_corpus" -> ((s, dir) => {
      // 1. quality gate
      val kept = withQuality(documents(s, dir))
        .filter(col("score") >= QUALITY_MIN)
        .select(col("doc_id"), col("lang"), col("text"), col("n_tokens"))
      // 2. exact dedup (min doc_id per fingerprint). Persisted: this
      // frame feeds BOTH the LSH pair subtree and the final anti-join +
      // split summary, and per-consumer pruning/aliasing defeats
      // ReuseExchange — without the persist the quality scoring (regex
      // tokenization over every doc) and the fingerprint window dedup
      // run once per consumer. Same lifecycle notes as Dedup.materialized.
      val fpw = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val exactKept = kept
        .withColumn("fp", TextFns.fingerprint(col("text")))
        .withColumn("rn", row_number().over(fpw))
        .filter(col("rn") === 1)
        .drop("rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // 3. near-dup drop: LSH pairs -> components -> drop non-reps
      val pairs = Dedup.minhashLshPairs(exactKept.select(col("doc_id"), col("text")),
        n = 3, bands = 4, rowsPerBand = 2, threshold = JACCARD_MIN,
        maxDf = Some(TextDedup.MAX_DF))
      val nonReps = Dedup.componentsFromPairs(pairs.select(col("a"), col("b")))
        .filter(col("doc_id") =!= col("rep_doc_id"))
        .select(col("doc_id"))
      val curated = exactKept.join(nonReps, Seq("doc_id"), "left_anti")
      // 4. deterministic content-hash split + corpus summary
      val d = TextFns.hexVal(substring(col("fp"), 32, 1))
      curated
        .withColumn("split",
          when(d < 14, "train").when(d === 14, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("split"), col("lang"))
    }),

    // Weighted sampling without replacement via PRIORITY SAMPLING
    // (Duffield–Lund–Thorup, "Priority sampling for estimation of
    // arbitrary subset sums"): each doc gets priority
    // q = w div u, u uniform on (0,1] — here exact-integer as
    // (w · 2^40) div (h40 + 1) with h40 the top 40 bits of the portable
    // 52-bit md5 hash of doc_id — and the sample is the k largest
    // priorities. Inclusion probability is proportional-to-size without
    // replacement, the estimator property Horvitz–Thompson needs, and
    // the draw is deterministic: same corpus → same sample on any
    // engine, partitioning, or run. Scale shape: one map-side
    // projection computes priorities at the scan; top-k via
    // orderBy+limit is TakeOrderedAndProject (per-partition heaps, only
    // k rows per partition travel) — no global sort, no shuffle of the
    // corpus. w stays < 2^23 (n_chars), so w · 2^40 cannot overflow
    // BIGINT in either engine.
    "weighted_sample_docs" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars").as("weight"))
        .withColumn("h40", expr(
          "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13), 16, 10) " +
            "AS BIGINT) div 4096"))
        .withColumn("priority",
          expr("(weight * 1099511627776) div (h40 + 1)"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("lang"), col("weight"), col("priority"))
    }),

    // k-anonymity / l-diversity audit — the release gate a corpus passes
    // before leaving the curation pipeline (Sweeney, "k-Anonymity: a
    // model for protecting privacy"; Machanavajjhala et al.,
    // "l-Diversity"). Quasi-identifier = (source, 256-char length
    // bucket); sensitive attribute = lang. Every QI equivalence class is
    // one group; a class smaller than k=5 re-identifies its members, and
    // a class whose members all share one lang leaks the sensitive value
    // even at size >= k. Per source: class count, smallest class, classes
    // below k, rows at risk, worst l-diversity. Scale shape: two cascaded
    // hash aggregates with map-side combine (the distinct-lang count
    // rides the first as a tagged expand) — no join, no window, linear in
    // rows at any corpus size.
    "k_anonymity_audit" -> ((s, dir) => {
      val classes = documents(s, dir)
        .groupBy(col("source"), expr("n_chars div 256").as("bucket"))
        .agg(count(lit(1)).as("class_size"),
          countDistinct(col("lang")).as("l_div"))
      classes.groupBy(col("source"))
        .agg(count(lit(1)).as("n_classes"),
          min(col("class_size")).as("min_class_size"),
          sum(when(col("class_size") < 5, 1L).otherwise(0L))
            .as("classes_below_k"),
          sum(when(col("class_size") < 5, col("class_size"))
            .otherwise(lit(0L))).as("rows_at_risk"),
          min(col("l_div")).as("min_l_diversity"))
        .orderBy(col("source"))
    }),

    // Language-fair quality thresholds — the audit behind per-language
    // filtering policy: a single global quality cutoff silently deletes
    // low-resource languages (their score distribution sits lower), so
    // curation picks thresholds per lang. Reports each language's
    // p10/p50/p90 of an integer quality permille (the exact-integer twin
    // of the canonical quality formula: same stop-hits / punctuation /
    // length terms, weights 500/300/200, every div on non-negative
    // operands so Spark div == DuckDB //). Scale shape: quantiles come
    // from a bounded histogram-CDF, never a sort of the corpus — one
    // map-side scoring pass, one (lang, permille) hash aggregate capped
    // at langs x 1001 rows, then a window over THAT catalog-sized table.
    // The corpus is scanned once at any SF; the histogram is persisted
    // for its two consumers (CDF + per-lang totals).
    "quality_decile_by_lang" -> ((s, dir) => {
      val qp =
        when(col("n_tokens") > 0, expr("(500 * stop_hits) div n_tokens"))
          .otherwise(0L) +
          expr("(300 * (length(text) - punct_len)) div length(text)") +
          least(lit(2L) * col("n_tokens"), lit(200L))
      val hist = TextFns.withQualityCols(documents(s, dir))
        .select(col("lang"), qp.as("qp"))
        .groupBy(col("lang"), col("qp")).agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = Window.partitionBy(col("lang")).orderBy(col("qp"))
      val cum = hist.withColumn("cum", sum(col("n")).over(w))
      val tot = hist.groupBy(col("lang")).agg(sum(col("n")).as("total"))
      cum.join(broadcast(tot), Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("total")).as("n_docs"),
          min(when(col("cum") * 10 >= col("total"), col("qp"))).as("p10"),
          min(when(col("cum") * 2 >= col("total"), col("qp"))).as("p50"),
          min(when(col("cum") * 10 >= col("total") * 9, col("qp"))).as("p90"))
        .orderBy(col("lang"))
    }),

    // Consolidated curation report (round 13): the ONE long-format
    // (metric, value) artifact a pipeline run ships — corpus size,
    // exact/near-dup rates, repetition, eval contamination, and BOTH
    // near-dup detectors' measured quality, unioned from the same
    // definitions the standalone audit queries use. Scale shape:
    // full-corpus metrics are the linear passes (one fingerprint
    // aggregate, one excerpt-fp window, one map-side gram projection);
    // the quadratic-by-nature audits (exact-truth LSH recall, eval
    // contamination) run on the deterministic constant-size sample
    // doc_id % 1000000 < 1000 — the embed_lsh_recall idiom: per-pair
    // detector behavior is content-intrinsic, so the sampled audit
    // measures the same per-pair rates as a full run while its pair
    // space stays constant at any corpus scale. Every value is BIGINT
    // permille or a count; nullif guards empty denominators in both
    // engines.
    "curation_report" -> ((s, dir) => {
      val docs = documents(s, dir)
      // corpus size + exact-dup rate + repetition share fused into ONE
      // corpus scan (all three are global aggregates over map-side
      // projections of text — ScanAudit flagged the separate passes)
      val exact = docs
        .select(TextFns.fingerprint(col("text")).as("fp"),
          (size(TextFns.tokens(col("text"))) - 2).cast("long").as("total"),
          size(TextFns.shingleSet(col("text"), 3)).cast("long").as("nd"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("fp")).as("nfp"),
          sum(when(col("total") > 0, col("total"))).as("stot"),
          sum(when(col("total") > 0, col("total") - col("nd")))
            .as("sdup"))
        .select(expr("stack(3, 'corpus_docs', n, " +
          "'exact_dup_permille', (1000 * (n - nfp)) div n, " +
          "'repetition_dup_permille', (1000 * sdup) div stot)")
          .as(Seq("metric", "value")))
      // worst per-source excerpt-dup rate (dup_rate_by_source's max)
      val fp60 = md5(substring(
        trim(regexp_replace(lower(col("text")), "\\s+", " ")), 1, 60))
      val topSrc = docs.select(col("doc_id"), col("source"), fp60.as("fp"))
        .withColumn("rep", min(col("doc_id")).over(
          Window.partitionBy(col("fp"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") > col("rep"), 1L).otherwise(0L))
            .as("n_dups"))
        .agg(max(expr("(1000 * n_dups) div n_docs")).as("v"))
        .select(lit("top_source_dup_permille").as("metric"),
          col("v").as("value"))
      // text LSH detector quality on the constant-size sample
      val sample = docs
        .filter(col("doc_id") % 1000000L < 1000L)
        .select(col("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val truth = Dedup.ngramJaccardPairs(sample, n = 3, threshold = 0.5,
          maxDf = Some(TextDedup.MAX_DF)).select(col("a"), col("b"))
      val found = Dedup.minhashLshPairs(sample, n = 3, bands = 4,
          rowsPerBand = 2, threshold = 0.5, maxDf = Some(TextDedup.MAX_DF))
        .select(col("a"), col("b"))
      // One tagged-union aggregate instead of three one-row aggregates
      // + a semi-join (round 14 stage cut): tag each pair with its
      // detector, collapse per pair, then count truth / found /
      // intersection in a single global aggregate. Same three values
      // (|truth|, |found|, |found ∩ truth|), two job waves fewer; each
      // detector frame now has exactly one consumer, so the persists
      // the old double-readers needed are gone too.
      val lsh = truth.withColumn("t", lit(1L)).withColumn("f", lit(0L))
        .unionByName(found.withColumn("t", lit(0L)).withColumn("f", lit(1L)))
        .groupBy(col("a"), col("b"))
        .agg(max(col("t")).as("t"), max(col("f")).as("f"))
        .agg(sum(col("t")).as("n_truth"), sum(col("f")).as("n_found"),
          sum(col("t") * col("f")).as("n_matched"))
        .select(expr("stack(2, " +
          "'lsh_recall_permille', (1000 * n_matched) div nullif(n_truth, 0), " +
          "'lsh_precision_permille', (1000 * n_matched) div nullif(n_found, 0))")
          .as(Seq("metric", "value")))
      // graded eval contamination on the sample (eval = doc_id % 50 = 0)
      val contam = Dedup.contaminationScore(
          train = sample.filter(col("doc_id") % 50 =!= 0),
          evalSet = sample.filter(col("doc_id") % 50 === 0), n = 3)
        .agg(count(lit(1)).as("n_tr"),
          sum(when(col("n_shared") * 2 >= col("n_shingles"), 1L)
            .otherwise(0L)).as("n_hot"))
        .select(lit("contamination_docs_permille").as("metric"),
          expr("(1000 * n_hot) div nullif(n_tr, 0)").as("value"))
      // embedding LSH detector quality (already constant-size capped)
      val embed = SimilarityQ.embedRecallSummary(s, dir)
        .select(expr("stack(2, " +
          "'embed_recall_permille', recall_permille, " +
          "'embed_precision_permille', precision_permille)")
          .as(Seq("metric", "value")))
      exact.unionByName(topSrc).unionByName(lsh)
        .unionByName(contam).unionByName(embed)
        .orderBy(col("metric"))
    })
  )

  def oracles: Map[String, String] = {
    val qualityExpr =
      s"""0.5 * (CAST(stop_hits AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE))
         |    + 0.3 * (1.0 - CAST(punct_len AS DOUBLE) / CAST(n_chars AS DOUBLE))
         |    + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)""".stripMargin
    Map(
      "domain_reweight" ->
        """WITH b AS (
          |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
          |t AS (SELECT COUNT(*) AS n_sources,
          |        CAST(SUM(n_docs) AS BIGINT) AS n_total FROM b),
          |w AS (SELECT source, n_docs,
          |        CAST((1000 * n_total) // (n_sources * n_docs) AS BIGINT)
          |          AS weight_permille
          |      FROM b, t),
          |e AS (SELECT CAST(
          |        (1000 * CAST(SUM(n_docs * weight_permille) AS HUGEINT)
          |           * SUM(n_docs * weight_permille))
          |        // (CAST(SUM(n_docs) AS HUGEINT)
          |           * SUM(n_docs * weight_permille * weight_permille))
          |        AS BIGINT) AS ess_permille
          |      FROM w)
          |SELECT source, n_docs, weight_permille, ess_permille
          |FROM w, e ORDER BY source""".stripMargin,

      "k_anonymity_audit" ->
        """WITH classes AS (
          |  SELECT source, n_chars // 256 AS bucket,
          |    count(*) AS class_size,
          |    count(DISTINCT lang) AS l_div
          |  FROM documents GROUP BY source, bucket)
          |SELECT source,
          |  CAST(count(*) AS BIGINT) AS n_classes,
          |  CAST(MIN(class_size) AS BIGINT) AS min_class_size,
          |  CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS classes_below_k,
          |  CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
          |    AS BIGINT) AS rows_at_risk,
          |  CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
          |FROM classes GROUP BY source ORDER BY source""".stripMargin,

      "scrub_mask_report" ->
        """WITH c AS (
          |  SELECT 'customer_name' AS src, COUNT(*) AS rows_total,
          |    CAST(SUM(CASE WHEN len(regexp_extract_all(c_name, '[0-9]+')) > 0
          |      THEN 1 ELSE 0 END) AS BIGINT) AS rows_hit,
          |    CAST(SUM(len(regexp_extract_all(c_name, '[0-9]+'))) AS BIGINT)
          |      AS digit_runs,
          |    CAST(SUM(length(c_name)
          |      - length(regexp_replace(c_name, '[0-9]+', '', 'g'))) AS BIGINT)
          |      AS chars_masked,
          |    CAST(COUNT(DISTINCT regexp_replace(c_name, '[0-9]+', '#', 'g'))
          |      AS BIGINT) AS masked_ndv
          |  FROM customer),
          |e AS (
          |  SELECT 'event_props' AS src, COUNT(*) AS rows_total,
          |    CAST(SUM(CASE WHEN len(regexp_extract_all(props, '[0-9]+')) > 0
          |      THEN 1 ELSE 0 END) AS BIGINT) AS rows_hit,
          |    CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
          |      AS digit_runs,
          |    CAST(SUM(length(props)
          |      - length(regexp_replace(props, '[0-9]+', '', 'g'))) AS BIGINT)
          |      AS chars_masked,
          |    CAST(COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g'))
          |      AS BIGINT) AS masked_ndv
          |  FROM events)
          |SELECT * FROM c UNION ALL SELECT * FROM e ORDER BY src""".stripMargin,

      "quality_weighted_sample" ->
        s"""WITH base AS (
           |  SELECT doc_id, lang, text, regexp_extract_all(lower(text), '\\S+') AS toks
           |  FROM documents),
           |m AS (
           |  SELECT doc_id, lang, text,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    list_sum(list_transform(toks, t -> CASE WHEN t IN (${TextDedup.sqlIn(TextDedup.EN)}) THEN 1 ELSE 0 END)) AS stop_hits,
           |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS BIGINT) AS punct_len,
           |    length(text) AS n_chars
           |  FROM base),
           |k AS (
           |  SELECT lang, n_tokens,
           |    CAST(${TextDedup.hexValSql("md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))", 3)} AS DOUBLE) / 16.0
           |      < ($qualityExpr) AS kept
           |  FROM m)
           |SELECT lang, count(*) AS n_total,
           |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
           |FROM k GROUP BY lang ORDER BY lang""".stripMargin,

      "pack_sequences" ->
        s"""WITH base AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_extract_all(lower(text), '\\S+')) AS BIGINT) AS n_tokens,
           |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
           |  FROM documents),
           |sh AS (
           |  SELECT doc_id, n_tokens,
           |    (${TextDedup.hexValSql("fp", 1)} * 16
           |      + ${TextDedup.hexValSql("fp", 2)}) % $activeShards AS shard
           |  FROM base),
           |c AS (
           |  SELECT shard, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM sh),
           |p AS (SELECT shard, n_tokens,
           |  CAST((cum - n_tokens) // $CTX AS BIGINT) AS pack_id FROM c)
           |SELECT shard, pack_id, count(*) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
           |FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,

      "domain_mix" ->
        s"""WITH base AS (
           |  SELECT source,
           |    CAST(len(regexp_extract_all(lower(text), '\\S+')) AS BIGINT) AS n_tokens,
           |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
           |  FROM documents),
           |k AS (
           |  SELECT source, n_tokens,
           |    ${TextDedup.hexValSql("fp", 2)} <
           |      (CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) < 5 THEN 16
           |            WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) < 10 THEN 8
           |            WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) < 15 THEN 4
           |            ELSE 2 END) AS kept
           |  FROM base)
           |SELECT source, count(*) AS n_total,
           |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
           |FROM k GROUP BY source ORDER BY source""".stripMargin,

      "curate_corpus" ->
        s"""WITH RECURSIVE base AS (
           |  SELECT doc_id, lang, text, regexp_extract_all(lower(text), '\\S+') AS toks
           |  FROM documents),
           |m AS (
           |  SELECT doc_id, lang, text,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    list_sum(list_transform(toks, t -> CASE WHEN t IN (${TextDedup.sqlIn(TextDedup.EN)}) THEN 1 ELSE 0 END)) AS stop_hits,
           |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS BIGINT) AS punct_len,
           |    length(text) AS n_chars
           |  FROM base),
           |keptq AS (
           |  SELECT doc_id, lang, text, n_tokens FROM m
           |  WHERE $qualityExpr >= $QUALITY_MIN),
           |fpd AS (
           |  SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
           |  FROM keptq),
           |ek AS (
           |  SELECT doc_id, lang, text, n_tokens, fp FROM (
           |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           |    FROM fpd)
           |  WHERE rn = 1),
           |${TextDedup.docsSqlFrom("ek")},
           |${TextDedup.dfShingledSqlCap(TextDedup.MAX_DF)},
           |${TextDedup.lshCandSql(8, 4)},
           |${TextDedup.clusterTailSql(JACCARD_MIN)},
           |curated AS (
           |  SELECT ek.* FROM ek
           |  WHERE NOT EXISTS (SELECT 1 FROM comp
           |    WHERE comp.doc_id = ek.doc_id AND comp.doc_id <> comp.rep_doc_id)),
           |labeled AS (
           |  SELECT lang, n_tokens,
           |    CASE WHEN d < 14 THEN 'train' WHEN d = 14 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM (SELECT lang, n_tokens, ${TextDedup.hexValSql("fp", 32)} AS d
           |        FROM curated))
           |SELECT split, lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
           |FROM labeled GROUP BY split, lang ORDER BY split, lang""".stripMargin,

      // Mirrors weighted_sample_docs: identical 52-bit md5 hash, top 40
      // bits, integer priority, top-50 by (priority, doc_id).
      "weighted_sample_docs" ->
        s"""WITH p AS (
           |  SELECT doc_id, lang, n_chars AS weight,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
           |      AS BIGINT) // 4096 AS h40
           |  FROM documents)
           |SELECT doc_id, lang, CAST(weight AS BIGINT) AS weight,
           |  CAST((weight * 1099511627776) // (h40 + 1) AS BIGINT)
           |    AS priority
           |FROM p ORDER BY priority DESC, doc_id LIMIT 50""".stripMargin,

      // Mirrors quality_decile_by_lang: same integer permille formula
      // (non-negative operands, so // == Spark div), same histogram-CDF
      // lower-quantile rule (smallest qp with 10*cum >= k*total).
      "quality_decile_by_lang" ->
        s"""WITH base AS (
           |  SELECT lang, text,
           |    regexp_extract_all(lower(text), '\\S+') AS toks
           |  FROM documents),
           |m AS (
           |  SELECT lang,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    CAST(list_sum(list_transform(toks, t -> CASE WHEN t IN
           |      (${TextDedup.sqlIn(TextDedup.EN)}) THEN 1 ELSE 0 END))
           |      AS BIGINT) AS stop_hits,
           |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
           |      AS BIGINT) AS punct_len,
           |    CAST(length(text) AS BIGINT) AS n_chars
           |  FROM base),
           |q AS (
           |  SELECT lang,
           |    (CASE WHEN n_tokens > 0 THEN (500 * stop_hits) // n_tokens
           |          ELSE 0 END
           |     + (300 * (n_chars - punct_len)) // n_chars
           |     + least(2 * n_tokens, 200)) AS qp
           |  FROM m),
           |hist AS (SELECT lang, qp, count(*) AS n FROM q GROUP BY 1, 2),
           |cum AS (
           |  SELECT lang, qp,
           |    sum(n) OVER (PARTITION BY lang ORDER BY qp) AS cum
           |  FROM hist),
           |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS total
           |        FROM hist GROUP BY 1)
           |SELECT c.lang, max(t.total) AS n_docs,
           |  CAST(min(CASE WHEN c.cum * 10 >= t.total THEN c.qp END)
           |    AS BIGINT) AS p10,
           |  CAST(min(CASE WHEN c.cum * 2 >= t.total THEN c.qp END)
           |    AS BIGINT) AS p50,
           |  CAST(min(CASE WHEN c.cum * 10 >= t.total * 9 THEN c.qp END)
           |    AS BIGINT) AS p90
           |FROM cum c JOIN tot t USING (lang)
           |GROUP BY c.lang ORDER BY c.lang""".stripMargin,

      // Mirrors curation_report: full-corpus fingerprint/gram passes,
      // the sampled LSH-recall chain (TextDedup's shared CTE builders
      // over the doc_id % 1000000 < 1000 sample), sampled
      // contamination, and the embed_lsh_recall oracle embedded as a
      // derived table. Every value CAST to BIGINT (DuckDB SUM returns
      // HUGEINT); floor-div thresholds are cross-multiplied so both
      // engines compare integers.
      "curation_report" ->
        s"""WITH fpq AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(count(DISTINCT md5(trim(regexp_replace(lower(text),
           |      '\\s+', ' ', 'g')))) AS BIGINT) AS nfp
           |  FROM documents),
           |fps AS (
           |  SELECT doc_id, source,
           |    md5(substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
           |        1, 60)) AS fp
           |  FROM documents),
           |marked AS (
           |  SELECT source, doc_id, min(doc_id) OVER (PARTITION BY fp) AS rep
           |  FROM fps),
           |srcagg AS (
           |  SELECT source, count(*) AS n_docs,
           |    SUM(CASE WHEN doc_id > rep THEN 1 ELSE 0 END) AS n_dups
           |  FROM marked GROUP BY source),
           |grams AS (
           |  SELECT CAST(len(toks) - 2 AS BIGINT) AS total,
           |    CAST(len(list_distinct(list_transform(range(1, len(toks)-1),
           |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
           |      AS BIGINT) AS nd
           |  FROM (SELECT regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents)
           |  WHERE len(toks) >= 3),
           |${TextDedup.docsSqlFrom(
            "(SELECT doc_id, text FROM documents WHERE doc_id % 1000000 < 1000)")},
           |${TextDedup.dfShingledSqlCap(TextDedup.MAX_DF)},
           |${TextDedup.lshCandSql(8, 4)},
           |found AS (
           |  SELECT a, b FROM (
           |    SELECT c.a, c.b, len(list_intersect(da.sh, db.sh)) AS ninter,
           |      len(da.sh) AS na, len(db.sh) AS nb
           |    FROM cand c
           |    JOIN shingled da ON da.doc_id = c.a
           |    JOIN shingled db ON db.doc_id = c.b)
           |  WHERE CAST(ninter AS DOUBLE) /
           |        CAST(na + nb - ninter AS DOUBLE) >= 0.5),
           |tcand AS (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |  FROM inv x JOIN inv y ON x.s = y.s AND x.doc_id < y.doc_id),
           |truthq AS (
           |  SELECT a, b FROM (
           |    SELECT c.a, c.b, len(list_intersect(da.sh, db.sh)) AS ninter,
           |      len(da.sh) AS na, len(db.sh) AS nb
           |    FROM tcand c
           |    JOIN shingled da ON da.doc_id = c.a
           |    JOIN shingled db ON db.doc_id = c.b)
           |  WHERE CAST(ninter AS DOUBLE) /
           |        CAST(na + nb - ninter AS DOUBLE) >= 0.5),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n_matched
           |      FROM found f JOIN truthq t ON f.a = t.a AND f.b = t.b),
           |cev AS (
           |  SELECT DISTINCT s
           |  FROM (SELECT doc_id, unnest(sh) AS s FROM docs
           |        WHERE doc_id % 50 = 0)),
           |ctr AS (
           |  SELECT doc_id, s
           |  FROM (SELECT doc_id, unnest(sh) AS s FROM docs
           |        WHERE doc_id % 50 <> 0)),
           |cagg AS (
           |  SELECT tr.doc_id, count(*) AS ns,
           |    SUM(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS nh
           |  FROM ctr tr LEFT JOIN cev ev USING (s)
           |  GROUP BY tr.doc_id),
           |emb AS (SELECT * FROM (${SimilarityQ.embedRecallOracleSql}) e)
           |SELECT metric, value FROM (
           |  SELECT 'corpus_docs' AS metric, n AS value FROM fpq
           |  UNION ALL SELECT 'exact_dup_permille',
           |    CAST((1000 * (n - nfp)) // n AS BIGINT) FROM fpq
           |  UNION ALL SELECT 'top_source_dup_permille',
           |    CAST(max((1000 * n_dups) // n_docs) AS BIGINT) FROM srcagg
           |  UNION ALL SELECT 'repetition_dup_permille',
           |    CAST((1000 * sum(total - nd)) // sum(total) AS BIGINT)
           |    FROM grams
           |  UNION ALL SELECT 'lsh_recall_permille',
           |    CAST((1000 * (SELECT n_matched FROM m)) //
           |      nullif((SELECT count(*) FROM truthq), 0) AS BIGINT)
           |  UNION ALL SELECT 'lsh_precision_permille',
           |    CAST((1000 * (SELECT n_matched FROM m)) //
           |      nullif((SELECT count(*) FROM found), 0) AS BIGINT)
           |  UNION ALL SELECT 'contamination_docs_permille',
           |    CAST((1000 * SUM(CASE WHEN 2 * nh >= ns THEN 1 ELSE 0 END)) //
           |      nullif(count(*), 0) AS BIGINT) FROM cagg
           |  UNION ALL SELECT 'embed_recall_permille', recall_permille
           |    FROM emb
           |  UNION ALL SELECT 'embed_precision_permille', precision_permille
           |    FROM emb)
           |ORDER BY metric""".stripMargin
    )
  }
}
