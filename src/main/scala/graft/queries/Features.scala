package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns
import Util._

/** Feature-engineering queries (SURVEY §2.9 [EXT]): the two encoding
  * steps between a curated corpus and a trainable design matrix —
  * leakage-safe target encoding (the categorical-to-numeric transform
  * whose naive form leaks the label) and the hashing-trick collision
  * audit (the diagnostic that picks a feature-vector width BEFORE
  * training discovers it was too small). House rules: exact integer
  * arithmetic at every oracle boundary (divs on non-negative operands
  * only), bounded outputs, single scans with persisted shared subtrees.
  */
object Features {

  /** Smoothing pseudo-count for target encoding (Micci-Barreca 2001,
    * "A preprocessing scheme for high-cardinality categorical
    * attributes"): encoded = (oof_sum + M*prior) / (oof_n + M). M > 0
    * also makes the division total — a category seen in only one fold
    * still encodes (to ~the prior) instead of dividing by zero.
    */
  private val SMOOTH_M = 10L

  /** THE OOF-encoder derivation — single definition shared by the batch
    * query and the streaming state mirror (`StreamingOps
    * .targetEncodeStateEachBatch`), so a formula fix can never
    * desynchronize the two (the round-4 quality-formula lesson). Input:
    * a (cat, fold, n, s) label-sum table (bounded: |cats| x folds
    * rows); output: the smoothed out-of-fold encoder. The input is
    * referenced by the window chain AND the 1-row prior — callers
    * persist it (batch) or read it from a tiny parquet snapshot
    * (streaming).
    */
  def oofEncode(cf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cat"))
    val prior = cf.agg(sum(col("s")).as("gs"), sum(col("n")).as("gn"))
    cf.withColumn("tn", sum(col("n")).over(w))
      .withColumn("ts", sum(col("s")).over(w))
      .crossJoin(broadcast(prior))
      .select(col("cat"), col("fold"), col("n").as("n_rows"),
        expr(s"((ts - s) + $SMOOTH_M * (gs div gn))" +
          s" div ((tn - n) + $SMOOTH_M)").as("encoded_cents"))
      .orderBy(col("cat"), col("fold"))
  }

  /** The (cat, fold, cents) projection of orders the encoder sums —
    * shared with the streaming mirror's per-batch delta.
    */
  def encodeBase(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderpriority").as("cat"),
      (col("o_orderkey") % 5).as("fold"),
      (d2(col("o_totalprice")) * 100).cast("long").as("cents"))

  /** Hashed-feature widths to audit. 16 is deliberately saturated at
    * every SF (the collision logic is exercised even on the sf0.001
    * smoke corpus — never a vacuous gate); 4096 brackets the width a
    * real bigram vocabulary needs.
    */
  private val HASH_DIMS = Seq(16L, 256L, 1024L, 4096L)

  def queries: Map[String, Q] = Map(

    // Out-of-fold target encoding — the leakage-safe categorical
    // encoder: each (category, fold) cell is encoded from the OTHER
    // folds' label sums only (encoded rows never see their own fold's
    // targets — the classic train-time leak), smoothed toward the
    // global prior with M=10 pseudo-counts. All exact cents: the OOF
    // mean is one integer division of non-negative sums at the edge.
    // Scale shape: ONE fact scan into a (cat, fold) hash aggregate
    // (map-side combinable, output = |cats| x folds rows at any SF);
    // the complement sums come from a window over THAT bounded table;
    // the prior rides a 1-row broadcast. The encoder table is what
    // ships to training — the fact table is never re-read per fold.
    "target_encode_oof" -> ((s, dir) => {
      val cf = encodeBase(orders(s, dir))
        .groupBy(col("cat"), col("fold"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      oofEncode(cf)
    }),

    // Hashing-trick collision audit over the corpus BIGRAM vocabulary
    // (the n-gram feature space a linear text model actually hashes):
    // for each candidate width D, how many distinct features survive
    // (buckets used), how many are forced to share a slot (excess), and
    // the worst pile-up (max load) — the numbers that pick D. The hash
    // is the portable 52-bit md5 prefix (same family as the sampling /
    // priority queries), so Spark and DuckDB bucket identically.
    // Scale shape: tokenize once, bigram via a doc-keyed window, ONE
    // distinct to the vocabulary table (vocab-bounded from there on);
    // the 4 widths stack as an in-row explode of the SAME hash — the
    // corpus is scanned once, the vocab table once.
    "feature_hash_collisions" -> ((s, dir) => {
      val toks = documents(s, dir)
        .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))))
        .toDF("doc_id", "pos", "tok")
      val dw = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val vocab = toks
        .withColumn("nxt", lead(col("tok"), 1).over(dw))
        .filter(col("nxt").isNotNull)
        .select(concat(col("tok"), lit(" "), col("nxt")).as("feat"))
        .distinct()
        .withColumn("h", expr(
          "CAST(conv(substring(md5(feat), 1, 13), 16, 10) AS BIGINT)"))
      val stacked = vocab.select(explode(array(HASH_DIMS.map { d =>
        struct(lit(d).as("dim"), (col("h") % d).as("bucket"))
      }: _*)).as("x")).select(col("x.dim"), col("x.bucket"))
      stacked.groupBy(col("dim"), col("bucket"))
        .agg(count(lit(1)).as("load"))
        .groupBy(col("dim"))
        .agg(sum(col("load")).as("vocab_size"),
          count(lit(1)).as("buckets_used"),
          max(col("load")).as("max_load"))
        .select(col("dim"), col("vocab_size"), col("buckets_used"),
          (col("vocab_size") - col("buckets_used")).as("excess_features"),
          col("max_load"),
          expr("(1000 * buckets_used) div dim").as("occupancy_permille"))
        .orderBy(col("dim"))
    })
  )

  def oracles: Map[String, String] = Map(

    "target_encode_oof" ->
      s"""WITH base AS (
         |  SELECT o_orderpriority AS cat, o_orderkey % 5 AS fold,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS cents
         |  FROM orders),
         |cf AS (
         |  SELECT cat, fold, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s
         |  FROM base GROUP BY 1, 2),
         |tot AS (
         |  SELECT cat, fold, n, s,
         |    sum(n) OVER (PARTITION BY cat) AS tn,
         |    sum(s) OVER (PARTITION BY cat) AS ts
         |  FROM cf),
         |p AS (SELECT CAST(sum(s) AS BIGINT) AS gs,
         |             CAST(sum(n) AS BIGINT) AS gn FROM cf)
         |SELECT cat, CAST(fold AS BIGINT) AS fold, CAST(n AS BIGINT) AS n_rows,
         |  CAST(((ts - s) + $SMOOTH_M * (gs // gn))
         |    // ((tn - n) + $SMOOTH_M) AS BIGINT) AS encoded_cents
         |FROM tot, p ORDER BY cat, fold""".stripMargin,

    "feature_hash_collisions" ->
      s"""WITH t AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
         |  FROM documents),
         |u AS (
         |  SELECT doc_id, unnest(toks) AS tok,
         |    unnest(range(1, len(toks) + 1)) AS pos
         |  FROM t),
         |vocab AS (
         |  SELECT DISTINCT a.tok || ' ' || b.tok AS feat
         |  FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         |h AS (
         |  SELECT feat,
         |    CAST(('0x' || substr(md5(feat), 1, 13)) AS BIGINT) AS h
         |  FROM vocab),
         |stacked AS (
         |  SELECT d.dim, h.h % d.dim AS bucket
         |  FROM h, (VALUES (${HASH_DIMS.mkString("), (")})) AS d(dim)),
         |b AS (SELECT dim, bucket, count(*) AS load
         |      FROM stacked GROUP BY 1, 2)
         |SELECT CAST(dim AS BIGINT) AS dim,
         |  CAST(sum(load) AS BIGINT) AS vocab_size,
         |  CAST(count(*) AS BIGINT) AS buckets_used,
         |  CAST(sum(load) - count(*) AS BIGINT) AS excess_features,
         |  CAST(max(load) AS BIGINT) AS max_load,
         |  CAST((1000 * count(*)) // dim AS BIGINT) AS occupancy_permille
         |FROM b GROUP BY dim ORDER BY dim""".stripMargin
  )
}
