package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}

/** Deduplication operators for the LLM-training-data surface
  * (SURVEY §2.9; PAPERS.md anchors). Input contract: a documents table
  * (doc_id long, text string) / embeddings table (vec_id, embedding).
  *
  * Scale design (100 TB):
  *  - exact dedup: one hash-shuffle on the 32-char fingerprint, map-side
  *    partial aggregation.
  *  - MinHash/LSH: signatures are computed scan-side (no shuffle), then
  *    one shuffle keyed by (band_idx, band_hash); candidate pairs only for
  *    docs sharing a band bucket, so the O(n^2) pair space never
  *    materializes. Verification joins on doc_id — broadcastable when the
  *    candidate set is small, shuffle-join otherwise.
  *  - SimHash: pure scan-side signature; dedup is a groupBy on the value.
  *  - n-gram Jaccard: inverted-index self-join on shingle (shuffle keyed
  *    by shingle) — exact, for modest corpora or as the verify stage.
  *  - embedding near-dup: blocked pair join (label or LSH bucket as the
  *    blocking key) + exact quantized cosine.
  */
object Dedup {

  /** Exact dedup on normalized text: one representative (min doc_id) per
    * fingerprint. reference analogue: dropDuplicates(keys).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", TextFns.fingerprint(col("text")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_dups"))

  /** (doc_id, sh) with sh = distinct word-n-gram shingle set; docs with no
    * shingle (shorter than n tokens) are dropped.
    *
    * The token array is bound as a concrete column BEFORE the shingle
    * lambda references it: higher-order-function lambdas evaluate their
    * body per array element, so an inlined tokenizer expression would
    * re-run the regex once per element_at — O(tokens^2) per document.
    * Referencing an attribute keeps it O(tokens). (CollapseProject leaves
    * the projection split because the non-cheap tokenizer is referenced
    * more than once.)
    */
  def shingleDocs(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        array_distinct(TextFns.shingles(col("toks"), n)).as("sh"))

  /** MinHash signature columns sig0..sig{k-1}: per seed i, the min md5 of
    * "i#shingle" over the shingle set. md5 is the portable hash (identical
    * hex in DuckDB); min over lexicographic hex is order-insensitive.
    */
  def withMinhashSigs(shingled: DataFrame, k: Int): DataFrame =
    (0 until k).foldLeft(shingled) { (d, i) =>
      d.withColumn(s"sig$i",
        array_min(transform(col("sh"), s => md5(concat(lit(s"$i#"), s)))))
    }

  /** LSH banding: candidate pairs = docs sharing any band hash, verified
    * with exact Jaccard over the shingle sets; result pairs with
    * jaccard >= threshold. bands * rowsPerBand signatures are used.
    */
  def minhashLshPairs(docs: DataFrame, n: Int, bands: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = withMinhashSigs(shingleDocs(docs, n), k)
    val bandCols = (0 until bands).map { b =>
      md5(concat((0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}")): _*))
    }
    val banded = sigs
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_hash")))
    val l = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("a"))
    val r = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("b"))
    val cand = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
    verifyJaccard(cand, shingleDocs(docs, n), threshold)
  }

  /** Exact n-gram Jaccard pairs via inverted-index self-join — the
    * no-false-negative formulation (and the verify stage of LSH).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val shingled = shingleDocs(docs, n)
    val inv = shingled.select(col("doc_id"), explode(col("sh")).as("s"))
    val cand = inv.select(col("s"), col("doc_id").as("a"))
      .join(inv.select(col("s"), col("doc_id").as("b")), Seq("s"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
    verifyJaccard(cand, shingled, threshold)
  }

  /** Join candidate (a,b) pairs back to shingle sets and keep pairs with
    * exact Jaccard >= threshold. Set sizes are ints, the division is one
    * double op — deterministic.
    */
  private def verifyJaccard(cand: DataFrame, shingled: DataFrame,
                            threshold: Double): DataFrame = {
    val sa = shingled.select(col("doc_id").as("a"), col("sh").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("b"), col("sh").as("sh_b"))
    cand.join(sa, "a").join(sb, "b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** (doc_id, simhash): 16-bit SimHash signature from the shingle set —
    * bit b is the sign of sum over shingles of (2*bit_b(md5(s)) - 1),
    * where bit_b is the lowest bit of the b-th hex digit.
    *
    * Formulated as explode + hash-aggregate (16 conditional sums) rather
    * than per-row higher-order functions: HOF lambdas run interpreted,
    * while the exploded groupBy stays inside whole-stage codegen with
    * map-side partial aggregation — the shape that wins at 100 TB too
    * (the shuffle carries 16 longs per doc, not the shingle sets).
    */
  def withSimhash(shingled: DataFrame, nBits: Int = 16): DataFrame = {
    val ex = shingled
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), md5(col("s")).as("m"))
    val bitSums = (0 until nBits).map { b =>
      sum(TextFns.hexVal(substring(col("m"), b + 1, 1)) % 2 * 2 - 1).as(s"bs$b")
    }
    val agg = ex.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val value = (0 until nBits)
      .map(b => when(col(s"bs$b") > 0, lit(1L * (1L << b))).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), value.as("simhash"))
  }

  /** SimHash dedup: group identical signatures (Hamming distance 0). */
  def simhashDedup(docs: DataFrame, n: Int, nBits: Int = 16): DataFrame =
    withSimhash(shingleDocs(docs, n), nBits)
      .groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_docs"))

  /** Embedding near-duplicate pairs: blocked pair join + exact quantized
    * cosine >= threshold. `blockKey` bounds the pair space (a label, or an
    * LSH bucket from VectorFns.lshBucket at scale).
    */
  def embeddingNearDup(embs: DataFrame, blockKey: Column, threshold: Double): DataFrame = {
    // Norms are computed once per vector before the pair join (n of them),
    // not once per pair (n^2 of them); same doubles, same cosine values.
    val q = embs.select(col("vec_id"), blockKey.as("blk"),
        VectorFns.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFns.normQ(col("q")))
    val l = q.select(col("blk"), col("vec_id").as("a"), col("q").as("qa"), col("nrm").as("na"))
    val r = q.select(col("blk"), col("vec_id").as("b"), col("q").as("qb"), col("nrm").as("nb"))
    l.join(r, Seq("blk"))
      .filter(col("a") < col("b"))
      .withColumn("cos", VectorFns.dotQ(col("qa"), col("qb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
