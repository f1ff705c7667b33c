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
    */
  def shingleDocs(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), TextFns.shingleSet(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)

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

  /** 16-bit SimHash signature from the shingle set: bit b is the sign of
    * sum over shingles of (2*bit_b(md5(s)) - 1), where bit_b is the lowest
    * bit of the b-th hex digit. Scan-side only; each shingle is hashed
    * exactly once (the md5 array is materialized before the 16 bit-sums).
    */
  def withSimhash(shingled: DataFrame, nBits: Int = 16): DataFrame = {
    val withHashes = shingled.withColumn("shm", transform(col("sh"), s => md5(s)))
    val bitSums = (0 until nBits).map { b =>
      aggregate(col("shm"), lit(0L),
        (acc, m) => acc + (TextFns.hexVal(substring(m, b + 1, 1)) % 2 * 2 - 1))
    }
    val value = bitSums.zipWithIndex
      .map { case (sm, b) => when(sm > 0, lit(1L * (1L << b))).otherwise(lit(0L)) }
      .reduce(_ + _)
    withHashes.withColumn("simhash", value).drop("shm")
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
    val q = embs.select(col("vec_id"), blockKey.as("blk"),
      VectorFns.quantize(col("embedding")).as("q"))
    val l = q.select(col("blk"), col("vec_id").as("a"), col("q").as("qa"))
    val r = q.select(col("blk"), col("vec_id").as("b"), col("q").as("qb"))
    l.join(r, Seq("blk"))
      .filter(col("a") < col("b"))
      .withColumn("cos", VectorFns.cosineQ(col("qa"), col("qb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("cos"))
  }
}
