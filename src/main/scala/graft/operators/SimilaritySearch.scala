package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorFns}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.9; PAPERS.md top-k anchors).
  *
  * Two tiers:
  *  - brute force: broadcast the (small) query set against all candidates,
  *    exact quantized cosine, per-query top-k via ranking window. The
  *    baseline — linear in candidates, embarrassingly parallel, no index.
  *  - LSH-bucketed: both sides keyed by a sign-random-projection bucket
  *    (VectorFns.lshBucket); the candidate scan prunes to same-bucket
  *    rows. At 100 TB the bucket is the shuffle/partition key, turning a
  *    full scan per query into a bucket-local probe (recall traded for a
  *    ~2^nBits fan-in reduction).
  */
object SimilaritySearch {

  private def quantized(embs: DataFrame) =
    embs.select(col("vec_id"), VectorFns.quantize(col("embedding")).as("q"))
      .withColumn("nrm", VectorFns.normQ(col("q")))

  /** Pair cosine from precomputed per-side norms: one dot per pair instead
    * of three (norms are per-vector, computed pre-join); identical doubles
    * to VectorFns.cosineQ.
    */
  private def pairCos = VectorFns.dotQ(col("qq"), col("cq")) / (col("nq") * col("nc"))

  /** Per-query exact top-k over scored (q_vec, c_vec, cos) rows via the
    * bounded [[TopKAgg]] aggregator: the map side partially reduces each
    * partition to at most k entries per query BEFORE the shuffle, so the
    * exchange carries <= k * partitions rows per query instead of every
    * scored candidate — the difference between shuffling k rows and
    * shuffling the whole corpus at 100 TB. A ranking window would sort
    * the full scored set per query after a total shuffle.
    *
    * Ordering matches row_number over (cos DESC, c_vec ASC): total and
    * deterministic, so results hash-match the window formulation.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(TopKAgg.TopK(k), TopKAgg.entryEncoder)
    scored
      .groupBy(col("q_vec"))
      .agg(topk(col("cos"), col("c_vec")).as("top"))
      .select(col("q_vec"), posexplode(col("top")))
      .select(col("q_vec"), (col("pos") + 1).as("rnk"),
        col("col._2").as("c_vec"), col("col._1").as("cos"))
  }

  /** Exact top-k neighbors for each query vector (excluding self-matches
    * by construction: candidates and queries are disjoint id ranges).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val ql = quantized(queries).select(col("vec_id").as("q_vec"), col("q").as("qq"), col("nrm").as("nq"))
    val cl = quantized(candidates).select(col("vec_id").as("c_vec"), col("q").as("cq"), col("nrm").as("nc"))
    val scored = cl.crossJoin(broadcast(ql))
      .withColumn("cos", pairCos)
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN: candidates are assigned to their nearest
    * centroid once (the "coarse quantizer"); each query probes only its
    * `nprobe` nearest centroids' lists, turning a full scan into a
    * ~nprobe/nlist fraction of it.
    *
    * Centroids are caller-supplied (here: a deterministic id-range sample;
    * a production pipeline would plug in k-means iterates — same dataflow).
    * Assignment and probing use the same exact quantized cosine as
    * scoring, ties broken by centroid id, so results are deterministic.
    *
    * Scale shape: assignment is a broadcast of the (small) centroid set
    * against candidates — no shuffle of the big side; the probe join
    * shuffles on centroid id, the blocking key that bounds the scored
    * pair space.
    */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val cent = quantized(centroids)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("nrm").as("nc"))
    def assign(df: DataFrame, keep: Int) = {
      val scored = df.crossJoin(broadcast(cent))
        .withColumn("ccos",
          VectorFns.dotQ(col("q"), col("cq")) / (col("nrm") * col("nc")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      scored.withColumn("crnk", row_number().over(w))
        .filter(col("crnk") <= keep)
        .select(col("vec_id"), col("cid"), col("q"), col("nrm"))
    }
    val lists = assign(quantized(candidates), 1)
      .select(col("cid"), col("vec_id").as("c_vec"), col("q").as("cq2"), col("nrm").as("nc2"))
    val probes = assign(quantized(queries), nprobe)
      .select(col("cid"), col("vec_id").as("q_vec"), col("q").as("qq"), col("nrm").as("nq"))
    // a candidate can reach one query via two probed lists only if it
    // sat in both — impossible with single-assignment (keep=1)
    val scored = lists.join(probes, Seq("cid"))
      .withColumn("cos",
        VectorFns.dotQ(col("qq"), col("cq2")) / (col("nq") * col("nc2")))
    topKPerQuery(scored, k)
  }

  private def bucketed(df: DataFrame, nBits: Int, dims: Int) = quantized(df)
    .withColumn("bucket", VectorFns.lshBucket(col("q"), nBits, dims))

  /** LSH-bucketed ANN: probe only candidates in the query's bucket. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nBits: Int, dims: Int): DataFrame = {
    val ql = bucketed(queries, nBits, dims).select(col("bucket"), col("vec_id").as("q_vec"), col("q").as("qq"), col("nrm").as("nq"))
    val cl = bucketed(candidates, nBits, dims).select(col("bucket"), col("vec_id").as("c_vec"), col("q").as("cq"), col("nrm").as("nc"))
    val scored = cl.join(broadcast(ql), Seq("bucket"))
      .withColumn("cos", pairCos)
    topKPerQuery(scored, k)
  }

  /** Multi-probe LSH ANN: each query probes its own bucket PLUS every
    * bucket at Hamming distance 1 (one sign bit flipped) — the standard
    * recall fix for sign-random-projection LSH, where a true neighbor
    * sitting near one hyperplane lands one bit away. nBits+1 probes per
    * query recover most of brute-force recall at (nBits+1)/2^nBits of
    * its cost; the candidate side is untouched (each candidate still
    * lives in exactly ONE bucket, so probes never produce duplicate
    * pairs and the shuffle stays keyed by bucket).
    */
  def lshMultiProbeTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                        nBits: Int, dims: Int): DataFrame = {
    val probes = array(col("bucket") +:
      (0 until nBits).map(b => col("bucket").bitwiseXOR(lit(1 << b))): _*)
    val ql = bucketed(queries, nBits, dims)
      .select(explode(probes).as("bucket"),
        col("vec_id").as("q_vec"), col("q").as("qq"), col("nrm").as("nq"))
    val cl = bucketed(candidates, nBits, dims).select(col("bucket"), col("vec_id").as("c_vec"), col("q").as("cq"), col("nrm").as("nc"))
    val scored = cl.join(broadcast(ql), Seq("bucket"))
      .withColumn("cos", pairCos)
    topKPerQuery(scored, k)
  }
}
