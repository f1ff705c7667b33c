package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

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

  /** Exact top-k neighbors for each query vector (excluding self-matches
    * by construction: candidates and queries are disjoint id ranges).
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val ql = quantized(queries).select(col("vec_id").as("q_vec"), col("q").as("qq"), col("nrm").as("nq"))
    val cl = quantized(candidates).select(col("vec_id").as("c_vec"), col("q").as("cq"), col("nrm").as("nc"))
    val scored = cl.crossJoin(broadcast(ql))
      .withColumn("cos", pairCos)
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cos").desc, col("c_vec"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_vec"), col("rnk"), col("c_vec"), col("cos"))
  }

  /** LSH-bucketed ANN: probe only candidates in the query's bucket. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nBits: Int, dims: Int): DataFrame = {
    def bucketed(df: DataFrame) = quantized(df)
      .withColumn("bucket", VectorFns.lshBucket(col("q"), nBits, dims))
    val ql = bucketed(queries).select(col("bucket"), col("vec_id").as("q_vec"), col("q").as("qq"), col("nrm").as("nq"))
    val cl = bucketed(candidates).select(col("bucket"), col("vec_id").as("c_vec"), col("q").as("cq"), col("nrm").as("nc"))
    val scored = cl.join(broadcast(ql), Seq("bucket"))
      .withColumn("cos", pairCos)
    val w = Window.partitionBy(col("q_vec"))
      .orderBy(col("cos").desc, col("c_vec"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_vec"), col("rnk"), col("c_vec"), col("cos"))
  }
}
