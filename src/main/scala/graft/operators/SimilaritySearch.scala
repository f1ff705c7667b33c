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

  /** Product-quantization ANN (IVF-PQ's compression half): each candidate
    * is stored as `m` small codeword ids instead of its full vector, and
    * query-candidate distance is approximated by table lookup — the
    * memory tier that makes billion-vector search fit a cluster.
    *
    * Pipeline (one Lloyd round per subspace, all exact int64 L2):
    *   1. slice every vector into m contiguous subvectors (dims/m each);
    *   2. train a per-subspace codebook: seed from `seeds` (ksub vectors,
    *      cid = position), assign candidates, floor-mean update — the
    *      same relational Lloyd as [[Clustering]], keyed by (sub, cid);
    *   3. encode candidates: nearest updated codeword per subspace
    *      (m * log2(ksub) bits per vector — here 4 codes vs 64 dims);
    *   4. ADC: each query precomputes its distance to every codeword
    *      (m * ksub rows per query — tiny, broadcast), and a candidate's
    *      approximate distance is the sum of m table lookups on its codes.
    *
    * Scale shape: training/encoding broadcast the (m * ksub)-row codebook
    * against the candidates — no shuffle of the big side beyond the
    * (vec_id, sub)-keyed argmin aggregates; scoring joins the candidate
    * CODE table (m small ints per vector, not the vectors) against the
    * broadcast ADC table, then the bounded [[TopKAgg]] pre-reduces per
    * partition, so the exchange carries <= k rows per query per partition.
    * Ties break on (adist, c_vec) — deterministic, oracle-matched.
    */
  def pqTopK(queries: DataFrame, candidates: DataFrame, seeds: DataFrame,
             m: Int, dims: Int, k: Int): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val subDim = dims / m
    // (vec_id, sub, sv, svv): contiguous subvector slices + self-dot
    def slices(df: DataFrame) = df
      .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("q"))
      .select(col("vec_id"), explode(array((0 until m).map(i =>
        struct(lit(i).as("sub"),
          slice(col("q"), i * subDim + 1, subDim).as("sv"))): _*)).as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.sv").as("sv"))
      .withColumn("svv", VectorFns.dotQ(col("sv"), col("sv")))

    // nearest codeword per (vector, subspace) against a broadcast codebook
    // (cb: sub, cid, cv, cvv): argmin via struct ordering, ties to low cid
    def nearest(sv: DataFrame, cb: DataFrame) = sv
      .join(broadcast(cb), Seq("sub"))
      .withColumn("dist",
        col("svv") - lit(2L) * VectorFns.dotQ(col("sv"), col("cv")) + col("cvv"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("cid"))).as("mn"))
      .select(col("vec_id"), col("sub"), col("mn.cid").as("cid"))

    // persisted: the candidate slice table feeds three consumers (train
    // assign, codebook update, encode) and would otherwise re-quantize
    // and re-explode the corpus per consumer
    val candSv = slices(candidates)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seedCb = slices(seeds.select(col("cid").as("vec_id"), col("embedding")))
      .select(col("sub"), col("vec_id").as("cid"), col("sv").as("cv"),
        col("svv").as("cvv"))
    // one Lloyd round: assign to seeds, floor-mean update (exact < 2^53)
    val assigned = nearest(candSv, seedCb)
    val cb = assigned
      .join(candSv.select(col("vec_id"), col("sub"), col("sv")),
        Seq("vec_id", "sub"))
      .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("dim", "v")))
      .groupBy(col("sub"), col("cid"), col("dim"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
        .cast("long").as("cv1"))
      .groupBy(col("sub"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv1")))),
        s => s.getField("cv1")).as("cv"))
      .withColumn("cvv", VectorFns.dotQ(col("cv"), col("cv")))
      // m*ksub rows, but its lineage embeds the full training crossJoin —
      // persist so encode and ADC don't re-train the codebooks
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val codes = nearest(candSv, cb)
      .select(col("vec_id").as("c_vec"), col("sub"), col("cid").as("code"))
    // ADC tables: every (query, sub, codeword) distance — m*ksub rows/query
    val adc = slices(queries)
      .join(broadcast(cb), Seq("sub"))
      .select(col("vec_id").as("q_vec"), col("sub"), col("cid"),
        (col("svv") - lit(2L) * VectorFns.dotQ(col("sv"), col("cv")) +
          col("cvv")).as("qd"))
    val scored = codes
      .join(broadcast(adc),
        codes("sub") === adc("sub") && codes("code") === adc("cid"))
      .groupBy(col("q_vec"), col("c_vec"))
      .agg(sum(col("qd")).as("adist"))
      // reuse the bounded top-k reducer (orders score DESC): negate the
      // integer distance into the score slot, recover it after (exact —
      // adist < 2^35 for 64-dim 1e4-quantized vectors, doubles are exact
      // to 2^53)
      .withColumn("cos", -col("adist").cast("double"))
    topKPerQuery(scored, k)
      .select(col("q_vec"), col("rnk"), col("c_vec"),
        (-col("cos")).cast("long").as("adist"))
  }

  /** IVF-PQ ANN — the production composition of [[ivfTopK]] and
    * [[pqTopK]]: a coarse quantizer routes every candidate to one
    * inverted list, PQ encodes the RESIDUAL (vector minus its list's
    * centroid — residuals cluster much tighter than raw vectors, so the
    * same codebook budget quantizes them with far less error), and each
    * query probes its `nprobe` nearest lists, scoring only those lists'
    * codes through its per-list ADC tables. This is the memory/recall
    * tier a billion-vector corpus actually ships.
    *
    * Everything runs at (vector, dim) relational granularity — exact
    * int64 squared distances, floor-mean codebook updates, cid/pcid
    * tie-breaks — so the full pipeline hash-matches a SQL oracle.
    *
    * Scale shape: both assign steps broadcast dim-level centroid rows
    * against the candidates (shuffles keyed by (vec_id[, sub]) — the
    * fan-out is nlist resp. ksub per dim row, the standard O(N*d*k)
    * assign cost); the scoring join is keyed by (list, sub, code)
    * against the broadcast ADC tables and carries code rows, never raw
    * vectors; [[TopKAgg]] pre-reduces per partition.
    */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, coarse: DataFrame,
                m: Int, dims: Int, ksub: Int, k: Int, nprobe: Int): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val subDim = dims / m
    def dimsOf(df: DataFrame) = df
      .select(col("vec_id"),
        posexplode(VectorFns.quantize(col("embedding"))).as(Seq("dim", "v")))
    // coarse centroids at dim granularity: (ccid, dim, cv)
    val centD = dimsOf(coarse.select(col("ccid").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("ccid"), col("dim"), col("v").as("cv"))
    // nearest `keep` coarse centroids per vector, exact L2, ties to low ccid
    def coarseAssign(d: DataFrame, keep: Int) = {
      val dist = d.join(broadcast(centD), Seq("dim"))
        .withColumn("sq", (col("v") - col("cv")) * (col("v") - col("cv")))
        .groupBy(col("vec_id"), col("ccid")).agg(sum(col("sq")).as("dist"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist"), col("ccid"))
      dist.withColumn("rn", row_number().over(w)).filter(col("rn") <= keep)
        .select(col("vec_id"), col("ccid"))
    }
    val candD = dimsOf(candidates)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = coarseAssign(candD, 1)
    // residuals vs the assigned centroid, tagged with the subspace
    val rD = candD.join(ca, Seq("vec_id")).join(broadcast(centD), Seq("ccid", "dim"))
      .select(col("vec_id"), col("ccid"), col("dim"),
        (col("dim") / subDim).cast("int").as("sub"),
        (col("v") - col("cv")).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // PQ seeds: the ksub lowest candidate ids' residuals, pcid by rank
    // (TakeOrderedAndProject + a window over ksub rows — constant-size)
    val seedIds = candidates.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(ksub)
      .withColumn("pcid",
        row_number().over(Window.orderBy(col("vec_id"))) - 1)
    val cw0 = rD.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("pcid"), col("sub"), col("dim"), col("rv").as("cw"))
    // nearest codeword per (vector, subspace) against a broadcast codebook
    def pqAssign(cb: DataFrame) = {
      val dist = rD.join(broadcast(cb.drop("sub")), Seq("dim"))
        .withColumn("sq", (col("rv") - col("cw")) * (col("rv") - col("cw")))
        .groupBy(col("vec_id"), col("sub"), col("pcid"))
        .agg(sum(col("sq")).as("dist"))
      dist.groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("dist"), col("pcid"))).as("mn"))
        .select(col("vec_id"), col("sub"), col("mn.pcid").as("pcid"))
    }
    // one Lloyd round on residuals: assign to seeds, floor-mean update
    val cb = rD.join(pqAssign(cw0), Seq("vec_id", "sub"))
      .groupBy(col("pcid"), col("dim"), col("sub"))
      .agg(floor(sum(col("rv")).cast("double") / count(lit(1)))
        .cast("long").as("cw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codes = pqAssign(cb)
      .join(ca, Seq("vec_id"))
      .select(col("vec_id").as("c_vec"), col("ccid"), col("sub"),
        col("pcid").as("code"))
    // query residuals vs EACH probed centroid, then per-list ADC tables
    val qa = coarseAssign(dimsOf(queries), nprobe)
    val qrD = dimsOf(queries).join(qa, Seq("vec_id"))
      .join(broadcast(centD), Seq("ccid", "dim"))
      .select(col("vec_id"), col("ccid"), col("dim"),
        (col("dim") / subDim).cast("int").as("sub"),
        (col("v") - col("cv")).as("rvq"))
    val adc = qrD.join(broadcast(cb.drop("sub")), Seq("dim"))
      .withColumn("sq", (col("rvq") - col("cw")) * (col("rvq") - col("cw")))
      .groupBy(col("vec_id").as("q_vec"), col("ccid"), col("sub"),
        col("pcid").as("code"))
      .agg(sum(col("sq")).as("qd"))
    val scored = codes
      .join(broadcast(adc), Seq("ccid", "sub", "code"))
      .groupBy(col("q_vec"), col("c_vec"))
      .agg(sum(col("qd")).as("adist"))
      .withColumn("cos", -col("adist").cast("double"))
    topKPerQuery(scored, k)
      .select(col("q_vec"), col("rnk"), col("c_vec"),
        (-col("cos")).cast("long").as("adist"))
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
