package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Lloyd-iteration k-means over quantized embedding vectors (SURVEY §2.9
  * [EXT] — the clustering workload behind IVF index builds and corpus
  * topic bucketing; ref: LMS_ERP_Data_Integration has no ML surface, this
  * is north-star scope like the ANN tiers).
  *
  * Scale shape, per iteration:
  *   - assignment: candidates never shuffle — the k centroids broadcast
  *     and every vector scores its k distances map-side (the codegen'd
  *     [[VectorFns.dotQ]] kernel), then one hash aggregate keyed by
  *     vector id picks the argmin. At 100 TB this is a single pass over
  *     the embedding table per iteration with only (id, cid, dist)
  *     leaving the map side.
  *   - update: relational dimension-wise mean — posexplode to
  *     (cid, dim, v) and one hash aggregate keyed by (cid, dim) with
  *     map-side partial sums; k×dims result rows. No collect() anywhere:
  *     the new centroid table stays distributed and re-broadcasts.
  *
  * Determinism / oracle portability: distances are exact int64
  * (dist² = ⟨a,a⟩ - 2⟨a,c⟩ + ⟨c,c⟩ over quantized vectors), argmin
  * tie-breaks on cid via struct ordering, and centroid updates use
  * floor(sum/n) in double (exact below 2^53) — so a fixed iteration
  * count hash-matches DuckDB bit-for-bit.
  */
object Clustering {

  /** One assignment pass: nearest centroid per vector, exact integer
    * squared distance. `vecs` = (id, qv, sq=⟨qv,qv⟩); `cents` =
    * (cid, cv, csq=⟨cv,cv⟩).
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vecs.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("sq") - lit(2L) * VectorFns.dotQ(col("qv"), col("cv")) + col("csq"))
    // argmin via struct ordering: (dist, cid) lexicographic min — ties
    // go to the lowest cid, matching ORDER BY dist, cid in the oracle.
    scored.groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col("id"), col("m.dist").as("dist"), col("m.cid").as("cid"))
  }

  /** Dimension-wise floor-mean of the vectors assigned to each centroid,
    * rebuilt into centroid arrays. `assigned` = (id, cid); `vecs` as in
    * [[assign]]. floor(sum/n) keeps centroids integral (quantized
    * k-means), so the next iteration's distances stay exact.
    */
  def update(assigned: DataFrame, vecs: DataFrame): DataFrame =
    assigned.join(vecs.select(col("id"), col("qv")), Seq("id"))
      .select(col("cid"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("cv1"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv1")))),
        s => s.getField("cv1")).as("cv"))
      .withColumn("csq", VectorFns.dotQ(col("cv"), col("cv")))

  /** Fixed-iteration Lloyd k-means. Initial centroids are the vectors
    * with id < k (deterministic seed — requires ids 0..k-1 to exist,
    * checked below). Returns the per-cluster summary after `iters`
    * (assign, update) rounds: cluster id, member count, exact inertia
    * (Σ dist² to the assigned centroid), and the updated centroid's
    * dimension sum — all exact integers.
    *
    * Shrinking-k semantics (standard Lloyd behavior, intentional): if a
    * centroid's cluster empties during an iteration, [[update]] drops it
    * and later iterations run with fewer than k centroids — there is no
    * re-seeding. An exact-SQL oracle performs the identical drop, so the
    * two engines agree; callers who need exactly k clusters out should
    * check the returned row count.
    */
  def kmeansSummary(vecs0: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, "kmeansSummary needs at least one iteration")
    // persisted: the quantized-vector table feeds the seed guard, every
    // iteration's assign AND update, and the final counts (ScanAudit:
    // embeddings x9 for 2 iterations) — without the cache each consumer
    // re-scans + re-quantizes the corpus
    val vecs = vecs0.withColumn("sq", VectorFns.dotQ(col("qv"), col("qv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = vecs.filter(col("id") >= 0 && col("id") < k)
      .select(col("id").as("cid"), col("qv").as("cv"), col("sq").as("csq"))
    // Seed-set guard: the [0,k) filter must yield exactly k rows with k
    // DISTINCT ids — count alone would admit duplicated ids (duplicate
    // centroids) — or the first iteration silently runs degenerate. The
    // filter prunes before the aggregate, so this is a cheap pushed
    // scan, not a pass over the full table.
    val seedRow = cents
      .agg(count(lit(1)).as("n"), countDistinct(col("cid")).as("nd")).head()
    val (nSeeds, nDistinct) = (seedRow.getLong(0), seedRow.getLong(1))
    require(nSeeds == k && nDistinct == k,
      s"kmeansSummary seeds from ids 0..${k - 1} but found $nSeeds rows " +
        s"($nDistinct distinct ids); each of 0..${k - 1} must appear exactly once")
    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      assigned = assign(vecs, cents)
      cents = update(assigned.select(col("id"), col("cid")), vecs)
    }
    val counts = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("inertia"))
    val sums = cents
      .select(col("cid"), posexplode(col("cv")).as(Seq("dim", "v")))
      .groupBy(col("cid")).agg(sum(col("v")).as("centroid_sum"))
    counts.join(sums, Seq("cid"))
  }
}
