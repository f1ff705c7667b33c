package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration damped PageRank in exact integer arithmetic
  * (SURVEY §2.9 [EXT] — iterative graph centrality, the link-analysis
  * sibling of the connected-components operator in [[Dedup]]; the
  * reference has no graph surface, this is north-star scope).
  *
  * Determinism / oracle portability: ranks are scaled integers and the
  * update is
  *
  *   rank'(v) = (15·scale + 85·Σ_{u→v} (rank(u) div deg(u))) div 100
  *
  * — floor division everywhere, so a fixed iteration count hash-matches
  * a DuckDB chain of CTEs bit-for-bit (no doubles, no convergence
  * epsilon). The floor-divided contributions leak a little probability
  * mass vs real-valued PageRank; both engines leak identically, and the
  * ranking it induces is the standard one.
  *
  * Scale shape, per iteration: one shuffle join of the rank table with
  * the degree-annotated edge list on src, one hash aggregate keyed by
  * dst with map-side partial sums. The edge list is the big side and is
  * scanned once per iteration; ranks are |V| rows. Nothing collects to
  * the driver, and the rank lineage is CUT every `checkpointEvery`
  * iterations (eager checkpoint, the [[Dedup.componentsFromPairs]]
  * pattern) — without the cut the plan tree nests one join + aggregate
  * per iteration and analysis/optimization cost explodes at tens of
  * iterations even though each executed stage is cheap.
  *
  * Contract: every node must appear as a `src` (for undirected/bipartite
  * graphs pass both edge directions) — sinks would otherwise swallow
  * their rank silently. Nodes with no IN-edges are kept: each iteration
  * rebuilds the rank table from the node set with a left join, so a
  * source-only node holds its teleport share (15·scale div 100) instead
  * of silently vanishing after the first iteration.
  */
object PageRank {

  /** `edges`: (src: long, dst: long), pre-deduplicated. Returns
    * (node: long, rank: long) after `iters` damped updates from a
    * uniform start of `scale` per node.
    *
    * `checkpointEvery`: cut the rank lineage after this many iterations
    * (eager; `checkpointDir` selects a reliable checkpoint for real
    * clusters, otherwise localCheckpoint). Checkpoints change no values
    * — only the plan depth — so any cadence yields identical ranks.
    */
  def ranks(edges: DataFrame, iters: Int, scale: Long = 1000000L,
            checkpointEvery: Int = 8,
            checkpointDir: Option[String] = None): DataFrame = Ckpt.scoped {
    require(iters >= 1, "PageRank needs at least one iteration")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val spark = edges.sparkSession
    val prevCheckpointDir = spark.sparkContext.getCheckpointDir
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def save(df: DataFrame): DataFrame =
      Ckpt.track(
        if (checkpointDir.isDefined) df.checkpoint(eager = true)
        else df.localCheckpoint(eager = true))
    try {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // Persist the degree-annotated edge list: iteration i's lineage
    // nests iterations 1..i-1, so the final plan otherwise embeds (and
    // recomputes) this subtree once per iteration — ReuseExchange does
    // not dedupe it because per-consumer pruning makes the copies
    // structurally different. Many consumers, narrow columns: the
    // persist profile. At sf0.1 the effect is small (~5%, the edge
    // build is one distinct over the fact table) but it grows linearly
    // with iteration count and scan cost.
    val ed = edges.join(deg, Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // nodes is consumed by EVERY iteration's rank rebuild (and the
    // initial ranks) — unpersisted, each round re-runs the degree
    // aggregate over the raw edge lineage (ScanAudit: lineitem x8 for
    // 6 iterations in pagerank_bipartite). personalizedRanks already
    // persisted its node table; same treatment here.
    val nodes = deg.select(col("src").as("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(scale))
    var lastCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = ed.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"(15 * cast($scale as bigint) + 85 * coalesce(s, 0)) div 100")
            .as("rank"))
      // Cut the growing lineage; the LAST iteration stays lazy so the
      // caller's downstream plan composes with it as usual. Each new
      // eager periodic checkpoint supersedes the previous one.
      if (i % checkpointEvery == 0 && i < iters) {
        val prevCkpt = lastCkpt
        ranks = save(ranks)
        lastCkpt = ranks
        if (prevCkpt != null) Ckpt.release(prevCkpt)
      }
    }
    ranks
    } finally {
      // every checkpoint is eager, so restoring the dir here is safe —
      // no lazy checkpoint of ours can fire after the call returns
      if (checkpointDir.isDefined)
        prevCheckpointDir.foreach(spark.sparkContext.setCheckpointDir)
    }
  }

  /** Personalized PageRank: the damped walk teleports to the SEED SET
    * instead of everywhere, so rank measures proximity to the seeds —
    * the graph-similarity primitive behind "related items" and
    * seed-expansion retrieval. Update (floor division everywhere, same
    * oracle-portable integer discipline as [[ranks]]):
    *
    *   rank'(v) = (15·scale·[v ∈ S] + 85·Σ_{u→v} (rank(u) div deg(u))) div 100
    *
    * with rank0(v) = scale·[v ∈ S]: mass enters only at seeds and
    * diffuses outward, decaying 0.85 per hop — after i iterations only
    * nodes within i hops of a seed hold rank, which is the locality
    * that makes PPR cheap relative to global PageRank.
    *
    * `seeds`: (node: long), assumed catalog-sized — it broadcasts for
    * the per-node membership flag, so the per-iteration dataflow is
    * identical to [[ranks]] (one shuffle join on src + one hash
    * aggregate on dst; the flagged node table is persisted once and
    * reused every round). Same src-coverage contract as [[ranks]].
    */
  def personalizedRanks(edges: DataFrame, seeds: DataFrame, iters: Int,
                        scale: Long = 1000000L, checkpointEvery: Int = 8,
                        checkpointDir: Option[String] = None): DataFrame = Ckpt.scoped {
    require(iters >= 1, "personalizedRanks needs at least one iteration")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val spark = edges.sparkSession
    val prevCheckpointDir = spark.sparkContext.getCheckpointDir
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def save(df: DataFrame): DataFrame =
      Ckpt.track(
        if (checkpointDir.isDefined) df.checkpoint(eager = true)
        else df.localCheckpoint(eager = true))
    try {
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val ed = edges.join(deg, Seq("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // node table with its seed flag: consumed by every iteration's
      // rebuild (and the initial ranks), so persist — without it the
      // degree aggregate + broadcast join re-run once per round.
      val nodes = deg.select(col("src").as("node"))
        .join(broadcast(seeds.select(col("node")).distinct()
          .withColumn("is_seed", lit(1L))), Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var ranks = nodes.select(col("node"),
        (col("is_seed") * scale).as("rank"))
      var lastCkpt: DataFrame = null
      for (i <- 1 to iters) {
        val contrib = ed.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("rank div deg").as("c"))
          .groupBy(col("dst"))
          .agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            expr(s"(15 * cast($scale as bigint) * is_seed " +
              "+ 85 * coalesce(s, 0)) div 100").as("rank"))
        // each new eager periodic checkpoint supersedes the previous
        if (i % checkpointEvery == 0 && i < iters) {
          val prevCkpt = lastCkpt
          ranks = save(ranks)
          lastCkpt = ranks
          if (prevCkpt != null) Ckpt.release(prevCkpt)
        }
      }
      ranks
    } finally {
      if (checkpointDir.isDefined)
        prevCheckpointDir.foreach(spark.sparkContext.setCheckpointDir)
    }
  }
}
