package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (coreness) of an undirected graph by iterative
  * peeling — the density profiler of the dup-graph family (components =
  * who is connected, triangles = local clustering, coreness = how deep
  * each node sits in the dense part). On a duplicate graph, coreness
  * separates incidental near-dup pairs (core 1) from replica cliques
  * (core = clique size - 1) — the standard signal for "this cluster is a
  * template/mirror, collapse it aggressively".
  *
  * Algorithm: for k = 1, 2, …, repeatedly delete nodes of degree < k
  * (cascading) until the k-core stabilizes; a node removed while peeling
  * level k has coreness k-1 (it survived the (k-1)-core but not the
  * k-core); when the graph empties, every remaining assignment is final.
  *
  * Scale shape: every round is one degree aggregate (map-side combinable
  * count keyed by node) plus two anti-joins keyed by the removed-node
  * set — no all-pairs structure anywhere, and the edge table only ever
  * SHRINKS. Each new edge table is eagerly checkpointed
  * (local/reliable, matching [[Dedup.componentsFromPairs]]'s mode
  * switch) so the plan never accretes rounds of lineage and the loop's
  * convergence checks don't re-execute upstream candidate generation
  * (LSH, blocking…). Rounds are bounded by the degeneracy of the graph
  * — small for dup graphs (max clique size), and `maxRounds` backstops
  * pathological chains the way componentsFromPairs' maxIters does.
  */
object KCore {

  /** Coreness per node from an (a, b) pair list (a < b convention, one
    * row per undirected edge). Output: (node, coreness) for every node
    * appearing in at least one pair; coreness >= 1 by construction.
    */
  def coreness(pairs: DataFrame, maxK: Int = 64,
               maxRounds: Int = 400,
               checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    val prevCheckpointDir = spark.sparkContext.getCheckpointDir
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    try {
      val p0 = save(pairs.select(col("a"), col("b")))
      // Symmetric directed edge list: degree(u) = count of rows keyed u.
      var edges = save(
        p0.select(col("a").as("u"), col("b").as("v"))
          .unionByName(p0.select(col("b").as("u"), col("a").as("v"))))
      // Surviving nodes are tracked SEPARATELY from the edge list: a
      // node whose neighbors all peel in one batch loses every edge row
      // in that same round, and a degree aggregate over edges alone
      // would simply never see it again — it must instead surface next
      // round with degree 0 (< k) and peel. The left join + coalesce(0)
      // below is that isolated-node path (pinned by the random-graph
      // reference test).
      var nodes = save(edges.select(col("u").as("node")).distinct())
      // Finalized (node, coreness) rows, appended as nodes peel off.
      var assigned = spark.range(0)
        .select(col("id").as("node"), col("id").as("coreness"))
      var k = 1
      var rounds = 0
      var empty = false
      while (k <= maxK && !empty && rounds < maxRounds) {
        var stable = false
        while (!stable && !empty && rounds < maxRounds) {
          rounds += 1
          val degs = nodes.join(
            edges.groupBy(col("u")).agg(count(lit(1)).as("deg")),
            nodes("node") === col("u"), "left")
            .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
          val below = save(degs.filter(col("deg") < k)
            .select(col("node").as("peeled")))
          if (below.isEmpty) {
            stable = true
          } else {
            // Peeled at level k -> survived the (k-1)-core only.
            assigned = save(assigned.unionByName(
              below.select(col("peeled").as("node"),
                lit(k - 1).cast("long").as("coreness"))))
            nodes = save(nodes.join(below,
              nodes("node") === below("peeled"), "left_anti"))
            edges = save(edges
              .join(below, edges("u") === below("peeled"), "left_anti")
              .join(below, edges("v") === below("peeled"), "left_anti"))
            empty = nodes.isEmpty
          }
        }
        k += 1
      }
      // Whatever survives the last completed level k-1 has coreness k-1
      // (loop exits only when that core is stable or bounds hit).
      val survivors = nodes
        .withColumn("coreness", lit(k - 1).cast("long"))
      assigned.unionByName(survivors)
    } finally {
      prevCheckpointDir.foreach(spark.sparkContext.setCheckpointDir)
    }
  }
}
