package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop cheapest path by distributed Bellman–Ford relaxation —
  * the weighted companion of the BFS-layers operator (hops = uniform
  * cost there, arbitrary non-negative integer edge costs here).
  *
  * The bound is part of the QUERY SEMANTICS, not an implementation
  * shortcut: "cheapest route with at most H hops" is the
  * itinerary-style formulation (max stops), it terminates on cyclic
  * graphs without a fixpoint detector, and it makes the operator
  * oracle-expressible as a depth-capped recursive CTE.
  *
  * Scale shape: each of the H rounds is one equi-join of the current
  * distance table against the edge list (keyed by source node) plus a
  * min-aggregate — both map-side combinable, no driver-side graph. The
  * edge table is materialized once up front and every round's distance
  * table is eagerly local-checkpointed, so lineage stays flat and the
  * (potentially expensive) edge-building pipeline upstream runs exactly
  * once. H is small by construction; the frontier table is bounded by
  * |V|, never by |paths|.
  */
object ShortestPath {

  /** Min path cost from `source` to every node reachable within
    * `maxHops` edges. `edges` columns: src, dst, cost (non-negative
    * long). Output: (node, min_cost), including the source at cost 0.
    */
  def boundedCheapestPaths(edges: DataFrame, source: Long,
                           maxHops: Int): DataFrame = Ckpt.scoped {
    def save(df: DataFrame): DataFrame =
      Ckpt.track(df.localCheckpoint(eager = true))
    val e = save(edges.select(col("src"), col("dst"),
      col("cost").cast("long").as("cost")))
    var dist = save(e.sparkSession.range(1)
      .select(lit(source).cast("long").as("node"),
        lit(0L).as("min_cost")))
    var hop = 0
    while (hop < maxHops) {
      val relaxed = dist
        .join(e, dist("node") === e("src"))
        .select(e("dst").as("node"),
          (dist("min_cost") + e("cost")).as("min_cost"))
      val prevDist = dist
      dist = save(dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("min_cost")).as("min_cost")))
      Ckpt.release(prevDist) // new eager checkpoint supersedes it
      hop += 1
    }
    Ckpt.release(e) // returned plan is the final dist checkpoint alone
    dist
  }
}
