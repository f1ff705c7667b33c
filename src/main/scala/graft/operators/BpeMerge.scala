package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational BPE-style pair-merge training (SURVEY §2.9 [EXT]) — the
  * tokenizer-induction step of an LLM data pipeline: repeatedly find the
  * most frequent adjacent symbol pair in the corpus and merge its
  * non-overlapping occurrences left-to-right, exactly the BPE/word2phrase
  * vocabulary-learning loop (applied here over word symbols; the
  * character-level variant is the same algebra over a char-exploded seq).
  *
  * Everything is windows + hash aggregates over the (doc_id, pos, sym)
  * sequence relation — no per-doc UDF loops, no driver-side strings:
  *
  *  1. pair counts: one `lead` window (doc-keyed) + one hash aggregate.
  *  2. top pair: orderBy(count desc, pair).limit(1) — a
  *     TakeOrderedAndProject, broadcast to every row via crossJoin.
  *  3. greedy left-to-right overlap resolution: overlapping matches are
  *     EXACTLY the runs of consecutive match positions, so a
  *     run-grouping (pos - row_number) plus an odd-parity filter inside
  *     each run keeps the 1st, 3rd, … match — the classic
  *     gaps-and-islands trick standing in for a sequential scan.
  *  4. rebuild: merged rows swap in the fused symbol, consumed rows
  *     (position right after a kept merge) drop, positions re-number
  *     with one more doc-keyed window.
  *
  * Scale shape: every window partitions by doc_id (bounded by document
  * length, never corpus size); the only global structure is the pair
  * count aggregate and its 1-row top pair. Each round's output is
  * persisted — K rounds chain K plans deep otherwise (the PageRank
  * lineage lesson).
  */
object BpeMerge {

  /** One merge round over seq(doc_id, pos:long 1-based dense, sym).
    * Returns (next sequence, the 1-row merge table (l, r, cnt)).
    */
  def mergeRound(seq: DataFrame): (DataFrame, DataFrame) = {
    val (next, top, _) = mergeRoundImpl(seq)
    (next, top)
  }

  /** [[mergeRound]] plus the internally-persisted lead-window frame, so
    * [[trainAndApply]] can unpersist it once the round's outputs are
    * materialized (K rounds would otherwise pin 2K+1 frames for the
    * session).
    */
  private def mergeRoundImpl(seq: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // persisted: the lead-window frame feeds three subtrees (pair
    // counts, match selection, rebuild) that prune differently, so
    // ReuseExchange can't collapse them — without this the window runs
    // three times per round
    val withNext = seq.withColumn("nxt", lead(col("sym"), 1).over(wDoc))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = withNext.filter(col("nxt").isNotNull)
      .groupBy(col("sym"), col("nxt"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("sym"), col("nxt"))
      .limit(1)
      .select(col("sym").as("l"), col("nxt").as("r"), col("cnt"))

    // left join on true, not crossJoin: `top` is empty when the corpus
    // has no adjacent pair left (all docs are single symbols), and a
    // cross join would then silently drop every sequence; the left join
    // keeps them with null l/r, the match filter below selects nothing,
    // and the rebuild is a no-op — the fixed point of the merge loop
    val marked = withNext.join(broadcast(top), lit(true), "left")
    // greedy non-overlap: matches overlap iff their positions are
    // adjacent, so runs of consecutive match positions resolve by
    // keeping the odd-indexed members of each run
    val wRun = Window.partitionBy(col("doc_id"), col("run")).orderBy(col("pos"))
    val kept = marked
      .filter(col("sym") === col("l") && col("nxt") === col("r"))
      .withColumn("rn", row_number().over(wDoc))
      .withColumn("run", col("pos") - col("rn"))
      .withColumn("rir", row_number().over(wRun))
      .filter(col("rir") % 2 === 1)
      .select(col("doc_id"), col("pos"), lit(true).as("k"))

    // a consumed row is the one right after a kept merge; positions are
    // dense, so lag(k) over the doc window IS "kept at pos - 1" — one
    // window instead of a second join against the kept set
    val next = marked
      .join(kept, Seq("doc_id", "pos"), "left")
      .withColumn("consumed", lag(col("k"), 1).over(wDoc))
      .filter(col("consumed").isNull)
      .withColumn("sym2",
        when(col("k"), concat(col("sym"), lit("_"), col("nxt")))
          .otherwise(col("sym")))
      .withColumn("pos2", row_number().over(wDoc).cast("long"))
      .select(col("doc_id"), col("pos2").as("pos"), col("sym2").as("sym"))
    (next, top, withNext)
  }

  /** K merge rounds; returns (merge table (round, l, r, cnt) ordered by
    * round — the learned vocabulary additions — , the final merged
    * sequence). Each round materializes eagerly: the next sequence and
    * the 1-row merge table persist and count, then the previous round's
    * sequence and lead-window frame unpersist — steady-state memory is
    * one sequence plus K 1-row merge tables, not 2K+1 full frames. When
    * a round learns nothing (no adjacent pair anywhere) the loop stops:
    * every later round would be the identical no-op.
    */
  def trainAndApply(seq0: DataFrame, k: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // One corpus-size frame persists per round: the lead-window frame
    // (it feeds both the pair-count and rebuild subtrees). The round's
    // single expensive job is topP.count(), which materializes that
    // frame as a side effect; the REBUILT sequence stays a lazy plan
    // over it — the next round's frame (or the caller's action) computes
    // it exactly once, so the old per-round "persist + count the next
    // sequence" job and its second corpus-size cache are gone (round-9:
    // this was ~40% of the per-round cost at 10x). The previous round's
    // frame unpersists only after the current frame is materialized —
    // the current frame's lineage reads it.
    var seq = seq0
    var prevFrame: Option[DataFrame] = None
    val merges = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val (next, top, withNext) = mergeRoundImpl(seq)
      val topP = top.withColumn("round", lit(round.toLong)).persist(lvl)
      exhausted = topP.count() == 0L
      merges += topP
      prevFrame.foreach(_.unpersist())
      prevFrame = Some(withNext)
      seq = next
      round += 1
    }
    (merges.reduce(_ unionByName _)
      .select(col("round"), col("l"), col("r"), col("cnt"))
      .orderBy(col("round")), seq)
  }

  /** The merge table alone (see [[trainAndApply]]). */
  def trainMerges(seq0: DataFrame, k: Int): DataFrame =
    trainAndApply(seq0, k)._1
}
