package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns
import graft.operators.BpeMerge
import Util._

/** Tokenizer-induction surface (SURVEY §2.9 [EXT]): BPE-style pair-merge
  * training over the documents corpus — the vocabulary-learning loop of
  * an LLM tokenizer as pure relational algebra (see
  * [[graft.operators.BpeMerge]] for the shape).
  *
  * The DuckDB oracle unrolls the K merge rounds as chained CTEs running
  * the identical windows/aggregates, so the learned merge table
  * hash-matches end to end — greedy overlap resolution included.
  */
object TokenizerQ {

  private val ROUNDS = 3

  private def seq0(s: org.apache.spark.sql.SparkSession, dir: String) =
    documents(s, dir)
      .select(col("doc_id"),
        posexplode(TextFns.tokens(col("text"))).as(Seq("p0", "sym")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("sym"))

  def queries: Map[String, Q] = Map(
    "bpe_train_merges" -> ((s, dir) =>
      BpeMerge.trainMerges(seq0(s, dir), ROUNDS)),

    // The APPLY side of the trainer: encode the corpus with the learned
    // merges and report the token-count compression — the measurement a
    // tokenizer pipeline actually ships. Integer permille, one row.
    "bpe_apply_stats" -> ((s, dir) => {
      val base = seq0(s, dir)
      val (_, fin) = BpeMerge.trainAndApply(base, ROUNDS)
      base.agg(count(lit(1)).as("tokens_before"))
        .crossJoin(fin.agg(count(lit(1)).as("tokens_after")))
        .select(col("tokens_before"), col("tokens_after"),
          expr("(1000 * tokens_after) div tokens_before")
            .as("compression_permille"))
    })
  )

  /** One oracle round: pair counts with lead, top-1 pair, odd-parity
    * run members, rebuild with renumbered positions — the SQL mirror of
    * `BpeMerge.mergeRound` over `r${i - 1}`.
    */
  private def roundSql(i: Int): String =
    s"""n$i AS (
       |  SELECT doc_id, pos, sym,
       |    lead(sym) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
       |  FROM r${i - 1}),
       |t$i AS (
       |  SELECT sym AS l, nxt AS r, count(*) AS cnt FROM n$i
       |  WHERE nxt IS NOT NULL
       |  GROUP BY sym, nxt ORDER BY cnt DESC, sym, nxt LIMIT 1),
       |k$i AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos,
       |      row_number() OVER (PARTITION BY doc_id, run ORDER BY pos) AS rir
       |    FROM (
       |      SELECT n.doc_id, n.pos,
       |        n.pos - row_number() OVER (PARTITION BY n.doc_id ORDER BY n.pos) AS run
       |      FROM n$i n, t$i t WHERE n.sym = t.l AND n.nxt = t.r))
       |  WHERE rir % 2 = 1),
       |r$i AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS pos,
       |    CASE WHEN merged THEN sym || '_' || nxt ELSE sym END AS sym
       |  FROM (
       |    SELECT n.doc_id, n.pos, n.sym, n.nxt, (k.pos IS NOT NULL) AS merged
       |    FROM n$i n
       |    LEFT JOIN k$i k ON k.doc_id = n.doc_id AND k.pos = n.pos
       |    LEFT JOIN k$i kp ON kp.doc_id = n.doc_id AND kp.pos = n.pos - 1
       |    WHERE kp.pos IS NULL))""".stripMargin

  // plain (non-interpolated) triple quote: no escape processing, so the
  // regex backslash is written single
  private val r0Sql =
    """r0 AS (
      |  SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
      |    unnest(toks) AS sym
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents))""".stripMargin

  def oracles: Map[String, String] = Map(
    "bpe_train_merges" -> {
      val rounds = (1 to ROUNDS).map(roundSql).mkString(",\n")
      val out = (1 to ROUNDS)
        .map(i => s"SELECT CAST($i AS BIGINT) AS round, l, r, CAST(cnt AS BIGINT) AS cnt FROM t$i")
        .mkString("\nUNION ALL ")
      s"""WITH $r0Sql,
         |$rounds
         |$out
         |ORDER BY round""".stripMargin
    },

    "bpe_apply_stats" -> {
      val rounds = (1 to ROUNDS).map(roundSql).mkString(",\n")
      s"""WITH $r0Sql,
         |$rounds
         |SELECT CAST((SELECT count(*) FROM r0) AS BIGINT) AS tokens_before,
         |  CAST((SELECT count(*) FROM r$ROUNDS) AS BIGINT) AS tokens_after,
         |  CAST((1000 * (SELECT count(*) FROM r$ROUNDS))
         |    // (SELECT count(*) FROM r0) AS BIGINT) AS compression_permille""".stripMargin
    }
  )
}
