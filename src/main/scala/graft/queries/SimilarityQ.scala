package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.VectorFns
import graft.operators.{Dedup, Multimodal, SimilaritySearch}
import Util._

/** Similarity-search + multimodal queries over the embeddings/documents
  * tables (SURVEY §2.9 [EXT]). Cosine runs over integer-quantized vectors
  * (exact, order-independent — see VectorFns), so scores hash-match DuckDB
  * bit-for-bit.
  */
object SimilarityQ {

  private val DIMS = 64
  private val N_QUERIES = 8  // vec_id < 8 are the query vectors
  private val NEAR_DUP_CAP = 2000
  private val LSH_BITS = 4

  // ---- shared DuckDB snippets ------------------------------------------

  /** Quantized embeddings CTE (mirrors VectorFns.quantize, scale 10000). */
  private val qSql =
    "list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 10000 + 0.5) AS BIGINT))"

  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, ${DIMS + 1}), i -> $a[i] * $b[i]))"

  private def cosSql(a: String, b: String) =
    s"""CAST(${dotSql(a, b)} AS DOUBLE) /
       |    (sqrt(CAST(${dotSql(a, a)} AS DOUBLE)) * sqrt(CAST(${dotSql(b, b)} AS DOUBLE)))""".stripMargin

  /** LSH bucket SQL (mirrors VectorFns.lshBucket). */
  private def bucketSql(q: String): String =
    (0 until LSH_BITS).map { j =>
      val weights = (0 until DIMS).map(i => VectorFns.projWeight(j, i, DIMS)).mkString(", ")
      s"(CASE WHEN list_sum(list_transform(range(1, ${DIMS + 1}), i -> $q[i] * ([$weights]::BIGINT[])[i])) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  // ----------------------------------------------------------------------

  def queries: Map[String, Q] = Map(

    // Brute-force exact top-5 cosine neighbors for 8 broadcast query
    // vectors — the ANN baseline (linear scan, no index).
    "ann_bruteforce_top5" -> ((s, dir) => {
      val e = embeddings(s, dir)
      SimilaritySearch.bruteForceTopK(
        e.filter(col("vec_id") < N_QUERIES),
        e.filter(col("vec_id") >= N_QUERIES), k = 5)
        .orderBy(col("q_vec"), col("rnk"))
    }),

    // LSH-bucketed ANN: probe only the query's sign-projection bucket.
    "ann_lsh_top3" -> ((s, dir) => {
      val e = embeddings(s, dir)
      SimilaritySearch.lshTopK(
        e.filter(col("vec_id") < N_QUERIES),
        e.filter(col("vec_id") >= N_QUERIES), k = 3,
        nBits = LSH_BITS, dims = DIMS)
        .orderBy(col("q_vec"), col("rnk"))
    }),

    // Embedding near-duplicate pairs, blocked by label (the blocking key
    // is an LSH bucket at scale), exact quantized cosine >= 0.40.
    "embed_near_dup" -> ((s, dir) => {
      Dedup.embeddingNearDup(
        embeddings(s, dir).filter(col("vec_id") < NEAR_DUP_CAP),
        blockKey = col("label"), threshold = 0.40)
        .orderBy(col("a"), col("b"))
    }),

    // Multimodal metadata: opaque binary payload + typed header fields,
    // no payload decode (column pruning keeps the bytes unread at scale).
    "multimodal_meta" -> ((s, dir) => {
      Multimodal.extractMeta(Multimodal.attachPayload(documents(s, dir)))
        .withColumn("media_md5", md5(col("text")))
        .select(col("doc_id"), col("media_md5"), col("byte_len"),
          col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))
    })
  )

  def oracles: Map[String, String] = Map(

    "ann_bruteforce_top5" ->
      s"""WITH e AS (SELECT vec_id, $qSql AS q FROM embeddings),
         |ql AS (SELECT vec_id AS q_vec, q AS qq FROM e WHERE vec_id < $N_QUERIES),
         |cl AS (SELECT vec_id AS c_vec, q AS cq FROM e WHERE vec_id >= $N_QUERIES),
         |scored AS (
         |  SELECT q_vec, c_vec,
         |    ${cosSql("qq", "cq")} AS cos
         |  FROM cl CROSS JOIN ql),
         |ranked AS (
         |  SELECT q_vec, c_vec, cos, row_number() OVER (
         |    PARTITION BY q_vec ORDER BY cos DESC, c_vec) AS rnk
         |  FROM scored)
         |SELECT q_vec, rnk, c_vec, cos FROM ranked
         |WHERE rnk <= 5 ORDER BY q_vec, rnk""".stripMargin,

    "ann_lsh_top3" ->
      s"""WITH e AS (SELECT vec_id, $qSql AS q FROM embeddings),
         |b AS (SELECT vec_id, q, ${bucketSql("q")} AS bucket FROM e),
         |ql AS (SELECT bucket, vec_id AS q_vec, q AS qq FROM b WHERE vec_id < $N_QUERIES),
         |cl AS (SELECT bucket, vec_id AS c_vec, q AS cq FROM b WHERE vec_id >= $N_QUERIES),
         |scored AS (
         |  SELECT q_vec, c_vec,
         |    ${cosSql("qq", "cq")} AS cos
         |  FROM cl JOIN ql USING (bucket)),
         |ranked AS (
         |  SELECT q_vec, c_vec, cos, row_number() OVER (
         |    PARTITION BY q_vec ORDER BY cos DESC, c_vec) AS rnk
         |  FROM scored)
         |SELECT q_vec, rnk, c_vec, cos FROM ranked
         |WHERE rnk <= 3 ORDER BY q_vec, rnk""".stripMargin,

    "embed_near_dup" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, $qSql AS q
         |  FROM embeddings WHERE vec_id < $NEAR_DUP_CAP),
         |scored AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b,
         |    ${cosSql("x.q", "y.q")} AS cos
         |  FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id)
         |SELECT a, b, cos FROM scored WHERE cos >= 0.40
         |ORDER BY a, b""".stripMargin,

    "multimodal_meta" ->
      """WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
        |hv AS (
        |  SELECT doc_id, h,
        |    (CASE WHEN ascii(substr(h, 1, 1)) >= 97 THEN ascii(substr(h, 1, 1)) - 87 ELSE ascii(substr(h, 1, 1)) - 48 END) AS v1,
        |    (CASE WHEN ascii(substr(h, 2, 1)) >= 97 THEN ascii(substr(h, 2, 1)) - 87 ELSE ascii(substr(h, 2, 1)) - 48 END) AS v2,
        |    (CASE WHEN ascii(substr(h, 3, 1)) >= 97 THEN ascii(substr(h, 3, 1)) - 87 ELSE ascii(substr(h, 3, 1)) - 48 END) AS v3,
        |    (CASE WHEN ascii(substr(h, 4, 1)) >= 97 THEN ascii(substr(h, 4, 1)) - 87 ELSE ascii(substr(h, 4, 1)) - 48 END) AS v4,
        |    (CASE WHEN ascii(substr(h, 5, 1)) >= 97 THEN ascii(substr(h, 5, 1)) - 87 ELSE ascii(substr(h, 5, 1)) - 48 END) AS v5
        |  FROM m)
        |SELECT doc_id, h AS media_md5,
        |  CAST(octet_length(from_hex(h)) AS BIGINT) AS byte_len,
        |  CAST(v1 * 16 + v2 + 1 AS BIGINT) AS width,
        |  CAST(v3 * 16 + v4 + 1 AS BIGINT) AS height,
        |  CAST(v5 % 8 + 1 AS BIGINT) AS n_frames
        |FROM hv ORDER BY doc_id""".stripMargin
  )
}
