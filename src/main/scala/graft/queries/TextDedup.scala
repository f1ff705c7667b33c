package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextFns
import graft.operators.Dedup
import Util._

/** Text-analysis + deduplication queries over the documents table
  * (SURVEY §2.9 [EXT]). The DuckDB oracles mirror the exact same md5/ascii
  * arithmetic, so even the LSH pipelines hash-match.
  *
  * Pair-producing queries run over the FULL corpus with a document-
  * frequency ceiling ([[Dedup.dfCeiling]], mirrored in the oracles via a
  * QUALIFY window): shingles in more than MAX_DF documents are dropped
  * from the shingle universe before any shingle-keyed join, bounding the
  * per-key fan-out at MAX_DF² — the defense that makes the inverted-index
  * self-join survive a stop-phrase shingle at 100 TB.
  */
object TextDedup {

  /** df ceiling for the pair-producing dedup queries. */
  private[queries] val MAX_DF = 20

  /** Vocabulary size for the OOV-coverage query (the synthetic corpus
    * has 31 distinct tokens; 24 leaves a measurable OOV tail).
    */
  private val VOCAB_TOP = 24

  // Stopword sets for the language-ID heuristic (en/es/de/fr). EN is the
  // canonical quality-formula list, defined once in TextFns.
  private[queries] val EN = TextFns.EN_STOPWORDS
  private val ES = Seq("el", "la", "de", "los", "y")
  private val DE = Seq("der", "die", "das", "und", "ist")
  private val FR = Seq("le", "les", "et", "est", "dans")

  private[queries] def sqlIn(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")

  /** Mixed-Unicode-form fixture rows for unicode_fingerprint_collapse —
    * one source of truth for the Spark side AND the oracle VALUES list:
    * NFC (-1), its NFD twin (-2), a zero-width-ridden NFC twin (-3) and
    * the pre-accent-folded twin (-4). Negative ids keep them out of the
    * corpus id space.
    */
  private[queries] val UNICODE_FIXTURES = Seq(
    (-1L, "Caf\u00e9 r\u00e9sum\u00e9 na\u00efve"),
    (-2L, "Cafe\u0301 re\u0301sume\u0301 nai\u0308ve"),
    (-3L, "Caf\u00e9\u200b r\u00e9sum\u00e9 na\u00efve\ufeff"),
    (-4L, "Cafe resume naive"))

  /** The zero-width/BOM character class, in the \x{...} escape syntax
    * shared by Java regex and RE2 (so the same pattern string works in
    * both engines).
    */
  private val ZW = "[\\x{200B}\\x{200C}\\x{200D}\\x{2060}\\x{FEFF}]"

  // ---- shared DuckDB snippets (mirror TextFns/Dedup expressions) -------
  // Builders are parameterized on the source relation so the curation
  // pipeline (queries/Curation.scala) can run the same chain over a
  // filtered corpus.

  /** toks + distinct 3-gram shingle set, mirroring TextFns.shingleSet. */
  private[queries] def docsSqlFrom(src: String) =
    s"""docs AS MATERIALIZED (
       |  SELECT doc_id, list_distinct(
       |    CASE WHEN len(toks) >= 3
       |      THEN list_transform(range(1, len(toks)-1),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE []::VARCHAR[] END) AS sh
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
       |        FROM $src)
       |)""".stripMargin

  private val docsSql = docsSqlFrom("documents")

  private val shingledSql =
    s"""shingled AS MATERIALIZED (SELECT doc_id, sh FROM docs WHERE len(sh) > 0)"""

  /** df-ceiling variant (mirrors Dedup.dfCeiling): the inverted index
    * drops shingles with df > maxDf, then the per-doc shingle lists are
    * rebuilt from the surviving rows — docs whose every shingle was
    * dropped disappear, exactly like the Spark side.
    */
  private[queries] def dfShingledSqlCap(maxDf: Int) =
    dfShingledSqlCapExpr(maxDf.toString)

  /** As [[dfShingledSqlCap]] but the ceiling is any SQL scalar
    * expression (e.g. a corpus-relative bound) — used where the cap
    * must track corpus size so a replicated scale-up doesn't silently
    * empty the inverted index.
    */
  private[queries] def dfShingledSqlCapExpr(maxDfExpr: String) =
    s"""inv AS MATERIALIZED (
       |  SELECT doc_id, s
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM docs WHERE len(sh) > 0)
       |  QUALIFY count(*) OVER (PARTITION BY s) <= ($maxDfExpr)),
       |shingled AS MATERIALIZED (SELECT doc_id, list(s) AS sh FROM inv GROUP BY doc_id)""".stripMargin

  private val dfShingledSql = dfShingledSqlCap(MAX_DF)

  /** MinHash sigs + banding + candidate pairs over the `shingled` CTE
    * (mirrors Dedup.minhashSigs/minhashLshPairs).
    */
  private[queries] def lshCandSql(k: Int, bands: Int): String = {
    val sigCols = (0 until k)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i#' || s))) AS sig$i")
      .mkString(",\n    ")
    val bandRows = (0 until bands)
      .map(b => s"SELECT doc_id, $b AS band_idx, md5(sig${2 * b} || sig${2 * b + 1}) AS band_hash FROM sigs")
      .mkString("\n  UNION ALL\n  ")
    s"""sigs AS MATERIALIZED (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM shingled),
       |bands AS MATERIALIZED (
       |  $bandRows),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
       |   AND x.doc_id < y.doc_id)""".stripMargin
  }

  /** Connected-components tail over the verified LSH pairs: recursive
    * reach closure; `comp` maps every clustered doc to its component's
    * min doc_id (mirrors Dedup.componentsFromPairs). Needs WITH RECURSIVE
    * at the statement head.
    */
  private[queries] def clusterTailSql(threshold: Double): String =
    s"""pairsq AS MATERIALIZED (${verifySql(threshold)}),
       |edges AS MATERIALIZED (SELECT a AS u, b AS v FROM pairsq
       |          UNION ALL
       |          SELECT b AS u, a AS v FROM pairsq),
       |nodes AS (SELECT DISTINCT u AS node FROM edges),
       |reach(node, root) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node),
       |comp AS MATERIALIZED (
       |  SELECT node AS doc_id, CAST(MIN(root) AS BIGINT) AS rep_doc_id
       |  FROM reach GROUP BY node)""".stripMargin

  /** Jaccard-verify SQL over candidate pairs (a,b): mirrors
    * Dedup.verifyJaccard. The intersection length is computed ONCE in
    * an inner projection (DuckDB does not CSE the list_intersect across
    * SELECT and WHERE — measured 2x on the 10x organic gate's verify-
    * heavy oracles); same rows, same values.
    */
  private[queries] def verifySql(threshold: Double) =
    s"""SELECT a, b,
       |  CAST(ninter AS DOUBLE) / CAST(na + nb - ninter AS DOUBLE)
       |    AS jaccard
       |FROM (
       |  SELECT c.a, c.b, len(list_intersect(da.sh, db.sh)) AS ninter,
       |    len(da.sh) AS na, len(db.sh) AS nb
       |  FROM cand c
       |  JOIN shingled da ON da.doc_id = c.a
       |  JOIN shingled db ON db.doc_id = c.b)
       |WHERE CAST(ninter AS DOUBLE) / CAST(na + nb - ninter AS DOUBLE)
       |      >= $threshold
       |ORDER BY a, b""".stripMargin

  /** hex-digit value of digit b (1-based) of md5 hex m — mirrors
    * TextFns.hexVal(substring(m, b, 1)).
    */
  private[queries] def hexValSql(m: String, b: Int) =
    s"(CASE WHEN ascii(substr($m, $b, 1)) >= 97 THEN ascii(substr($m, $b, 1)) - 87 ELSE ascii(substr($m, $b, 1)) - 48 END)"

  // ----------------------------------------------------------------------

  def queries: Map[String, Q] = Map(

    // F13/fingerprinting: md5 of whitespace-normalized lowercased text.
    "text_fingerprint" -> ((s, dir) => {
      documents(s, dir)
        .select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"),
          size(TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Exact dedup: hash-groupBy on the fingerprint.
    "dedup_exact" -> ((s, dir) => {
      Dedup.exactDedup(documents(s, dir))
        .orderBy(col("fp"))
    }),

    // Unicode-normalization audit (round 13): fingerprint classes under
    // raw / NFC+zero-width-strip / accent-fold normalization. The
    // corpus is ASCII, so deterministic mixed-form fixture rows (NFC,
    // NFD, zero-width-ridden and pre-folded twins at negative doc_ids —
    // UNICODE_FIXTURES, shared verbatim with the oracle SQL) provide
    // the non-vacuous signal: raw > nfc > folded class counts. DuckDB
    // nfc_normalize/strip_accents are the oracle twins of the codegen'd
    // UnicodeNormalize expression + \p{Mn} fold.
    "unicode_fingerprint_collapse" -> ((s, dir) => {
      val fixtures = s.createDataFrame(UNICODE_FIXTURES)
        .toDF("doc_id", "text")
      val corpus = documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(fixtures)
      corpus.agg(
          countDistinct(TextFns.fingerprint(col("text"))).as("raw"),
          countDistinct(md5(TextFns.normTextUnicode(col("text"))))
            .as("nfc"),
          countDistinct(md5(TextFns.normTextUnicode(col("text"),
            accentFold = true))).as("folded"),
          count(lit(1)).as("n_docs"))
        .select(col("n_docs"),
          expr("stack(3, 'raw', raw, 'nfc', nfc, 'folded', folded)")
            .as(Seq("mode", "distinct_fp")))
        .orderBy(col("mode"))
    }),

    // Unicode-normalized exact dedup (round 14): the same hash-groupBy
    // dedup as dedup_exact but through the NFC + zero-width-strip +
    // accent-fold fingerprint, with the mixed-form fixture rows planted
    // so normalization is proven INSIDE an actual dedup (all four
    // fixture spellings must land in one group with rep = min id),
    // not just profiled as class counts.
    "dedup_exact_unicode" -> ((s, dir) => {
      val fixtures = s.createDataFrame(UNICODE_FIXTURES)
        .toDF("doc_id", "text")
      val corpus = documents(s, dir).select(col("doc_id"), col("text"))
        .unionByName(fixtures)
      Dedup.exactDedup(corpus, unicodeNorm = true, accentFold = true)
        .orderBy(col("fp"))
    }),

    // MinHash (8 sigs) + LSH banding (4 bands x 2 rows) + exact verify,
    // full corpus, hot shingles capped by the df ceiling.
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(documents(s, dir),
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
        maxDf = Some(MAX_DF))
        .orderBy(col("a"), col("b"))
    }),

    // Detector-quality audit (round 11): recall and precision of the
    // banded MinHash-LSH near-dup detector against the EXACT Jaccard
    // ground truth over the same capped shingle universe — "measure,
    // don't guess" applied to the detector itself, the number a 100 TB
    // dedup run must publish before anyone trusts its dedup rate.
    // Verified LSH pairs are a SUBSET of the exact pairs (same verify
    // predicate, same universe), so precision_permille = 1000 is an
    // invariant the oracle re-proves; recall prices the banding's miss
    // rate (theory: 1-(1-t^r)^b per pair). Truth is corpus-exact (the
    // inverted-index self-join, df-ceiling bounded), so the audit costs
    // one extra dedup_ngram_jaccard pass — run it on a sample at 100 TB.
    // One-row artifact; nonzero at every SF (planted near-dups).
    "dedup_lsh_recall" -> ((s, dir) => {
      val docs = documents(s, dir)
      val truth = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5,
          maxDf = Some(MAX_DF)).select(col("a"), col("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val found = Dedup.minhashLshPairs(docs, n = 3, bands = 4,
          rowsPerBand = 2, threshold = 0.5, maxDf = Some(MAX_DF))
        .select(col("a"), col("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nF = found.agg(count(lit(1)).as("n_found"))
      val nM = found.join(truth, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).as("n_matched"))
      nT.crossJoin(nF).crossJoin(nM)
        .select(col("n_truth"), col("n_found"), col("n_matched"),
          expr("(1000 * n_matched) div n_truth").as("recall_permille"),
          expr("(1000 * n_matched) div n_found").as("precision_permille"))
    }),

    // Exact n-gram Jaccard pairs via inverted-index self-join, full
    // corpus; the df ceiling bounds the per-shingle join fan-out.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(documents(s, dir), n = 3, threshold = 0.5,
        maxDf = Some(MAX_DF))
        .orderBy(col("a"), col("b"))
    }),

    // Exact Jaccard again, but candidates come from the PREFIX FILTER
    // (AllPairs/PPJoin rule): only each doc's rarest (1-t)|A|+1 shingles
    // are indexed for the candidate join, so per-shingle fan-out
    // collapses onto cold keys while the verify stage keeps scores
    // exact. Runs at t=0.8 — the high-threshold regime the prefix rule
    // exists for, where the candidate index shrinks to ~20% of the
    // inverted index (at t=0.5 the prefix is half the index and the
    // extra df-join/window work outweighs the pruning — measured 5x
    // slower than the plain self-join; losslessness at BOTH regimes is
    // pinned by the DedupTest equality test).
    "dedup_jaccard_prefix" -> ((s, dir) => {
      Dedup.prefixJaccardPairs(documents(s, dir), n = 3, threshold = 0.8,
        maxDf = Some(MAX_DF))
        .orderBy(col("a"), col("b"))
    }),

    // Dup clusters: connected components over the MinHash-LSH pairs —
    // every clustered doc mapped to its component's min doc_id.
    "dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(documents(s, dir),
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
        maxDf = Some(MAX_DF))
      Dedup.componentsFromPairs(pairs.select(col("a"), col("b")))
        .orderBy(col("doc_id"))
    }),

    // Dup-cluster SIZE profile: log2 histogram of connected-component
    // sizes over the same verified LSH pair graph — the one-page answer
    // to "are my near-dups isolated pairs or boilerplate mega-clusters",
    // which decides whether survivorship keep-best suffices or template
    // removal is needed. Bucket = floor(log2(size)) via length(bin(sz))
    // (no float log — the key_skew_profile discipline); output is
    // log2(max cluster) rows at any corpus size. The CC labels are the
    // expensive part and they're already the dedup_clusters pipeline;
    // the histogram is two catalog-bounded aggregates on top.
    "dup_cluster_size_hist" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(documents(s, dir),
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
        maxDf = Some(MAX_DF))
      Dedup.componentsFromPairs(pairs.select(col("a"), col("b")))
        .groupBy(col("rep_doc_id")).agg(count(lit(1)).as("sz"))
        .groupBy((length(bin(col("sz"))) - 1).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
          min(col("sz")).as("min_sz"), max(col("sz")).as("max_sz"))
        .orderBy(col("bucket"))
    }),

    // Dup-cluster shape profile: BFS hop distance from each cluster's
    // representative over the same verified LSH pair graph
    // dedup_clusters labels — distinguishes chain-shaped clusters
    // (drifting near-dup content) from star-shaped ones (one template,
    // many copies), which CC alone cannot.
    "bfs_layers" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(documents(s, dir),
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
        maxDf = Some(MAX_DF))
      Dedup.bfsLayers(pairs.select(col("a"), col("b")))
        .orderBy(col("doc_id"))
    }),

    // Triangle census of the verified near-dup graph: how clique-like
    // are the dup clusters? Triangles via the canonical-order two-hop
    // join (a<b<c, so each triangle is enumerated exactly once); wedges
    // from the degree table (sum d*(d-1)/2); global clustering
    // coefficient as integer permille. The pair graph is already bounded
    // sub-quadratically by the LSH bands + df ceiling, so the two-hop
    // join is over the (small) edge set, never the corpus — the shuffle
    // key is the shared endpoint, the quantity that bounds the fan-out.
    "dupgraph_triangles" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(documents(s, dir),
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
        maxDf = Some(MAX_DF))
        .select(col("a"), col("b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val und = pairs.union(pairs.select(col("b"), col("a"))).toDF("u", "v")
      val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
      val nodesEdges = deg.agg(count(lit(1)).as("n_nodes"),
        coalesce(sum(expr("(d * (d - 1)) div 2")), lit(0L)).as("n_wedges"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_edges")))
      val tri = pairs.as("e1")
        .join(pairs.as("e2"), col("e1.b") === col("e2.a"))
        .join(pairs.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .agg(count(lit(1)).as("n_triangles"))
      nodesEdges.crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          col("n_wedges"),
          when(col("n_wedges") > 0,
            expr("(3000 * n_triangles) div n_wedges")).otherwise(0L)
            .as("cc_permille"))
    }),

    // Link prediction on the near-dup graph: neighborhood Jaccard for
    // non-adjacent pairs with a shared neighbor — the "these two docs
    // dedup against the same things but not (yet) each other" signal a
    // curator reads as LSH near-misses worth a verify pass. On THIS
    // corpus the verified graph is a union of exact-replica cliques
    // (dupgraph_triangles: cc_permille = 1000), so the query doubles as
    // the transitivity audit and its oracle-matched answer is EMPTY —
    // any row appearing here is a real LSH miss. The operator's
    // positive path (open wedges → scored predictions) is pinned on
    // wedge-rich graphs in DedupTest.
    "linkpred_jaccard" -> ((s, dir) => {
      Dedup.linkPredictionJaccard(Dedup.minhashLshPairs(documents(s, dir),
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
        maxDf = Some(MAX_DF)))
    }),

    // Sparse weighted cosine pairs (bag-of-words angle, rare-heavy
    // linear weights, df-ceilinged): the cosine >= 0.9 gate runs as an
    // EXACT integer comparison (100·dot² >= 81·‖A‖²·‖B‖² in decimal),
    // so the result is bit-portable with no sqrt anywhere.
    "cosine_sparse_pairs" -> ((s, dir) => {
      Dedup.sparseCosinePairs(documents(s, dir), n = 3, num = 9, den = 10,
        maxDf = MAX_DF)
        .orderBy(col("a"), col("b"))
    }),

    // 16-bit SimHash signatures, deduped on signature equality — one
    // linear hash-agg, so no df ceiling needed (no pair join).
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhashDedup(documents(s, dir), n = 3)
        .orderBy(col("simhash"))
    }),

    // Benchmark decontamination: train docs sharing >= 2 distinct
    // 3-gram shingles with the held-out eval slice (doc_id % 50 == 0
    // stands in for a benchmark suite). Eval shingles broadcast; the
    // corpus side is never shuffled by shingle.
    "decontaminate" -> ((s, dir) => {
      val docs = documents(s, dir)
      Dedup.decontaminate(
        train = docs.filter(col("doc_id") % 50 =!= 0),
        evalSet = docs.filter(col("doc_id") % 50 === 0),
        n = 3, minHits = 2)
        .orderBy(col("doc_id"))
    }),

    // Chunk-level (passage) dedup: disjoint 8-token windows fingerprinted
    // and reported when shared across 2+ docs — boilerplate detection
    // below document granularity, no pair join.
    "chunk_dedup" -> ((s, dir) => {
      Dedup.chunkDupes(documents(s, dir), chunkTokens = 8)
        .orderBy(col("chunk_fp"))
    }),

    // Graded contamination: every train doc's distinct-shingle overlap
    // with the eval slice as permille — the downweight-vs-drop signal
    // the binary decontaminate gate can't express.
    "contamination_score" -> ((s, dir) => {
      val docs = documents(s, dir)
      Dedup.contaminationScore(
        train = docs.filter(col("doc_id") % 50 =!= 0),
        evalSet = docs.filter(col("doc_id") % 50 === 0),
        n = 3)
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition signals: duplicate-3-gram and hottest-
    // 3-gram shares per doc, as integer permille (portable, no doubles).
    "doc_repetition" -> ((s, dir) => {
      Dedup.repetitionStats(documents(s, dir), n = 3)
        .orderBy(col("doc_id"))
    }),

    // Incremental dedup: new-batch docs (doc_id % 10 >= 8) whose SimHash
    // collides with the existing corpus are flagged for drop. The
    // existing signature set is bounded by the 16-bit signature space
    // (65,536 keys) no matter the corpus size, so it broadcasts — the
    // new batch is never shuffled. (A 64-bit simhash would need the
    // semi join instead.)
    "dedup_incremental" -> ((s, dir) => {
      // persisted: the signature table is expensive to build (shingle
      // chain + 16 bit-sums), 2 longs wide, and consumed by both the
      // existing and new-batch branches — the profile where caching
      // wins (see Dedup.materialized).
      val sh = Dedup.withSimhash(
        Dedup.shingleRows(documents(s, dir), n = 3))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val existing = sh.filter(col("doc_id") % 10 < 8)
        .select(col("simhash")).distinct()
      sh.filter(col("doc_id") % 10 >= 8)
        .join(broadcast(existing), Seq("simhash"), "left_semi")
        .select(col("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID heuristic -> confusion matrix against the lang column.
    // toks and the four scores are bound as columns (attributes) before
    // the comparison chain references them repeatedly — see
    // Dedup.shingleDocs for why inlining HOF inputs is quadratic.
    "lang_id_confusion" -> ((s, dir) => {
      val Seq(en, es, de, fr) = Seq(col("en_s"), col("es_s"), col("de_s"), col("fr_s"))
      documents(s, dir)
        .withColumn("toks", TextFns.tokens(col("text")))
        .withColumn("en_s", TextFns.stopHits(col("toks"), EN))
        .withColumn("es_s", TextFns.stopHits(col("toks"), ES))
        .withColumn("de_s", TextFns.stopHits(col("toks"), DE))
        .withColumn("fr_s", TextFns.stopHits(col("toks"), FR))
        .withColumn("predicted",
          when(en >= es && en >= de && en >= fr, "en")
            .when(es >= de && es >= fr, "es")
            .when(de >= fr, "de")
            .otherwise("fr"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // Quality scoring: stopword ratio, punctuation ratio, length prior.
    // punct_len counts the chars LEFT after deleting [a-z0-9 ] — i.e.
    // actual punctuation/symbols (round 4 fix: the earlier subtraction
    // counted the deleted clean chars, inverting the penalty so junk
    // text was rewarded).
    "quality_score" -> ((s, dir) => {
      TextFns.withQualityCols(documents(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
          col("punct_ratio"), col("score"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: totals, distincts, chars per document.
    "token_stats" -> ((s, dir) => {
      val toks = TextFns.tokens(col("text"))
      documents(s, dir)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Corpus-LM fluency scoring — the SQL-expressible analog of the
    // KenLM-perplexity quality gate every big curation pipeline runs:
    // score each document by how common its word bigrams are in the
    // corpus itself. All-integer (no log, no perplexity float): the
    // score is avg relative bigram frequency in parts-per-billion,
    // computed as one exact decimal integer division at the edge.
    // Shape at 100 TB: the bigram count table is vocab²-bounded and
    // map-side combinable; the scoring join shuffles on the bigram key
    // co-partitioned with the count build; the corpus-total rides as a
    // broadcast 1-row scalar. The bigram frame feeds all three
    // consumers from one persist.
    "bigram_fluency" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = documents(s, dir)
        .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))))
        .toDF("doc_id", "pos", "tok")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val bigrams = toks
        .withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("doc_id"), concat(col("tok"), lit(" "), col("nxt")).as("bg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bf = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("f"))
      val tot = bigrams.agg(count(lit(1)).as("total"))
      bigrams.join(bf, Seq("bg"))
        .groupBy(col("doc_id"))
        .agg(sum(col("f")).as("sum_f"), count(lit(1)).as("n_bigrams"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_bigrams"),
          // decimal(38,0) before the 1e9 scale-up: sum_f·1e9 at corpus
          // scale exceeds a long (q8's overflow rule)
          expr("CAST((CAST(sum_f AS DECIMAL(38,0)) * 1000000000) div " +
            "(CAST(n_bigrams AS DECIMAL(38,0)) * CAST(total AS DECIMAL(38,0))) AS BIGINT)")
            .as("fluency_ppb"))
        .orderBy(col("doc_id"))
    }),

    // Contingency-table profile (lang × source): observed cell counts
    // beside the independence expectation, the dependence diagnostic a
    // domain-mix curator reads before reweighting. Expectation kept
    // exact: E[cell]·1e6 = row_total·col_total·1e6 div N in decimal —
    // no chi-square float, the caller compares integer millionths.
    // Shape: one cell aggregate, two marginal re-aggregates OF the cell
    // table (never a second corpus scan), both broadcast back.
    "crosstab_lang_source" -> ((s, dir) => {
      val cells = documents(s, dir)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rowT = cells.groupBy(col("lang")).agg(sum(col("n")).as("rt"))
      val colT = cells.groupBy(col("source")).agg(sum(col("n")).as("ct"))
      val nTot = cells.agg(sum(col("n")).as("nn"))
      cells
        .join(broadcast(rowT), Seq("lang"))
        .join(broadcast(colT), Seq("source"))
        .crossJoin(broadcast(nTot))
        .select(col("lang"), col("source"), col("n"),
          expr("CAST((CAST(rt AS DECIMAL(38,0)) * CAST(ct AS DECIMAL(38,0)) " +
            "* 1000000) div CAST(nn AS DECIMAL(38,0)) AS BIGINT)")
            .as("expected_millionths"))
        .orderBy(col("lang"), col("source"))
    }),

    // Deterministic content-hash split: stable train/val/test assignment
    // from the doc fingerprint's last hex digit (16ths: 14/1/1) — the
    // split survives reshuffles, re-runs and engine changes, unlike
    // row-order or RNG sampling.
    "split_train_test" -> ((s, dir) => {
      val d = TextFns.hexVal(substring(TextFns.fingerprint(col("text")), 32, 1))
      documents(s, dir)
        .withColumn("split",
          when(d < 14, "train").when(d === 14, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .orderBy(col("split"))
    }),

    // Leakage-safe split: near-dup CLUSTERS move as one unit — every
    // member takes the split of its component REPRESENTATIVE's content
    // hash, so the train/test boundary can never separate two near
    // duplicates (the eval-leakage failure mode of a naive per-doc
    // split). Cost on top of split_train_test is the LSH+components
    // chain dedup_clusters already runs; the rep's fingerprint arrives
    // by one extra join keyed by rep_id.
    "split_leakage_safe" -> ((s, dir) => {
      val docs = documents(s, dir)
      val pairs = Dedup.minhashLshPairs(docs, n = 3, bands = 4,
        rowsPerBand = 2, threshold = 0.5, maxDf = Some(MAX_DF))
      val comp = Dedup.componentsFromPairs(pairs.select(col("a"), col("b")))
      val withRep = docs.select(col("doc_id"), col("n_chars"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("rep_id", coalesce(col("rep_doc_id"), col("doc_id")))
      val repFp = docs.select(col("doc_id").as("rep_id"),
        TextFns.fingerprint(col("text")).as("rfp"))
      val d = TextFns.hexVal(substring(col("rfp"), 32, 1))
      withRep.join(repFp, Seq("rep_id"))
        .withColumn("split",
          when(d < 14, "train").when(d === 14, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rep_id") =!= col("doc_id"), 1L).otherwise(0L))
            .as("n_regrouped"))
        .orderBy(col("split"))
    }),

    // Stratified sample: first k docs per language (rank by doc_id) —
    // per-stratum quotas via ranking window, deterministic.
    "stratified_sample_docs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
      documents(s, dir)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("lang"), col("rnk").cast("long").as("rnk"), col("doc_id"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // TF-IDF top terms per document — the relational formulation: token
    // rows -> per-(doc,term) counts -> document frequency -> score.
    // idf is the exact rational N/df (not log-scaled): rank-equivalent
    // per document, and the single long->double division is correctly
    // rounded on both engines, so scores hash-match (a log() idf would
    // be at the mercy of each engine's libm).
    "tfidf_top_terms" -> ((s, dir) => {
      val tok = documents(s, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      // persisted: tf feeds both the df aggregate and the scoring join
      // (expensive to build, 3 columns wide — the caching profile).
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = documents(s, dir).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Token-rarity score: the portable stand-in for unigram-LM surprisal
    // (log-probabilities are libm-dependent and not hash-portable;
    // global frequency RANKS are exact integers). Every token gets its
    // dense rank by corpus frequency (rank 1 = most common); a doc's
    // rarity is its mean token rank in permille. High = rare/unusual
    // vocabulary, low = stopword soup — the same signal an LM
    // perplexity filter thresholds on.
    // Scale: one token-count aggregate, the rank table is vocabulary-
    // sized (broadcast; vocabularies are millions at worst), then a
    // map-side join + one doc_id-keyed aggregate.
    "token_rarity" -> ((s, dir) => {
      val toks = documents(s, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token"))
      val ranked = freq.select(col("token"),
        dense_rank().over(w).cast("long").as("rnk"))
      toks.join(broadcast(ranked), Seq("token"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("rnk")).as("rank_sum"))
        .withColumn("rarity_permille",
          floor(lit(1000) * col("rank_sum") / col("n_tokens")))
        .orderBy(col("doc_id"))
    }),

    // Tokenizer coverage / OOV rate: the vocabulary is the top-V tokens
    // by corpus frequency (deterministic tie-break on token), coverage
    // is aggregated per source in exact integer permille. The vocabulary
    // broadcasts (real tokenizer vocabs are <= millions of rows), so the
    // token stream is never shuffled by token for the coverage pass —
    // one map-side flag join + one source-keyed aggregate.
    "oov_rate" -> ((s, dir) => {
      val toks = documents(s, dir)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("token"))
      val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      // Top-V via orderBy+limit → TakeOrderedAndProject: each partition
      // keeps its local top V and only k·partitions rows reach the driver
      // side of the take — no single-partition exchange over the full
      // distinct-token table (which an unpartitioned row_number window
      // would force). Tie-break on token keeps the vocab deterministic.
      val vocab = freq.orderBy(col("n").desc, col("token")).limit(VOCAB_TOP)
        .select(col("token"), lit(1L).as("inv"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_permille", expr("(1000 * n_oov) div n_tokens"))
        .orderBy(col("source"))
    }),

    // Term frequency: global top-20 tokens.
    "term_freq_top20" -> ((s, dir) => {
      documents(s, dir)
        .select(explode(TextFns.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // Vocabulary growth curve (Heaps' law audit): new distinct token
    // types per doc-id bucket and the cumulative type count — the
    // corpus-health read that catches templated/synthetic text (its
    // type curve flattens far too early) and ingestion re-crawls (no
    // new types where fresh content should add them). A token's first
    // bucket is just min(bucket) — one hash aggregate keyed by token,
    // map-side combinable; the cumulative window runs over <= 17
    // bucket rows (width = max_id div 16 + 1, so the bucket count is
    // bounded at any corpus size), never over tokens. The tokenized
    // corpus is built once and persisted for its two aggregates.
    "vocab_growth_curve" -> ((s, dir) => {
      val w = documents(s, dir)
        .agg(expr("(max(doc_id) div 16) + 1").as("w"))
      val tb = documents(s, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
        .crossJoin(broadcast(w))
        .withColumn("bucket", expr("doc_id div w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val occ = tb.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("doc_id")).as("n_docs"))
      val newTypes = tb.groupBy(col("token"))
        .agg(min(col("bucket")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
      occ.join(newTypes, Seq("bucket"), "left")
        .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
        .withColumn("cum_types", sum(col("new_types")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("bucket"), col("n_docs"), col("n_tokens"),
          col("new_types"), col("cum_types"))
        .orderBy(col("bucket"))
    }),

    // Repeated-n-gram coverage per source — the corpus-level profile of
    // exact substring duplication (Lee et al., "Deduplicating Training
    // Data Makes Language Models Better": the signal their suffix-array
    // pass acts on, here at 3-gram shingle granularity). A shingle is
    // "repeated" when its document frequency exceeds 1; each doc
    // reports the fraction of its distinct shingles that are repeated,
    // rolled up per source as exact integer permille. Scale shape: the
    // tokenized shingle table is built ONCE and persisted (two
    // consumers: the df aggregate and the annotate join — without the
    // cache each would re-scan + re-tokenize the corpus), df is one
    // hash aggregate with map-side combine, and the annotate join fans
    // out 1:1 (each shingle occurrence picks up its df) — no pair
    // join anywhere, so cost stays linear in corpus shingles at 100 TB.
    "repeated_ngram_coverage" -> ((s, dir) => {
      val sh = documents(s, dir)
        .select(col("doc_id"), col("source"),
          explode(TextFns.shingleSet(col("text"), 3)).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      sh.join(dfq, Seq("sh"))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_rep"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs_shingled"),
          sum(col("n_sh")).as("total_shingles"),
          sum(col("n_rep")).as("repeated_shingles"))
        .withColumn("coverage_permille",
          expr("(1000 * repeated_shingles) div total_shingles"))
        .orderBy(col("source"))
    }),

    // Near-dup survivorship — the curation "keep best" step that turns a
    // dup-cluster labeling into a pruned corpus. Over the verified LSH
    // component labels (same graph as dedup_clusters), each cluster keeps
    // exactly one canonical document — longest n_chars, doc_id the
    // deterministic tie-break — and reports what the prune saves. Scale
    // shape: components are pointer-jumped (never all-pairs), the argmax
    // is one window over cluster members (partition = cluster, bounded by
    // the dup graph's component sizes), and singleton docs never enter
    // the join — cost is proportional to the dup graph, not the corpus.
    "dedup_survivorship" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(documents(s, dir),
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.5,
        maxDf = Some(MAX_DF))
      val comp = Dedup.componentsFromPairs(pairs.select(col("a"), col("b")))
      val members = comp.join(
        documents(s, dir).select(col("doc_id"), col("n_chars")),
        Seq("doc_id"))
      val w = Window.partitionBy(col("rep_doc_id"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      members.withColumn("rn", row_number().over(w))
        .groupBy(col("rep_doc_id"))
        .agg(
          max(when(col("rn") === 1, col("doc_id"))).as("kept_doc_id"),
          count(lit(1)).as("n_members"),
          sum(when(col("rn") === 1, col("n_chars")).otherwise(lit(0L)))
            .as("chars_kept"),
          sum(when(col("rn") =!= 1, col("n_chars")).otherwise(lit(0L)))
            .as("chars_dropped"))
        .orderBy(col("rep_doc_id"))
    })
  )

  def oracles: Map[String, String] = {

    // MinHash sigs + bands + candidates (mirrors Dedup.minhashLshPairs).
    val lshCommon =
      s"""$docsSql,
         |$dfShingledSql,
         |${lshCandSql(8, 4)}""".stripMargin
    val minhashSql =
      s"""WITH $lshCommon
         |${verifySql(0.5)}""".stripMargin

    // Connected components over the LSH pairs via recursive CTE
    // (mirrors Dedup.componentsFromPairs).
    val clustersSql =
      s"""WITH RECURSIVE $lshCommon,
         |${clusterTailSql(0.5)}
         |SELECT doc_id, rep_doc_id FROM comp ORDER BY doc_id""".stripMargin

    // Same recursive-CTE components, reduced to the log2 size histogram.
    val clusterSizeHistSql =
      s"""WITH RECURSIVE $lshCommon,
         |${clusterTailSql(0.5)},
         |sizes AS (SELECT rep_doc_id, count(*) AS sz FROM comp GROUP BY 1)
         |SELECT CAST(length(bin(sz)) - 1 AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(min(sz) AS BIGINT) AS min_sz,
         |  CAST(max(sz) AS BIGINT) AS max_sz
         |FROM sizes GROUP BY 1 ORDER BY bucket""".stripMargin

    // Exact inverted-index Jaccard. `sized=true` applies the size-ratio
    // lemma to the candidate join: J(A,B) = |A∩B|/|A∪B| <= min(|A|,|B|)
    // / max(|A|,|B|) (numerator <= min, denominator >= max), so J >= t
    // requires 10*min >= (10t)*max — a pair-constant predicate on the
    // join row, hence LOSSLESS w.r.t. the verified output. This is a
    // theorem about the metric, not an implementation mirror; the
    // t=0.5 family spot-check (dedup_ngram_jaccard) stays UNCONTRACTED
    // so one oracle per family still exercises the raw formulation.
    def ngramSqlAt(threshold: Double, sized: Boolean = false) = {
      // floor, not round: the lemma licenses 10*min >= (10t)*max only
      // for a cut at or BELOW 10t — a threshold whose *10 rounds UP
      // (e.g. 0.85 -> 9) would cut candidates the J <= min/max bound
      // still admits, silently dropping true pairs. Flooring keeps the
      // predicate conservative (lossless) at every threshold.
      val t10 = math.floor(threshold * 10).toLong
      val cand =
        if (sized)
          s"""invs AS MATERIALIZED (
             |  SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS sz
             |  FROM inv),
             |cand AS MATERIALIZED (
             |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |  FROM invs x JOIN invs y ON x.s = y.s AND x.doc_id < y.doc_id
             |  WHERE 10 * least(x.sz, y.sz) >= $t10 * greatest(x.sz, y.sz))"""
            .stripMargin
        else
          s"""cand AS (
             |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |  FROM inv x JOIN inv y ON x.s = y.s AND x.doc_id < y.doc_id)"""
            .stripMargin
      s"""WITH $docsSql,
         |$dfShingledSql,
         |$cand
         |${verifySql(threshold)}""".stripMargin
    }
    val ngramSql = ngramSqlAt(0.5)

    // Triangle census over the verified LSH pairs (mirrors the
    // dupgraph_triangles two-hop canonical-order enumeration).
    val trianglesSql =
      s"""WITH $lshCommon,
         |pairsq AS (${verifySql(0.5)}),
         |und AS (SELECT a AS u, b AS v FROM pairsq
         |        UNION ALL SELECT b AS u, a AS v FROM pairsq),
         |degs AS (SELECT u, count(*) AS d FROM und GROUP BY u),
         |agg AS (
         |  SELECT CAST((SELECT count(*) FROM degs) AS BIGINT) AS n_nodes,
         |    CAST((SELECT count(*) FROM pairsq) AS BIGINT) AS n_edges,
         |    CAST((SELECT count(*) FROM pairsq e1
         |          JOIN pairsq e2 ON e1.b = e2.a
         |          JOIN pairsq e3 ON e3.a = e1.a AND e3.b = e2.b)
         |      AS BIGINT) AS n_triangles,
         |    CAST((SELECT coalesce(sum(d * (d - 1) // 2), 0) FROM degs)
         |      AS BIGINT) AS n_wedges)
         |SELECT n_nodes, n_edges, n_triangles, n_wedges,
         |  CAST(CASE WHEN n_wedges > 0 THEN (3000 * n_triangles) // n_wedges
         |    ELSE 0 END AS BIGINT) AS cc_permille
         |FROM agg""".stripMargin

    // Neighborhood-Jaccard link prediction over the verified LSH pairs
    // (mirrors linkpred_jaccard's two-hop candidates + degree join).
    val linkpredSql =
      s"""WITH $lshCommon,
         |pairsq AS (${verifySql(0.5)}),
         |und AS (SELECT a AS u, b AS v FROM pairsq
         |        UNION ALL SELECT b AS u, a AS v FROM pairsq),
         |degs AS (SELECT u, count(*) AS d FROM und GROUP BY u),
         |cmn AS (
         |  SELECT e1.u AS a, e2.v AS b, count(*) AS common
         |  FROM und e1 JOIN und e2 ON e1.v = e2.u AND e1.u < e2.v
         |  GROUP BY 1, 2),
         |nonadj AS (
         |  SELECT c.a, c.b, c.common FROM cmn c
         |  WHERE NOT EXISTS (SELECT 1 FROM pairsq p
         |                    WHERE p.a = c.a AND p.b = c.b))
         |SELECT n.a, n.b, CAST(n.common AS BIGINT) AS common,
         |  CAST(da.d + db.d - n.common AS BIGINT) AS union_size,
         |  CAST((1000 * n.common) // (da.d + db.d - n.common) AS BIGINT)
         |    AS jaccard_permille
         |FROM nonadj n
         |JOIN degs da ON da.u = n.a
         |JOIN degs db ON db.u = n.b
         |ORDER BY jaccard_permille DESC, a, b LIMIT 100""".stripMargin

    // SimHash SQL (mirrors Dedup.withSimhash, nBits=16).
    val bitTerms = (0 until 16).map { b =>
      s"CASE WHEN list_sum(list_transform(shm, m -> ${hexValSql("m", b + 1)} % 2 * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" +\n      ")
    val simhashSql =
      s"""WITH $docsSql,
         |$shingledSql,
         |hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS shm FROM shingled),
         |sh2 AS (SELECT doc_id,
         |      $bitTerms AS simhash
         |  FROM hashed)
         |SELECT simhash, min(doc_id) AS rep_doc_id, count(*) AS n_docs
         |FROM sh2 GROUP BY simhash ORDER BY simhash""".stripMargin

    val langScores = Seq("en_s" -> EN, "es_s" -> ES, "de_s" -> DE, "fr_s" -> FR)
      .map { case (name, words) =>
        s"list_sum(list_transform(toks, t -> CASE WHEN t IN (${sqlIn(words)}) THEN 1 ELSE 0 END)) AS $name"
      }.mkString(",\n    ")

    Map(
      "text_fingerprint" ->
        """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
          |  CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tokens
          |FROM documents ORDER BY doc_id""".stripMargin,

      "dedup_exact" ->
        """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
          |  min(doc_id) AS rep_doc_id, count(*) AS n_dups
          |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,

      // nfc_normalize / strip_accents are DuckDB's twins of the
      // UnicodeNormalize expression and the NFD+\p{Mn} fold; the
      // VALUES list is UNICODE_FIXTURES verbatim (same escapes).
      "unicode_fingerprint_collapse" -> {
        val values = UNICODE_FIXTURES
          .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL SELECT * FROM (VALUES $values) AS t(doc_id, text)),
           |fp AS (
           |  SELECT
           |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_raw,
           |    md5(trim(regexp_replace(lower(nfc_normalize(
           |      regexp_replace(text, '$ZW', '', 'g'))), '\\s+', ' ', 'g'))) AS fp_nfc,
           |    md5(trim(regexp_replace(lower(strip_accents(nfc_normalize(
           |      regexp_replace(text, '$ZW', '', 'g')))), '\\s+', ' ', 'g'))) AS fp_fold
           |  FROM corpus)
           |SELECT mode, distinct_fp, n_docs FROM (
           |  SELECT 'raw' AS mode,
           |    CAST(count(DISTINCT fp_raw) AS BIGINT) AS distinct_fp,
           |    CAST(count(*) AS BIGINT) AS n_docs FROM fp
           |  UNION ALL SELECT 'nfc',
           |    CAST(count(DISTINCT fp_nfc) AS BIGINT),
           |    CAST(count(*) AS BIGINT) FROM fp
           |  UNION ALL SELECT 'folded',
           |    CAST(count(DISTINCT fp_fold) AS BIGINT),
           |    CAST(count(*) AS BIGINT) FROM fp)
           |ORDER BY mode""".stripMargin
      },

      // Same fixture VALUES as unicode_fingerprint_collapse; fp is the
      // fp_fold chain (zero-width strip -> NFC -> accent fold -> the
      // standard whitespace/lower fingerprint).
      "dedup_exact_unicode" -> {
        val values = UNICODE_FIXTURES
          .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL SELECT * FROM (VALUES $values) AS t(doc_id, text))
           |SELECT md5(trim(regexp_replace(lower(strip_accents(nfc_normalize(
           |    regexp_replace(text, '$ZW', '', 'g')))), '\\s+', ' ', 'g'))) AS fp,
           |  min(doc_id) AS rep_doc_id, count(*) AS n_dups
           |FROM corpus GROUP BY fp ORDER BY fp""".stripMargin
      },

      "dedup_minhash_lsh" -> minhashSql,

      // Mirrors dedup_lsh_recall: LSH-verified pairs vs the exact
      // inverted-index Jaccard pairs over the same capped universe.
      // found/truth verifies compute the intersection once (see
      // verifySql note); tcand carries the t=0.5 size-ratio lemma —
      // lossless (see ngramSqlAt), and the exact-truth self-join is
      // this gate's single heaviest oracle without it.
      "dedup_lsh_recall" ->
        s"""WITH $docsSql,
           |$dfShingledSql,
           |${lshCandSql(8, 4)},
           |found AS MATERIALIZED (
           |  SELECT a, b FROM (
           |    SELECT c.a, c.b, len(list_intersect(da.sh, db.sh)) AS ninter,
           |      len(da.sh) AS na, len(db.sh) AS nb
           |    FROM cand c
           |    JOIN shingled da ON da.doc_id = c.a
           |    JOIN shingled db ON db.doc_id = c.b)
           |  WHERE CAST(ninter AS DOUBLE) /
           |        CAST(na + nb - ninter AS DOUBLE) >= 0.5),
           |invs AS MATERIALIZED (
           |  SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS sz
           |  FROM inv),
           |tcand AS MATERIALIZED (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           |  FROM invs x JOIN invs y ON x.s = y.s AND x.doc_id < y.doc_id
           |  WHERE 10 * least(x.sz, y.sz) >= 5 * greatest(x.sz, y.sz)),
           |truth AS MATERIALIZED (
           |  SELECT a, b FROM (
           |    SELECT c.a, c.b, len(list_intersect(da.sh, db.sh)) AS ninter,
           |      len(da.sh) AS na, len(db.sh) AS nb
           |    FROM tcand c
           |    JOIN shingled da ON da.doc_id = c.a
           |    JOIN shingled db ON db.doc_id = c.b)
           |  WHERE CAST(ninter AS DOUBLE) /
           |        CAST(na + nb - ninter AS DOUBLE) >= 0.5),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n_matched
           |      FROM found f JOIN truth t ON f.a = t.a AND f.b = t.b)
           |SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           |  CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
           |  (SELECT n_matched FROM m) AS n_matched,
           |  CAST((1000 * (SELECT n_matched FROM m)) //
           |    (SELECT count(*) FROM truth) AS BIGINT) AS recall_permille,
           |  CAST((1000 * (SELECT n_matched FROM m)) //
           |    (SELECT count(*) FROM found) AS BIGINT)
           |    AS precision_permille""".stripMargin,

      "dedup_clusters" -> clustersSql,
      "dup_cluster_size_hist" -> clusterSizeHistSql,
      // Min-hop BFS from each component's rep. The plain recursive CTE
      // enumerates (node, d) pairs for EVERY reachable hop count, so a
      // depth cap is what makes it terminate on cyclic graphs; 30 > the
      // implementation's 20-round frontier bound, so any diameter the
      // cap could distort would already have thrown Spark-side.
      "bfs_layers" ->
        s"""WITH RECURSIVE $lshCommon,
           |${clusterTailSql(0.5)},
           |walk(node, d) AS (
           |  SELECT DISTINCT rep_doc_id AS node, 0 AS d FROM comp
           |  UNION
           |  SELECT e.v, w.d + 1 FROM walk w JOIN edges e ON e.u = w.node
           |  WHERE w.d < 30)
           |SELECT node AS doc_id, CAST(MIN(d) AS BIGINT) AS layer
           |FROM walk GROUP BY node ORDER BY doc_id""".stripMargin,
      // Survivorship: per-component canonical pick (n_chars desc, doc_id
      // asc) over the same component labels as dedup_clusters.
      "dedup_survivorship" ->
        s"""WITH RECURSIVE $lshCommon,
           |${clusterTailSql(0.5)},
           |members AS (
           |  SELECT c.rep_doc_id, d.doc_id, d.n_chars,
           |    row_number() OVER (PARTITION BY c.rep_doc_id
           |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
           |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
           |SELECT rep_doc_id,
           |  CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
           |    AS kept_doc_id,
           |  CAST(count(*) AS BIGINT) AS n_members,
           |  CAST(SUM(CASE WHEN rn = 1 THEN n_chars ELSE 0 END) AS BIGINT)
           |    AS chars_kept,
           |  CAST(SUM(CASE WHEN rn <> 1 THEN n_chars ELSE 0 END) AS BIGINT)
           |    AS chars_dropped
           |FROM members GROUP BY rep_doc_id
           |ORDER BY rep_doc_id""".stripMargin,
      "dedup_ngram_jaccard" -> ngramSql,
      // Prefix filtering is lossless, so the prefix-filtered tier is
      // pinned to the full-inverted-index oracle at ITS threshold (0.8)
      // — any false negative from a wrong prefix bound shows up as a
      // hash mismatch here. sized=true: the size-ratio lemma (see
      // ngramSqlAt) bounds the candidate join; at t=0.8 it is the
      // oracle-side cut that keeps the organic 10x gate inside budget.
      "dedup_jaccard_prefix" -> ngramSqlAt(0.8, sized = true),
      "dupgraph_triangles" -> trianglesSql,
      "linkpred_jaccard" -> linkpredSql,
      "dedup_simhash" -> simhashSql,

      // Weighted sparse cosine with the integer gate: occ keeps duplicate
      // shingles (multiset tf), weights are the linear rarity form
      // maxDf+1-df, and the 0.9 threshold is 100·dot² >= 81·na2·nb2.
      "cosine_sparse_pairs" ->
        s"""WITH occ AS (
           |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
           |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents),
           |       UNNEST(range(1, len(toks)-1)) AS t(i)),
           |tf AS (SELECT doc_id, s, count(*) AS tf FROM occ GROUP BY doc_id, s),
           |dfreq AS (SELECT s, count(*) AS df FROM tf GROUP BY s),
           |vec AS (SELECT doc_id, tf.s, tf * (${MAX_DF + 1} - df) AS tfw
           |        FROM tf JOIN dfreq ON tf.s = dfreq.s WHERE df <= $MAX_DF),
           |norms AS (SELECT doc_id, CAST(sum(tfw * tfw) AS BIGINT) AS n2
           |          FROM vec GROUP BY doc_id),
           |dots AS (
           |  SELECT x.doc_id AS a, y.doc_id AS b,
           |    CAST(sum(x.tfw * y.tfw) AS BIGINT) AS dot
           |  FROM vec x JOIN vec y ON x.s = y.s AND x.doc_id < y.doc_id
           |  GROUP BY x.doc_id, y.doc_id)
           |SELECT d.a, d.b, d.dot, na.n2 AS na2, nb.n2 AS nb2
           |FROM dots d JOIN norms na ON na.doc_id = d.a
           |            JOIN norms nb ON nb.doc_id = d.b
           |WHERE 100 * CAST(d.dot AS DECIMAL(38,0)) * d.dot >=
           |      81 * CAST(na.n2 AS DECIMAL(38,0)) * nb.n2
           |ORDER BY a, b""".stripMargin,

      "dedup_incremental" ->
        s"""WITH $docsSql,
           |$shingledSql,
           |hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS shm FROM shingled),
           |sh2 AS (SELECT doc_id,
           |      $bitTerms AS simhash
           |  FROM hashed)
           |SELECT n.doc_id, n.simhash FROM sh2 n
           |WHERE n.doc_id % 10 >= 8
           |  AND EXISTS (SELECT 1 FROM sh2 e
           |              WHERE e.doc_id % 10 < 8 AND e.simhash = n.simhash)
           |ORDER BY doc_id""".stripMargin,

      "token_rarity" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
          |  FROM documents),
          |freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
          |ranked AS (
          |  SELECT token, CAST(dense_rank() OVER (ORDER BY n DESC, token) AS BIGINT) AS rnk
          |  FROM freq)
          |SELECT doc_id, count(*) AS n_tokens,
          |  CAST(sum(rnk) AS BIGINT) AS rank_sum,
          |  (1000 * CAST(sum(rnk) AS BIGINT)) // count(*) AS rarity_permille
          |FROM tok JOIN ranked USING (token)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "decontaminate" ->
        s"""WITH $docsSql,
           |inv AS (SELECT doc_id, unnest(sh) AS s FROM docs),
           |ev AS (SELECT DISTINCT s FROM inv WHERE doc_id % 50 = 0)
           |SELECT i.doc_id, count(*) AS n_shared
           |FROM inv i JOIN ev USING (s)
           |WHERE i.doc_id % 50 <> 0
           |GROUP BY i.doc_id
           |HAVING count(*) >= 2
           |ORDER BY doc_id""".stripMargin,

      "chunk_dedup" ->
        """WITH toks AS (
          |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t
          |  FROM documents),
          |ch AS (
          |  SELECT doc_id, i // 8 AS ci,
          |    string_agg(t[i+1], ' ' ORDER BY i) AS chunk
          |  FROM toks, UNNEST(range(0, len(t))) AS u(i)
          |  GROUP BY doc_id, i // 8
          |  HAVING count(*) = 8)
          |SELECT md5(chunk) AS chunk_fp,
          |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          |  CAST(count(*) AS BIGINT) AS n_occ,
          |  CAST(min(doc_id) AS BIGINT) AS rep_doc_id
          |FROM ch GROUP BY md5(chunk)
          |HAVING count(DISTINCT doc_id) >= 2
          |ORDER BY chunk_fp""".stripMargin,

      "contamination_score" ->
        s"""WITH $docsSql,
           |inv AS (SELECT doc_id, unnest(sh) AS s FROM docs),
           |ev AS (SELECT DISTINCT s FROM inv WHERE doc_id % 50 = 0),
           |tr AS (SELECT doc_id, s FROM inv WHERE doc_id % 50 <> 0)
           |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           |  CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_shared,
           |  (1000 * CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT)) // CAST(count(*) AS BIGINT) AS overlap_permille
           |FROM tr LEFT JOIN ev USING (s)
           |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin,

      "doc_repetition" ->
        """WITH occ AS (
          |  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
          |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
          |        FROM documents),
          |       UNNEST(range(1, len(toks)-1)) AS t(i)),
          |per AS (SELECT doc_id, s, count(*) AS cnt FROM occ GROUP BY doc_id, s),
          |agg AS (
          |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_grams,
          |    count(*) AS distinct_grams, CAST(max(cnt) AS BIGINT) AS max_gram_count
          |  FROM per GROUP BY doc_id)
          |SELECT doc_id, total_grams, distinct_grams, max_gram_count,
          |  (1000 * (total_grams - distinct_grams)) // total_grams AS dup_permille,
          |  (1000 * max_gram_count) // total_grams AS top_gram_permille
          |FROM agg ORDER BY doc_id""".stripMargin,

      "lang_id_confusion" ->
        s"""WITH scored AS (
           |  SELECT lang,
           |    $langScores
           |  FROM (SELECT lang, regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents)),
           |pred AS (
           |  SELECT lang,
           |    CASE WHEN en_s >= es_s AND en_s >= de_s AND en_s >= fr_s THEN 'en'
           |         WHEN es_s >= de_s AND es_s >= fr_s THEN 'es'
           |         WHEN de_s >= fr_s THEN 'de'
           |         ELSE 'fr' END AS predicted
           |  FROM scored)
           |SELECT lang, predicted, count(*) AS n
           |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

      "quality_score" ->
        s"""WITH base AS (
           |  SELECT doc_id, text, regexp_extract_all(lower(text), '\\S+') AS toks
           |  FROM documents),
           |m AS (
           |  SELECT doc_id,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    list_sum(list_transform(toks, t -> CASE WHEN t IN (${sqlIn(EN)}) THEN 1 ELSE 0 END)) AS stop_hits,
           |    CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS BIGINT) AS punct_len,
           |    length(text) AS n_chars
           |  FROM base)
           |SELECT doc_id, n_tokens,
           |  CAST(stop_hits AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE) AS stop_ratio,
           |  CAST(punct_len AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
           |  0.5 * (CAST(stop_hits AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE))
           |    + 0.3 * (1.0 - CAST(punct_len AS DOUBLE) / CAST(n_chars AS DOUBLE))
           |    + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS score
           |FROM m ORDER BY doc_id""".stripMargin,

      "crosstab_lang_source" ->
        """WITH cells AS (
          |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
          |rt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS rt FROM cells GROUP BY 1),
          |ct AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ct FROM cells GROUP BY 1),
          |nn AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells)
          |SELECT lang, source, n,
          |  CAST((CAST(rt AS HUGEINT) * CAST(ct AS HUGEINT) * 1000000)
          |    // CAST(nn AS HUGEINT) AS BIGINT) AS expected_millionths
          |FROM cells JOIN rt USING (lang) JOIN ct USING (source), nn
          |ORDER BY lang, source""".stripMargin,

      "bigram_fluency" ->
        """WITH toks AS (
          |  SELECT doc_id, CAST(generate_subscripts(a, 1) AS BIGINT) AS pos,
          |    unnest(a) AS tok
          |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS a
          |        FROM documents)),
          |big AS (
          |  SELECT doc_id,
          |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
          |  FROM toks QUALIFY bg IS NOT NULL),
          |bf AS (SELECT bg, count(*) AS f FROM big GROUP BY 1),
          |t AS (SELECT count(*) AS total FROM big)
          |SELECT doc_id, count(*) AS n_bigrams,
          |  CAST((CAST(sum(f) AS HUGEINT) * 1000000000)
          |    // (CAST(count(*) AS HUGEINT)
          |       * CAST((SELECT total FROM t) AS HUGEINT)) AS BIGINT) AS fluency_ppb
          |FROM big JOIN bf USING (bg)
          |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "token_stats" ->
        """SELECT doc_id,
          |  CAST(len(toks) AS BIGINT) AS n_tokens,
          |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
          |  CAST(length(text) AS BIGINT) AS n_chars
          |FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
          |      FROM documents)
          |ORDER BY doc_id""".stripMargin,

      "split_train_test" ->
        s"""WITH f AS (
           |  SELECT n_chars,
           |    ${hexValSql("md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))", 32)} AS d
           |  FROM documents)
           |SELECT CASE WHEN d < 14 THEN 'train' WHEN d = 14 THEN 'val'
           |            ELSE 'test' END AS split,
           |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
           |FROM f GROUP BY split ORDER BY split""".stripMargin,

      "split_leakage_safe" ->
        s"""WITH RECURSIVE $lshCommon,
           |${clusterTailSql(0.5)},
           |rep AS (
           |  SELECT d.doc_id, coalesce(c.rep_doc_id, d.doc_id) AS rep_id
           |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
           |rfp AS (
           |  SELECT r.doc_id, r.rep_id,
           |    ${hexValSql("md5(trim(regexp_replace(lower(t.text), '\\s+', ' ', 'g')))", 32)} AS dd
           |  FROM rep r JOIN documents t ON t.doc_id = r.rep_id)
           |SELECT CASE WHEN dd < 14 THEN 'train' WHEN dd = 14 THEN 'val'
           |            ELSE 'test' END AS split,
           |  COUNT(*) AS n_docs,
           |  CAST(SUM(CASE WHEN rep_id <> doc_id THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_regrouped
           |FROM rfp GROUP BY split ORDER BY split""".stripMargin,

      "stratified_sample_docs" ->
        """SELECT lang, rnk, doc_id
          |FROM (SELECT lang, doc_id, CAST(row_number() OVER (
          |        PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rnk
          |      FROM documents)
          |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,

      "tfidf_top_terms" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
          |  FROM documents),
          |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
          |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
          |n AS (SELECT COUNT(*) AS n FROM documents),
          |scored AS (
          |  SELECT doc_id, term, CAST(tf * n AS DOUBLE) / df AS score
          |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
          |ranked AS (
          |  SELECT doc_id, term, score, CAST(row_number() OVER (
          |    PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rnk
          |  FROM scored)
          |SELECT doc_id, rnk, term, score FROM ranked
          |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

      "term_freq_top20" ->
        """SELECT token, count(*) AS n
          |FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token
          |      FROM documents)
          |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

      // Mirrors vocab_growth_curve: same bucket width, first-bucket
      // aggregate, bounded cumulative window.
      "vocab_growth_curve" ->
        s"""WITH w AS (SELECT (max(doc_id) // 16) + 1 AS w FROM documents),
           |tok AS (
           |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+'))
           |    AS token
           |  FROM documents),
           |tb AS (SELECT doc_id // w.w AS bucket, doc_id, token
           |       FROM tok, w),
           |occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
           |          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           |        FROM tb GROUP BY bucket),
           |fo AS (SELECT token, min(bucket) AS bucket FROM tb
           |       GROUP BY token),
           |nt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_types
           |       FROM fo GROUP BY bucket)
           |SELECT occ.bucket, n_docs, n_tokens,
           |  CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types,
           |  CAST(SUM(coalesce(nt.new_types, 0)) OVER (ORDER BY occ.bucket
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |    AS cum_types
           |FROM occ LEFT JOIN nt ON occ.bucket = nt.bucket
           |ORDER BY occ.bucket""".stripMargin,

      // Mirrors repeated_ngram_coverage: distinct 3-gram shingles per
      // doc (the docsSqlFrom shape, plus source), df over the corpus,
      // repeated = df > 1, per-source integer-permille rollup.
      "repeated_ngram_coverage" ->
        s"""WITH sh AS (
           |  SELECT doc_id, source, unnest(list_distinct(
           |    CASE WHEN len(toks) >= 3
           |      THEN list_transform(range(1, len(toks)-1),
           |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           |      ELSE []::VARCHAR[] END)) AS s
           |  FROM (SELECT doc_id, source,
           |          regexp_extract_all(lower(text), '\\S+') AS toks
           |        FROM documents)),
           |dfq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
           |per_doc AS (
           |  SELECT sh.doc_id, sh.source, count(*) AS n_sh,
           |    SUM(CASE WHEN dfq.df > 1 THEN 1 ELSE 0 END) AS n_rep
           |  FROM sh JOIN dfq USING (s)
           |  GROUP BY sh.doc_id, sh.source)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs_shingled,
           |  CAST(sum(n_sh) AS BIGINT) AS total_shingles,
           |  CAST(sum(n_rep) AS BIGINT) AS repeated_shingles,
           |  CAST((1000 * sum(n_rep)) // sum(n_sh) AS BIGINT)
           |    AS coverage_permille
           |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,

      "oov_rate" ->
        s"""WITH tok AS (
           |  SELECT source, unnest(regexp_extract_all(lower(text), '\\S+')) AS token
           |  FROM documents),
           |freq AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
           |vocab AS (
           |  SELECT token FROM (
           |    SELECT token, row_number() OVER (ORDER BY n DESC, token) AS rn
           |    FROM freq)
           |  WHERE rn <= $VOCAB_TOP)
           |SELECT t.source, count(*) AS n_tokens,
           |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_oov,
           |  CAST((1000 * sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END))
           |    // count(*) AS BIGINT) AS oov_permille
           |FROM tok t LEFT JOIN vocab v ON t.token = v.token
           |GROUP BY t.source ORDER BY t.source""".stripMargin
    )
  }
}
