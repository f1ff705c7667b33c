package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Dedup

/** Dev tool (GenBig's companion): measures the dedup family on the 10x
  * replicated corpus with the SCALE-INVARIANT df ceiling — frac 0.004 is
  * exactly the declared MAX_DF = 20 at sf0.1 (0.004 * 5000) and becomes
  * 200 at 10x, so the "drop shingles in > 0.4% of documents" semantics
  * survive the scale-up where an absolute cap would not (the replicated
  * corpus multiplies every df by 10). Prints one JSON line with pair/
  * cluster counts and wall seconds per stage.
  *
  * Usage: sbt "runMain graft.GenBig" then "runMain graft.ProbeDedup10x".
  */
object ProbeDedup10x {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp_sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val cap = math.ceil(nDocs * 0.004).toInt

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (nLsh, tLsh) = timed {
      Dedup.minhashLshPairs(docs, n = 3, bands = 4, rowsPerBand = 2,
        threshold = 0.5, maxDf = Some(cap)).count()
    }
    val (nJac, tJac) = timed {
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5,
        maxDf = Some(cap)).count()
    }
    // Prefix-filter tier vs the full inverted-index join at its
    // high-threshold regime (t=0.8): same result by construction — the
    // number that matters is the wall-clock gap once the corpus is 10x
    // and the candidate index is ~20% of the inverted index. Both run
    // against the same warmed shingle cache, so the delta isolates the
    // candidate-join cost.
    val (nJf8, tJf8) = timed {
      Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8,
        maxDf = Some(cap)).count()
    }
    val (nJp8, tJp8) = timed {
      Dedup.prefixJaccardPairs(docs, n = 3, threshold = 0.8,
        maxDf = Some(cap)).count()
    }

    // CC timed over MATERIALIZED pairs: the pair edges persist (and
    // count) outside the timed block, so cc_sec isolates the clustering
    // iterations instead of re-running the LSH chain under whatever
    // cache pressure the earlier stages left behind.
    val ccPairs = Dedup.minhashLshPairs(docs, n = 3, bands = 4,
        rowsPerBand = 2, threshold = 0.5, maxDf = Some(cap))
      .select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ccPairs.count()
    val (nCc, tCc) = timed {
      Dedup.componentsFromPairs(ccPairs).count()
    }

    // Banded-LSH embedding near-dup at the declared query's parameters
    // (2 tables x 8 bits, t=0.95, planted scaled copies). On the
    // replicated corpus every replica group is a genuine duplicate
    // clique, so PAIR OUTPUT grows quadratically per group by
    // construction; the number that matters is wall-clock vs the n²/2
    // all-pairs baseline the LSH banding avoids.
    val (nNd, tNd) = timed {
      import org.apache.spark.sql.functions.{lit, transform}
      val base = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val corpus = base.unionByName(
        base.filter(col("vec_id") % 5 === 0)
          .withColumn("vec_id", col("vec_id") + lit(100000000L))
          .withColumn("embedding", transform(col("embedding"), x => x * lit(0.9))))
      Dedup.embeddingNearDupLsh(corpus, threshold = 0.95, dims = 64,
        nTables = 2, nBits = 8).count()
    }

    def f(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"dedup10x","n_docs":$nDocs,"df_cap":$cap,""" +
      s""""lsh_pairs":$nLsh,"lsh_sec":${f(tLsh)},""" +
      s""""jaccard_pairs":$nJac,"jaccard_sec":${f(tJac)},""" +
      s""""full08_pairs":$nJf8,"full08_sec":${f(tJf8)},""" +
      s""""prefix08_pairs":$nJp8,"prefix08_sec":${f(tJp8)},""" +
      s""""clustered_docs":$nCc,"cc_sec":${f(tCc)},""" +
      s""""embed_nd_pairs":$nNd,"embed_nd_sec":${f(tNd)}}""")
    spark.stop()
  }
}
