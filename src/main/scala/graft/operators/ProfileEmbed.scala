package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Stage-timing probe for embed_near_dup at the organic corpora: the
  * 100x decade probe measured 161-272 s isolated against ~50 MB of
  * vectors (nReps=240k, bits=14, fetch=shuffle) — wildly past the
  * exponent-0.91 extrapolation from 10x→30x — so this isolates the
  * real stages (quantize+collapse, banding, the bucket pair join, the
  * distinct, the vector-fetch verify, the expansion) to find the
  * dominator before touching the operator. Tooling only — not part of
  * any query path. Mirrors SimilarityQ."embed_near_dup" parameters.
  */
object ProfileEmbed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("tmp_sf1_organic")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val PLANT_OFF = 1L << 40
    val (dims, nTables, nBits, ref, maxBits, thr) = (64, 2, 8, 2048L, 16, 0.95)

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      spark.catalog.clearCache()
      val base0 = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val corpus = base0.unionByName(
        base0.filter(col("vec_id") % 5 === 0)
          .withColumn("vec_id", col("vec_id") + lit(PLANT_OFF))
          .withColumn("embedding", transform(col("embedding"), x => x * lit(0.9))))

      val base = t("quantize + rep window") {
        val b = corpus.select(col("vec_id"),
            VectorFns.quantize(col("embedding")).as("q"))
          .withColumn("rep", min(col("vec_id")).over(
            Window.partitionBy(col("q"))))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  rows = ${b.count()}"); b
      }
      val members = base.select(col("rep"), col("vec_id"))
      val q = t("rep vectors + norms") {
        val qq = base.filter(col("rep") === col("vec_id"))
          .select(col("vec_id"), col("q"))
          .withColumn("nrm", VectorFns.normQ(col("q")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  nReps = ${qq.count()}"); qq
      }
      val nReps = q.count()
      val bits = Dedup.adaptiveBits(nBits, nReps, ref, maxBits)
      println(s"  bits = $bits")
      val tables = (0 until nTables).map { tb =>
        q.select(col("vec_id"), lit(tb).as("tbl"),
          VectorFns.lshBucket(col("q"), bits, dims,
            offset = tb * maxBits).as("bkt"))
      }.reduce(_ unionByName _)
      t("bucket histogram (top-5)") {
        tables.groupBy(col("tbl"), col("bkt")).count()
          .orderBy(col("count").desc).limit(5).collect()
          .foreach(r => println(s"  tbl=${r.get(0)} bkt=${r.get(1)} n=${r.get(2)}"))
      }
      val right = tables.select(col("tbl"), col("bkt"), col("vec_id").as("b"))
      val left = tables.select(col("tbl"), col("bkt"), col("vec_id").as("a"))
      val candRaw = left.join(right, Seq("tbl", "bkt"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"))
      t("bucket pair join (count, no distinct)") {
        println(s"  raw pair rows = ${candRaw.count()}")
      }
      val cand = t("distinct candidates") {
        val c = candRaw.distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  cand = ${c.count()}"); c
      }
      val va = q.select(col("vec_id").as("a"), col("q").as("qa"), col("nrm").as("na"))
      val vb = q.select(col("vec_id").as("b"), col("q").as("qb"), col("nrm").as("nb"))
      val repPairs = t("shuffle-fetch verify (count)") {
        val rp = cand.join(va, Seq("a")).join(vb, Seq("b"))
          .withColumn("cos",
            VectorFns.dotQ(col("qa"), col("qb")) / (col("na") * col("nb")))
          .filter(col("cos") >= thr)
          .select(col("a"), col("b"), col("cos"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  rep pairs = ${rp.count()}"); rp
      }
      t("expansion cross+intra (count)") {
        val cross = repPairs
          .join(members.select(col("rep").as("a"), col("vec_id").as("ma")), "a")
          .join(members.select(col("rep").as("b"), col("vec_id").as("mb")), "b")
          .select(least(col("ma"), col("mb")).as("a"),
            greatest(col("ma"), col("mb")).as("b"), col("cos"))
        val intra = q
          .withColumn("cos",
            VectorFns.dotQ(col("q"), col("q")) / (col("nrm") * col("nrm")))
          .filter(col("cos") >= thr)
          .select(col("vec_id").as("rep"), col("cos"))
          .join(members.select(col("rep"), col("vec_id").as("ma")), "rep")
          .join(members.select(col("rep"), col("vec_id").as("mb")), "rep")
          .filter(col("ma") < col("mb"))
          .select(col("ma").as("a"), col("mb").as("b"), col("cos"))
        println(s"  out rows = ${cross.unionByName(intra).count()}")
      }
      t("full operator (noop sink)") {
        Dedup.embeddingNearDupLshAdaptive(corpus, threshold = thr,
            dims = dims, nTables = nTables, nBits = nBits,
            refReps = ref, maxBits = maxBits)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
