package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFns

/** Equality pin for the semdedup_prune replica contraction: on a corpus
  * where every embedding appears twice (id-shifted copy), the contracted
  * query must emit bit-identical per-cluster rows to the uncontracted
  * plan (the pre-round-11 implementation, kept inline here).
  */
class SemDedupContractionTest extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private lazy val replicatedDir: String = {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rep = base.withColumn("vec_id", col("vec_id") + lit(200000L))
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    base.unionByName(rep).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The pre-round-11 semdedup_prune plan, verbatim (k = 8, t = 0.95). */
  private def uncontracted(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = base.unionByName(
      base.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
        .withColumn("embedding", transform(col("embedding"), x => x * lit(0.9))))
    val vecs = corpus.select(col("vec_id").as("id"),
        VectorFns.quantize(col("embedding")).as("qv"))
      .withColumn("nrm", VectorFns.normQ(col("qv")))
      .persist()
    val cents = vecs.filter(col("id") < 8)
      .select(col("id").as("cid"), col("qv").as("cv"), col("nrm").as("cnrm"))
    val asg = vecs.crossJoin(broadcast(cents))
      .withColumn("cos",
        VectorFns.dotQ(col("qv"), col("cv")) / (col("nrm") * col("cnrm")))
      .groupBy(col("id"))
      .agg(min(struct((-col("cos")).as("nc"), col("cid").as("c"))).as("m"))
      .select(col("id"), col("m.c").as("cid"))
    val mem = asg.join(vecs, Seq("id")).persist()
    val aSide = mem.select(col("cid"), col("id").as("a"),
      col("qv").as("qa"), col("nrm").as("na"))
    val bSide = mem.select(col("cid"), col("id").as("b"),
      col("qv").as("qb"), col("nrm").as("nb"))
    val pruned = aSide.join(bSide, Seq("cid"))
      .filter(col("a") < col("b"))
      .withColumn("cos",
        VectorFns.dotQ(col("qa"), col("qb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.95)
      .select(col("b").as("id")).distinct()
    mem.select(col("cid"), col("id"))
      .join(pruned.withColumn("p", lit(1L)), Seq("id"), "left")
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("p"), lit(0L))).as("n_pruned"))
      .withColumn("keep_permille",
        expr("(1000 * (n_vecs - n_pruned)) div n_vecs"))
      .orderBy(col("cid"))
  }

  test("semdedup_prune qv-group contraction equals the uncontracted plan") {
    import spark.implicits._
    val dir = replicatedDir
    val got = SimilarityQ.queries("semdedup_prune")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val want = uncontracted(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // Non-vacuous: the replicated corpus must actually prune something.
    assert(want.nonEmpty && want.exists(_._3 > 0L))
    assert(got == want)
    spark.catalog.clearCache()
  }
}
