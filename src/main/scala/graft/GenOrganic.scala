package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an ORGANICALLY-GROWN sf1-equivalent dataset
  * (10x sf0.1) — fresh keys like [[GenBig]], but with content that
  * actually varies per copy, the way a corpus 10x the size would:
  *
  *  - document text mutates token-by-token (deterministic ~15% "typo"
  *    rate, digit-suffixed variants that grow the long-tail vocabulary),
  *    with ~5% of copies kept verbatim so a natural exact-dup rate
  *    survives;
  *  - embeddings get per-dimension ±2% deterministic noise (no exact
  *    replica vectors, near-dup structure preserved);
  *  - customer/supplier names re-embed their FRESH keys (organic name
  *    space, not 10 identical name replicas);
  *  - prices/quantities/dates/event-times jitter deterministically, so
  *    per-key aggregates differ per copy and per-user event sequences
  *    diverge (~10% of event types rotate).
  *
  * GenBig's exact replication is the adversarial output-blowup corpus
  * (every pair-producing query sees ~100x true pairs); this is the
  * REALISTIC-growth corpus that exercises the df ceilings and
  * prefix-vs-plain regime guards in the regime they were designed for.
  * No DuckDB oracle runs here (values are generator-defined, not
  * semantics-defined) — the artifact is the full-surface Bench pass:
  * zero failures + per-query seconds + the guard decisions Dedup logs
  * to stderr (committed as BENCH_sf1_organic.json / GUARDS notes).
  * Output is git-ignored scratch data, not test input.
  */
object GenOrganic {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/root/repo/tmp_sf1_organic"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    // args(1): copy count (default 10 = the sf1-equivalent corpus; the
    // round-14 scaling probe generates 30 to read the 10x→30x exponent
    // and drive the fan-out guards past their regime boundaries).
    val copies = if (args.length > 1) args(1).toInt else 10

    // deterministic pseudo-noise in [0, m): hash of the id columns + copy
    def h(m: Int, cols: Column*): Column =
      pmod(hash(cols: _*), lit(m)).cast("long")
    // symmetric jitter in [-1, 1] * scale
    def jitter(scale: Double, cols: Column*): Column =
      (h(2001, cols: _*) - 1000L).cast("double") / lit(1000.0 / scale)

    def perCopy(f: Int => DataFrame): DataFrame =
      (0 until copies).map(f).reduce(_ unionByName _)

    def write(name: String, df: DataFrame): Unit = {
      df.repartition(8).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $name")
    }

    val O = 1000000000L; val C = 10000000L; val P = 1000000L

    write("region", Tables.region(spark, sf))
    write("nation", Tables.nation(spark, sf))

    write("customer", perCopy { i =>
      Tables.customer(spark, sf)
        .withColumn("c_custkey", col("c_custkey") + lit(i * C))
        .withColumn("c_name",
          format_string("Customer#%09d", col("c_custkey")))
        .withColumn("c_acctbal", round(col("c_acctbal") +
          jitter(10.0, col("c_custkey"), lit(i)), 2))
    })
    write("supplier", perCopy { i =>
      Tables.supplier(spark, sf)
        .withColumn("s_suppkey", col("s_suppkey") + lit(i * P))
        .withColumn("s_name",
          format_string("Supplier#%09d", col("s_suppkey")))
        .withColumn("s_acctbal", round(col("s_acctbal") +
          jitter(10.0, col("s_suppkey"), lit(i)), 2))
    })
    // p_name keeps its (inherently small) adjective-noun domain — that
    // domain does not grow with corpus size in the source generator
    // either; only keys and prices move.
    write("part", perCopy { i =>
      Tables.part(spark, sf)
        .withColumn("p_partkey", col("p_partkey") + lit(i * P))
        .withColumn("p_retailprice", round(col("p_retailprice") +
          jitter(5.0, col("p_partkey"), lit(i)), 2))
    })
    write("orders", perCopy { i =>
      Tables.orders(spark, sf)
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * O))
        .withColumn("o_custkey", col("o_custkey") + lit(i * C))
        .withColumn("o_totalprice", round(col("o_totalprice") *
          (lit(1.0) + jitter(0.02, col("o_orderkey"), lit(i))), 2))
        .withColumn("o_orderdate", col("o_orderdate") +
          make_dt_interval(h(7, col("o_orderkey"), lit(i + 1))))
    })
    write("lineitem", perCopy { i =>
      Tables.lineitem(spark, sf)
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * O))
        .withColumn("l_partkey", col("l_partkey") + lit(i * P))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * P))
        .withColumn("l_quantity",
          (pmod(col("l_quantity").cast("long") - 1 +
            h(5, col("l_orderkey"), col("l_linenumber"), lit(i)),
            lit(50L)) + 1L).cast("double"))
        .withColumn("l_extendedprice", round(col("l_extendedprice") *
          (lit(1.0) + jitter(0.02, col("l_orderkey"),
            col("l_linenumber"), lit(i))), 2))
        .withColumn("l_shipdate", col("l_shipdate") +
          make_dt_interval(h(7, col("l_orderkey"), lit(i + 2))))
    })

    // documents: token-level mutation, relational (posexplode + window
    // order + re-concat); ~15% of tokens get a digit-suffixed variant,
    // ~5% of copied docs stay verbatim (natural exact-dup rate).
    write("documents", perCopy { i =>
      val base = Tables.documents(spark, sf)
        .withColumn("doc_id", col("doc_id") + lit(i * 100000L))
      if (i == 0) base
      else base
        .withColumn("_keep", h(100, col("doc_id"), lit(i)) < 5)
        .select(col("doc_id"), col("lang"), col("source"), col("_keep"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .withColumn("tok",
          when(!col("_keep") &&
            h(100, col("doc_id"), col("pos"), lit(i)) < 15,
            concat(col("tok"),
              h(10, col("doc_id"), col("pos"), lit(i + 1))))
            .otherwise(col("tok")))
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    })

    // embeddings: ±2% per-dimension deterministic noise, floats stay
    // floats; label unchanged (organic vectors cluster like the source).
    write("embeddings", perCopy { i =>
      val base = Tables.embeddings(spark, sf)
        .withColumn("vec_id", col("vec_id") + lit(i * 100000L))
      if (i == 0) base
      else base.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x * (lit(1.0f) +
            (pmod(hash(col("vec_id"), j, lit(i)), lit(2001)) - 1000)
              .cast("float") / lit(50000.0f))).cast("float")))
    })

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val types = array(Seq("signup", "click", "error", "view", "purchase")
      .map(lit): _*)
    write("events", perCopy { i =>
      val base = ev
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 1000L))
      if (i == 0) base
      else base
        // sf0.1 stores ts as TIMESTAMP_NTZ micros: jitter ±30 s through
        // epoch-micros arithmetic, preserving the NTZ type (UTC session,
        // so the wall-clock equals the instant)
        .withColumn("ts", timestamp_micros(
          unix_micros(col("ts").cast("timestamp")) +
            (h(60000, col("event_id"), lit(i)) - 30000L) * lit(1000L))
          .cast("timestamp_ntz"))
        .withColumn("event_type",
          when(h(100, col("event_id"), lit(i + 3)) < 10,
            element_at(types,
              (h(5, col("event_id"), lit(i + 4)) + 1).cast("int")))
            .otherwise(col("event_type")))
        .withColumn("value", round(col("value") *
          (lit(1.0) + jitter(0.05, col("event_id"), lit(i))), 3))
    })
    spark.stop()
  }
}
