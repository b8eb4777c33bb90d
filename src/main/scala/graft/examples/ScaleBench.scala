package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling study for the heavy/iterative queries: measures each target
  * at sf0.1 and at a 10×-scaled derivative, and reports the scaling
  * exponent log₁₀(t₁₀ₓ/t₁ₓ) — 1.0 = perfectly linear, <1 sublinear
  * (fixed costs amortizing), >1 superlinear (a plan that would not
  * survive 100×).
  *
  * The 10× input derives from sf0.1 by disjoint-keyspace replication:
  * ids shift per copy, and document WORDS get a per-copy suffix so
  * shingle spaces are disjoint across copies — within-copy near-dup
  * structure is preserved exactly while cross-copy Jaccard is 0.
  * (Plain replication would make every doc an exact dup of its 9
  * clones, adding ~45 cross-copy pairs per doc — a quadratic artifact
  * of the synthetic data, not of the operator under test.)
  *
  * Usage: runMain graft.examples.ScaleBench gen|bench [outDir] [target…]
  * (trailing target names restrict the bench to those queries — for
  * re-measuring a new target against already-generated 10× data
  * without repeating the full study)
  */
object ScaleBench {

  private val F = 10 // scale factor between the two measured points

  private val targets = Seq(
    "d7_lsh_verified_jaccard", "d8_dedup_clusters",
    "t19_leakage_safe_split", "p2_pagerank", "q29_salted_join",
    "q40_copurchase_pairs", "s5_ivf_topk",
    "d12_incremental_dedup", "p3_triangle_count",
    // the round-7 accuracy-contract reshapes grew exact companion
    // arms — re-measured so the exponent table matches shipped plans
    "q15_approx_users_per_type", "q26_approx_percentiles",
    "t9_freq_items",
    // round-8 additions: bloom gate, adaptive quality gate, PQ+rerank,
    // bigram-LM predictability
    "d13_bloom_gate", "t21_adaptive_quality_gate", "s9_pq_rerank",
    "t22_bigram_lm")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("bench")
    val scaledDir = args.lift(1).getOrElse("/tmp/graft-scale/sf1")
    val baseDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "gen") gen(spark, baseDir, scaledDir)
    else bench(spark, baseDir, scaledDir, args.drop(2).toSet)
    spark.stop()
  }

  private def copies(df: DataFrame): DataFrame =
    df.withColumn("c", explode(sequence(lit(0L), lit(F - 1L))))

  private def gen(
      spark: SparkSession, baseDir: String, outDir: String): Unit = {
    def rd(t: String) = spark.read.parquet(s"$baseDir/$t.parquet")
    def wr(df: DataFrame, t: String) =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // per-copy word suffix → disjoint shingle spaces; copy 0 keeps the
    // original text byte-for-byte
    wr(copies(rd("documents")).select(
      (col("doc_id") + col("c") * 1000000L).as("doc_id"),
      when(col("c") === 0L, col("text"))
        .otherwise(array_join(
          transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("c"))), " ")).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    wr(copies(rd("embeddings")).select(
      (col("vec_id") + col("c") * 1000000L).as("vec_id"),
      col("embedding"), col("label")), "embeddings")

    wr(copies(rd("lineitem")).select(
      (col("l_orderkey") + col("c") * 10000000L).as("l_orderkey"),
      (col("l_partkey") + col("c") * 1000000L).as("l_partkey"),
      col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    wr(copies(rd("orders")).select(
      (col("o_orderkey") + col("c") * 10000000L).as("o_orderkey"),
      col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")), "orders")

    // events: ids AND users shift per copy (10x rows, 10x distinct
    // users — the HLL/percentile sketches see genuinely larger
    // domains, not 10 replays of the same one); event_type and value
    // distributions are preserved exactly
    wr(copies(rd("events")).select(
      (col("event_id") + col("c") * 10000000L).as("event_id"),
      col("ts"),
      (col("user_id") + col("c") * 1000000L).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")
    println(s"[scale] wrote ${F}x tables to $outDir")
  }

  private def bench(
      spark: SparkSession, baseDir: String, scaledDir: String,
      only: Set[String] = Set.empty): Unit = {
    def dropBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def measure(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def run(): Unit =
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      run(); dropBlocks() // warmup: codegen + JIT
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        run()
        val dt = (System.nanoTime() - t0) / 1e9
        dropBlocks()
        dt
      }
      times.min
    }
    // JVM-wide warmup (same rationale as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()
    println(f"${"query"}%-26s ${"t(1x)/s"}%9s ${"t(10x)/s"}%9s ${"exponent"}%9s")
    targets.filter(n => only.isEmpty || only(n)).foreach { name =>
      val t1 = measure(name, baseDir)
      val t10 = measure(name, scaledDir)
      val exp = math.log10(t10 / t1)
      println(f"$name%-26s $t1%9.2f $t10%9.2f $exp%9.2f")
    }
  }
}
