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
  * Usage:
  *   runMain graft.examples.ScaleBench gen [outDir] [baseDir] [unit]
  *   runMain graft.examples.ScaleBench bench [dir10] [target…]
  *   runMain graft.examples.ScaleBench bench100 <dir10> <dir100> [target…]
  * (trailing target names restrict the bench to those queries — for
  * re-measuring a new target against already-generated 10× data
  * without repeating the full study)
  *
  * The second decade nests the generator: `gen /tmp/graft-scale/sf10
  * /tmp/graft-scale/sf1 10000000` replicates the 10× derivative again
  * with a 10×-larger id-shift unit, so the three keyspaces stay
  * mutually disjoint (level-1 doc ids reach ~9e6 + n; level-2 copies
  * shift by c·1e7) and level-2 word suffixes (`_c1_c2`) can't collide
  * with level-1's (`_c`). `bench100` then measures the heavy families
  * at 1×/10×/100× and reports the per-decade exponents — the "do the
  * sub-1 exponents HOLD across two decades" question that one decade
  * cannot answer.
  */
object ScaleBench {

  private val F = 10 // scale factor between adjacent measured points

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
    "t22_bigram_lm",
    // round-9: personalized PR joins the study (seed table now scales)
    "p4_personalized_pagerank",
    // round-9: substring dedup flag + removal rewrite
    "d14_substring_dedup", "d15_substring_removal",
    // round-9: DSIR importance selection
    "t23_dsir_select",
    // round-11: prefix-filter join, BFS, label propagation, BM25,
    // LM buckets, hashed-linear classifier, matryoshka rerank,
    // attribution
    "d16_prefix_filter_join", "p5_bfs_hops", "p6_label_prop",
    "t25_bm25_topk", "t26_lm_buckets", "t27_quality_classifier",
    "s11_matryoshka_rerank", "q54_attribution",
    // round-11 second batch: sketch difference, debounce, RFM,
    // association rules, link prediction (the wedge join is THE
    // Σdeg² risk), Gopher rules, frame deltas, MoM
    "q55_unconverted_audience", "q56_event_debounce",
    "q57_rfm_segments", "q58_association_rules", "p7_link_prediction",
    "t28_gopher_rules", "m9_frame_deltas", "q59_mom_revenue",
    "s12_ivfpq", "t29_source_overlap", "p8_kcore",
    // round-12: learned BPE (train + apply), contamination drill-down,
    // fertility, curriculum enumeration, PCM segmentation, keyframes,
    // anti-join + top-supplier TPC-H shapes, pruned range search
    "t31_bpe_merges", "t32_bpe_token_counts", "t33_contamination_docs",
    "t34_tokenizer_fertility", "t35_length_curriculum",
    "m10_silence_segments", "m11_keyframes",
    "q61_rich_inactive_customers", "q62_top_suppliers",
    "s13_range_search", "q63_nation_trade_volume",
    "t36_cms_frequency", "q64_shipping_priority", "t37_overlap_chunks",
    "q65_large_orders", "q66_promo_share",
    // round-13: graph-ANN beam, real image resize, cross-modal yield,
    // waiting-supplier Q21 shape, repetition Gopher rules
    "s14_knn_beam", "m12_box_resize", "m13_crossmodal_yield",
    "q67_waiting_suppliers", "t38_repetition_rules",
    // round-13 second batch: window-decorrelated Q17, disjunctive
    // Q19, mixed equi+theta semi Q4, reciprocal-rank fusion
    "q68_small_qty_revenue", "q69_banded_revenue",
    "q70_priority_check", "s15_rrf_fusion",
    "q71_returned_items", "q72_local_supplier_revenue",
    // round-13 third batch: MMR diversification, unigram entropy,
    // Q8 market-share and Q9 profit shapes
    "s16_mmr_diversify", "t39_unigram_entropy",
    "q73_market_share", "q74_product_profit",
    // round-13 fourth batch: Q16/Q6/Q12/Q20 shapes
    "q75_supplier_variety", "q76_revenue_forecast",
    "q77_late_priority_lines", "q78_excess_shipments",
    // round-13 fifth batch: Q2/Q11 shapes, PII redaction, canonical
    // dedup, filtered/hard-negative/metrics similarity ops, ZCR
    "q79_mincost_supplier", "q80_important_stock",
    "t40_pii_redaction", "d17_canonical_dedup", "s17_filtered_ann",
    "s18_hard_negatives", "s19_retrieval_metrics",
    "m14_zero_crossings", "s20_cluster_metrics",
    // round-13 sixth batch: GNN neighbor agg, Pareto skyline,
    // dedup yield accounting
    "p9_neighbor_agg", "q81_pareto_parts", "d18_dedup_yield",
    // round-13 seventh batch: distributed Lloyd k-means, SQ8 coded
    // search, ABC classes, temperature mixture, deletion propagation
    "s21_kmeans_lloyd", "s22_sq8_rerank", "q82_abc_inventory",
    "t41_source_temperature", "d19_deletion_propagation",
    "q83_entity_resolution",
    // round-13 eighth batch: winnowing fingerprints, luma-histogram
    // image gate, nprobe calibration sweep, seed-set reach profile
    "d20_winnowing", "m15_pixel_histogram", "s23_ivf_nprobe_sweep",
    "p10_reach_profile", "s24_hamming_topk", "t42_mixture_plan",
    "d21_duplication_profile",
    // round-14: banding calibration sweep, multi-pass ER, incremental
    // k-NN-graph maintenance (s14/s25 time-exponents here run on the
    // standard dirs; their RECALL-at-scale story runs on the
    // dim-permuted `genemb` dirs — see BeamRecallProbe scale modes)
    "d22_banding_sweep", "q84_entity_resolution_multipass",
    "s25_incremental_knn", "s26_knn_classifier",
    // round-15: indexed insert + filtered graph search (time
    // exponents on the standard dirs; the flat-insert-cost and
    // filtered-recall stories run on the dim-permuted dirs via
    // BeamRecallProbe `insertcost`/`filtered` modes)
    "s27_indexed_knn_insert", "s28_filtered_knn",
    // round-16: graph-ANN delete + update-in-place (time exponents on
    // the dim-permuted emb dirs like s27/s28; the recall stories are
    // BeamRecallProbe `delete`/`drift`/`update` modes)
    "s29_knn_delete", "s30_knn_update")

  /** The two-decade subset: the heaviest iterative/join families whose
    * 100×-survival claim the 10× study could only extrapolate.
    */
  private val heavyTargets = Seq(
    "p2_pagerank", "p4_personalized_pagerank", "s9_pq_rerank",
    "d7_lsh_verified_jaccard", "d8_dedup_clusters",
    "t19_leakage_safe_split",
    // round-12: the four highest decade-1 exponents (where "sub-
    // linear" could still mean "constants amortizing") + the round-11
    // graph family
    "d15_substring_removal", "d16_prefix_filter_join",
    "t28_gopher_rules", "t29_source_overlap",
    "p5_bfs_hops", "p6_label_prop", "p8_kcore",
    // round-13: the heaviest new 1x costs — GNN rounds, the three
    // CC-driven dedup/deletion derivations, blocked entity matching,
    // distributed Lloyd
    "p9_neighbor_agg", "d17_canonical_dedup", "d18_dedup_yield",
    "d19_deletion_propagation", "q83_entity_resolution",
    "s21_kmeans_lloyd",
    // round-14: the board's most expensive query joins the two-decade
    // table (build+serve fused here; the split is BeamRecallProbe
    // `scale` mode), plus the round-14 heavies (s14/s25 run on the
    // dim-permuted emb dirs; d22/q84 on the standard dirs)
    "s14_knn_beam", "s25_incremental_knn", "d22_banding_sweep",
    "q84_entity_resolution_multipass",
    // round-15 heavies (emb-dir queries: dim-permuted dirs)
    "s27_indexed_knn_insert", "s28_filtered_knn",
    // round-16 heavies (emb-dir queries: dim-permuted dirs)
    "s29_knn_delete", "s30_knn_update")

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("bench")
    val baseDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "gen" =>
        val outDir = args.lift(1).getOrElse("/tmp/graft-scale/sf1")
        gen(spark, args.lift(2).getOrElse(baseDir), outDir,
          args.lift(3).map(_.toLong).getOrElse(1000000L))
      case "genconst" =>
        val outDir = args.lift(1).getOrElse("/tmp/graft-scale-cb/sf1")
        genConstDocs(spark, args.lift(2).getOrElse(baseDir), outDir,
          args.lift(3).map(_.toLong).getOrElse(1000000L))
      case "genemb" =>
        val outDir = args.lift(1).getOrElse("/tmp/graft-scale-emb/sf1")
        genPermEmb(spark, args.lift(2).getOrElse(baseDir), outDir,
          args.lift(3).map(_.toLong).getOrElse(1000000L),
          args.lift(4).map(_.toInt).getOrElse(1))
      case "bench100" =>
        bench100(spark, baseDir, args(1), args(2), args.drop(3).toSet)
      case _ =>
        val scaledDir = args.lift(1).getOrElse("/tmp/graft-scale/sf1")
        bench(spark, baseDir, scaledDir, args.drop(2).toSet)
    }
    spark.stop()
  }

  private def copies(df: DataFrame): DataFrame =
    df.withColumn("c", explode(sequence(lit(0L), lit(F - 1L))))

  /** CONSTANT-BYTE ×10 replication of the documents table only — the
    * control for the `gen` suffix scheme's byte inflation (`_c` word
    * suffixes add ~2 chars per word per decade, 12.47× bytes over two
    * decades — exactly the log₁₀=1.10 component SCALE.md triages in
    * d15/t28/t29's exponents). Copy c substitutes letters through a
    * seeded alphabet permutation (Spark `translate`) instead of
    * suffixing: text LENGTH is preserved byte-for-byte, within-copy
    * token/shingle structure is isomorphic (a bijection on the
    * alphabet), and cross-copy vocabularies stay disjoint up to
    * negligible permutation coincidences (a whole word must map
    * identically under two independent random permutations). Copy 0
    * keeps the original text. Nest like `gen`; documents is the only
    * table the d15/t28/t29 control targets read.
    */
  private def genConstDocs(spark: SparkSession, baseDir: String,
      outDir: String, unit: Long): Unit = {
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def perm(seed: Int): String = {
      val arr = alpha.toCharArray
      val rnd = new java.util.Random(seed.toLong * 2654435761L)
      var i = arr.length - 1
      while (i >= 1) {
        val j = rnd.nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
        i -= 1
      }
      new String(arr)
    }
    val docs = copies(spark.read.parquet(s"$baseDir/documents.parquet"))
    val sub = (1 until F).foldLeft(
      when(col("c") === 0L, col("text"))) { (acc, k) =>
      acc.when(col("c") === k.toLong,
        translate(col("text"), alpha, perm(k)))
    }
    docs.select((col("doc_id") + col("c") * unit).as("doc_id"),
        sub.as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32) // split files — see the `wr` note in gen()
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** DIM-PERMUTED ×10 replication of the embeddings table only — the
    * ANN family's analog of `genconst`'s alphabet permutation: the
    * plain `gen` replicates embedding VECTORS verbatim across copies,
    * so every vector gains F-1 cosine-1.0 duplicates with IDENTICAL
    * LSH/SRP signatures — band buckets merge all copies and candidate
    * pairs grow QUADRATICALLY in the decade (a generator artifact: a
    * real 10× corpus does not become 100× more self-similar), and the
    * exact-top-k neighbor sets degenerate to the duplicate rings.
    * Copy c instead applies a seeded PERMUTATION of the 64 dimensions
    * (copy 0 = identity): norms, within-copy distances, and
    * within-copy neighbor structure are preserved EXACTLY (an
    * isometry), while cross-copy signatures decorrelate (a whole
    * sign-pattern must survive two independent dim shuffles). Nest
    * like `gen` with a different `levelSalt` so level-2 copy
    * compositions (c1, c2) never collapse to a shared permutation
    * (salt-less nesting would make (c, 0) and (0, c) identical).
    * Only the s14/ANN scale studies read these dirs — they contain
    * embeddings.parquet alone.
    */
  private def genPermEmb(spark: SparkSession, baseDir: String,
      outDir: String, unit: Long, levelSalt: Int): Unit = {
    def perm(c: Int): Array[Int] = {
      val arr = (0 until 64).toArray
      val rnd = new java.util.Random(
        (levelSalt.toLong * 1000L + c) * 2654435761L)
      var i = arr.length - 1
      while (i >= 1) {
        val j = rnd.nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
        i -= 1
      }
      arr
    }
    val emb = copies(spark.read.parquet(s"$baseDir/embeddings.parquet"))
    val permuted = (1 until F).foldLeft(
      when(col("c") === 0L, col("embedding"))) { (acc, k) =>
      acc.when(col("c") === k.toLong,
        array(perm(k).map(p => col("embedding")(p)).toIndexedSeq: _*))
    }
    emb.select((col("vec_id") + col("c") * unit).as("vec_id"),
        permuted.as("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[scale] wrote ${F}x dim-permuted embeddings from " +
      s"$baseDir to $outDir (unit=$unit, salt=$levelSalt)")
  }

  /** Disjoint-keyspace ×10 replication of `baseDir` into `outDir`.
    * `unit` is the id-shift per copy for the ~1e6-keyspace ids
    * (doc/vec/part/user); order/event keys shift by `10*unit`. Nest by
    * feeding a generated dir back in with a 10×-larger unit.
    */
  private def gen(spark: SparkSession, baseDir: String, outDir: String,
      unit: Long): Unit = {
    def rd(t: String) = spark.read.parquet(s"$baseDir/$t.parquet")
    // repartition(32) before writing: the explode-by-copy otherwise
    // inherits the (single-file) input's partitioning and writes ONE
    // parquet file — under 128 MB even at 100×, so every downstream
    // scan+explode ran as ONE task while the data grew 100×. That
    // parallelism starvation, not operator cost, was the round-12
    // d15 "superlinearity" (see SCALE.md round-13 control); split
    // files give the scan the task granularity a real corpus has.
    def wr(df: DataFrame, t: String) =
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")

    // per-copy word suffix → disjoint shingle spaces; copy 0 keeps the
    // original text byte-for-byte
    wr(copies(rd("documents")).select(
      (col("doc_id") + col("c") * unit).as("doc_id"),
      when(col("c") === 0L, col("text"))
        .otherwise(array_join(
          transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("c"))), " ")).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    wr(copies(rd("embeddings")).select(
      (col("vec_id") + col("c") * unit).as("vec_id"),
      col("embedding"), col("label")), "embeddings")

    wr(copies(rd("lineitem")).select(
      (col("l_orderkey") + col("c") * (unit * 10)).as("l_orderkey"),
      (col("l_partkey") + col("c") * unit).as("l_partkey"),
      col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    // part shifts in lockstep with l_partkey, so the co-purchase graph
    // keeps a dimension row per node and p4's Brand#4 seed set grows
    // with the graph (a fixed seed set over a 10× graph would measure
    // seed-locality, not the operator's data term)
    wr(copies(rd("part")).select(
      (col("p_partkey") + col("c") * unit).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")), "part")

    // customers shift with orders' o_custkey: 10× customers each
    // keeping their exact 1× order history (q57's per-customer RFM
    // distributions replicate instead of collapsing onto 1× keys)
    wr(copies(rd("orders")).select(
      (col("o_orderkey") + col("c") * (unit * 10)).as("o_orderkey"),
      (col("o_custkey") + col("c") * unit).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")), "orders")

    wr(copies(rd("customer")).select(
      (col("c_custkey") + col("c") * unit).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"),
      col("c_mktsegment")), "customer")

    // supplier passes through UNCHANGED: the generator never shifts
    // l_suppkey, so the supplier dim is genuinely stationary — 10×
    // lineitem rows spread over the same suppliers (q62's per-supplier
    // revenue grows 10×, which is the realistic dimension-table shape)
    wr(rd("supplier"), "supplier")
    // nation/region are true constants (25/5 rows) — pass through so
    // nation-gated queries (q63/q67) run against the scaled dirs
    wr(rd("nation"), "nation")
    wr(rd("region"), "region")

    // events: ids AND users shift per copy (10x rows, 10x distinct
    // users — the HLL/percentile sketches see genuinely larger
    // domains, not 10 replays of the same one); event_type and value
    // distributions are preserved exactly
    wr(copies(rd("events")).select(
      (col("event_id") + col("c") * (unit * 10)).as("event_id"),
      col("ts"),
      (col("user_id") + col("c") * unit).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")
    println(s"[scale] wrote ${F}x tables from $baseDir to $outDir (unit=$unit)")
  }

  private def dropBlocks(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  /** Bench's timing protocol: per-query codegen warmup run, block drop
    * between runs, min of 2 measured runs.
    */
  private def measure(
      spark: SparkSession, name: String, dir: String): Double = {
    val fn = graft.SparkEntry.queries(name)
    def run(): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    run(); dropBlocks(spark) // warmup: codegen + JIT
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      dropBlocks(spark)
      dt
    }
    times.min
  }

  private def bench(
      spark: SparkSession, baseDir: String, scaledDir: String,
      only: Set[String] = Set.empty): Unit = {
    // JVM-wide warmup (same rationale as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()
    println(f"${"query"}%-26s ${"t(1x)/s"}%9s ${"t(10x)/s"}%9s ${"exponent"}%9s")
    targets.filter(n => only.isEmpty || only(n)).foreach { name =>
      val t1 = measure(spark, name, baseDir)
      val t10 = measure(spark, name, scaledDir)
      val exp = math.log10(t10 / t1)
      println(f"$name%-26s $t1%9.2f $t10%9.2f $exp%9.2f")
    }
  }

  /** Two-decade study: 1× → 10× → 100×, per-decade exponents. A plan
    * whose 10× exponent was sub-1 only because fixed costs dominated
    * shows its true data term in the second decade — exp₂ is the
    * honest transfer claim for "would survive 100 TB".
    *
    * Shuffle partitions stay at 32 (= the box's cores) at every
    * decade. We MEASURED the alternative: 256 partitions at the 100×
    * point made the verification/CC family ~65% SLOWER (d7 104→171 s,
    * d8 119→198 s) — on a fixed 32-thread box the per-partition data
    * still fits (≲300 MB of exploded intermediate per partition at
    * 100×), so extra partitions only buy task-launch overhead and a
    * 256×256 shuffle-file explosion. Partition count should track
    * executor cores (which on a real cluster grow WITH the data), not
    * data bytes on a fixed box.
    */
  private def bench100(
      spark: SparkSession, baseDir: String, dir10: String, dir100: String,
      only: Set[String] = Set.empty): Unit = {
    spark.range(1000000).selectExpr("sum(id)").collect()
    println(f"${"query"}%-26s ${"t(1x)/s"}%9s ${"t(10x)/s"}%9s " +
      f"${"t(100x)/s"}%10s ${"exp 1->10"}%9s ${"exp 10->100"}%11s")
    heavyTargets.filter(n => only.isEmpty || only(n)).foreach { name =>
      val t1 = measure(spark, name, baseDir)
      val t10 = measure(spark, name, dir10)
      val t100 = measure(spark, name, dir100)
      val e1 = math.log10(t10 / t1)
      val e2 = math.log10(t100 / t10)
      println(f"$name%-26s $t1%9.2f $t10%9.2f $t100%10.2f $e1%9.2f $e2%11.2f")
    }
  }
}
