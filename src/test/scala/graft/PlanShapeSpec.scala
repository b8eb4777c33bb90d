package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}

/** Plan-shape regression guards: the properties that make these plans
  * scale must not silently disappear in a refactor — filters reaching
  * the parquet scan, dimension joins broadcasting, rank-limit pushdown,
  * and no accidental cartesian products outside the brute-force
  * similarity baselines.
  */
class PlanShapeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def planOf(name: String) = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan
  }

  test("q1 pushes the ship-date filter into the parquet scan") {
    val s = planOf("q1_pricing_summary").toString
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"missing pushdown in:\n$s")
    assert(!s.contains("l_comment"), "scan should prune unused columns")
  }

  test("metadata enrichment joins stay broadcast") {
    val plan = finalPlan(planOf("ref_complete_flights"))
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected BroadcastHashJoin in:\n$plan")
  }

  test("ranking windows keep the group-limit pushdown") {
    val s = planOf("q4_top_orders_per_customer").toString
    assert(s.contains("WindowGroupLimit"), s"missing WindowGroupLimit in:\n$s")
  }

  test("stratified sampling keeps the group-limit pushdown") {
    val s = planOf("t6_stratified_sample").toString
    assert(s.contains("WindowGroupLimit"), s"missing WindowGroupLimit in:\n$s")
  }

  test("vocabulary scan prunes to the text column") {
    val s = planOf("t5_top_tokens").toString
    assert(s.contains("ReadSchema: struct<text:string>"),
      s"scan should read only text in:\n$s")
  }

  test("binned range join never falls back to a nested loop") {
    val s = planOf("q31_range_join").toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"), s)
  }

  test("native as-of join plans its merge exec, not a window") {
    val s = planOf("q28_asof_native").toString
    assert(s.contains("AsOfJoin "), s)
    assert(!s.contains("Window"), s)
  }

  test("tf-idf: AQE broadcasts the UNHINTED document-frequency table " +
      "at test scale (token vocab is unbounded at 100 TB, so the " +
      "hint is the optimizer's call) plus the corpus-size scalar") {
    val plan = finalPlan(planOf("t11_tfidf"))
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"df table should broadcast here:\n$plan")
    assert(!plan.toString.contains("SortMergeJoin"),
      "no shuffled join belongs in the tf-idf plan at this scale")
  }

  test("bm25 broadcasts df + corpus scalars and plans a distributed " +
      "top-k, never a global sort") {
    val plan = finalPlan(planOf("t25_bm25_topk"))
    val s = plan.toString
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"document-frequency table must broadcast:\n$s")
    assert(s.contains("TakeOrderedAndProject"),
      s"global top-25 must be TakeOrderedAndProject:\n$s")
    assert(!s.contains("SortMergeJoin"),
      s"no shuffled join belongs in the bm25 plan:\n$s")
  }

  test("lm bucketing broadcasts the lang-cardinality tercile table") {
    val plan = finalPlan(planOf("t26_lm_buckets"))
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"tercile cut table must broadcast:\n$plan")
  }

  test("rfm scoring windows all partition by nation — no " +
      "single-partition global sort") {
    val s = planOf("q57_rfm_segments").toString
    assert(!s.contains("Window [") ||
      !s.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"unpartitioned window in:\n$s")
    // every Window node must carry a partition spec (c_nationkey)
    val windowLines = s.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty, s)
    windowLines.foreach(l =>
      assert(l.contains("c_nationkey"), s"window not nation-keyed: $l"))
  }

  test("link prediction wedges and flags stay equi-joins — no " +
      "cartesian, no nested loop") {
    val s = planOf("p7_link_prediction").toString
    assert(!s.contains("CartesianProduct")
      && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("association rules: the UNHINTED item-support joins still " +
      "broadcast at test scale — AQE sizes them from statistics " +
      "(the hint is gone so a 100× catalog can shuffle instead)") {
    val plan = finalPlan(planOf("q58_association_rules"))
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 2,
      s"AQE should broadcast the small item supports here:\n$plan")
  }

  test("chunking is a zero-shuffle narrow map") {
    val s = planOf("t12_chunk_pack").toString
    assert(!s.contains("Exchange"),
      s"chunk packing must not shuffle:\n$s")
  }

  test("contamination check: AQE broadcasts the UNHINTED eval-gram " +
      "side at test scale (simulated as a corpus fraction, so a " +
      "forced hint would grow with the data)") {
    val plan = finalPlan(planOf("t13_contamination"))
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"eval grams should broadcast here:\n$plan")
  }

  test("sequence packing never uses a single-partition global window") {
    val s = planOf("t14_sequence_pack").toString
    assert(!s.contains("SinglePartition"),
      s"packing must stay shard-partitioned:\n$s")
  }

  test("no cartesian products anywhere — even the brute-force exact " +
      "scans broadcast their query side") {
    SparkEntry.queries.keys.toSeq.sorted
      .foreach { name =>
        val plan = finalPlan(planOf(name))
        val cartesian = plan.collect { case c: CartesianProductExec => c }
        assert(cartesian.isEmpty, s"unexpected cartesian product in $name")
      }
  }

  test("q63/q64/q65/q67's SF-growing dim legs broadcast via AQE at " +
      "bench scale — the size-aware degradation the comments promise") {
    // These joins deliberately carry NO broadcast hint (supplier and
    // customer grow with SF), so the broadcast must come from AQE's
    // runtime size estimate. Run at sf0.01 — bench-representative —
    // and assert the adaptive FINAL plan broadcast-hash-joins the
    // named dim key; a future hint/threshold regression turns these
    // into SortMergeJoins and fails here instead of only in BENCH.
    val bench = "/root/testdata/sf0.01"
    val wantKeys = Seq(
      "q63_nation_trade_volume" -> Seq("suppkey", "custkey"),
      "q64_shipping_priority" -> Seq("custkey"),
      "q65_large_orders" -> Seq("custkey"),
      "q67_waiting_suppliers" -> Seq("suppkey"))
    wantKeys.foreach { case (name, keys) =>
      val df = SparkEntry.queries(name)(spark, bench)
      df.write.format("noop").mode("overwrite").save()
      val plan = finalPlan(df.queryExecution.executedPlan)
      val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
      keys.foreach { k =>
        assert(bhj.exists(b =>
          (b.leftKeys ++ b.rightKeys).mkString(",").contains(k)),
          s"$name: expected AQE BroadcastHashJoin on '$k', got:\n$plan")
      }
    }
  }

  test("q68's correlated average is de-correlated to a window over " +
      "the gated slice — ONE fact scan, never an aggregate+rejoin " +
      "that re-executes the lineitem subtree") {
    val s = planOf("q68_small_qty_revenue").toString
    val factScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(factScans == 1,
      s"expected exactly one lineitem scan, found $factScans in:\n$s")
    assert(s.contains("Window"), s"per-part stats must be a window:\n$s")
  }

  test("q69's OR-of-ANDs pushes its per-side envelopes into BOTH " +
      "scans — the disjunction reaches part AND the derived quantity " +
      "union reaches lineitem") {
    val s = planOf("q69_banded_revenue").toString
    assert(s.contains("Or(Or(And(EqualTo(p_brand"),
      s"part-side disjunction must push into the part scan:\n$s")
    assert(s.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
      s"quantity envelope must push into the lineitem scan:\n$s")
  }

  test("q70's EXISTS plans as one left-semi hash join with the date " +
      "inequality as a residual — no dedup aggregate, no nested loop") {
    val s = finalPlan(planOf("q70_priority_check")).toString
    assert(s.contains("LeftSemi"), s"expected a semi join:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin")
      && !s.contains("CartesianProduct"),
      s"mixed equi+theta semi must stay a hash join:\n$s")
    assert(!s.contains("HashAggregate(keys=[o_orderkey"),
      s"left_semi means no post-join distinct:\n$s")
  }

  test("s15's fusion is LIVE: the fused order differs from the " +
      "full-cosine order (the prefix ranker actually contributes), " +
      "and each ranker cut is a WindowGroupLimit") {
    val rows = SparkEntry.queries("s15_rrf_fusion")(spark, dir)
      .select("q_id", "fused_rank", "rank_full").collect()
    assert(rows.length == 50, s"10 queries x top-5, got ${rows.length}")
    assert(rows.exists(r => r.getLong(1) != r.getLong(2)),
      "fused rank never diverged from the full-cosine rank — " +
        "fusion is a no-op on this corpus")
    val s = planOf("s15_rrf_fusion").toString
    assert(s.contains("WindowGroupLimit"),
      s"top-20 cuts must push into WindowGroupLimit:\n$s")
  }

  test("q71 pre-prunes BOTH fact sides in the scans and plans its " +
      "top-20 as TakeOrderedAndProject, never a global sort") {
    val s = planOf("q71_returned_items").toString
    assert(s.contains("EqualTo(l_returnflag,R)"),
      s"returnflag must push into the lineitem scan:\n$s")
    assert(s.contains("GreaterThanOrEqual(o_orderdate"),
      s"quarter window must push into the orders scan:\n$s")
    assert(s.contains("TakeOrderedAndProject"),
      s"limit 20 must be partition-local heaps:\n$s")
  }

  test("q72's cross-dimension correlation stays routed through " +
      "equi-joins — no cartesian, no nested loop") {
    val s = finalPlan(planOf("q72_local_supplier_revenue")).toString
    assert(!s.contains("CartesianProduct")
      && !s.contains("BroadcastNestedLoopJoin"),
      s"c_nationkey = s_nationkey must resolve post-join:\n$s")
  }

  test("s16's diversification is LIVE: the MMR pick differs from the " +
      "pure-relevance top-5 for at least one query") {
    val mmr = SparkEntry.queries("s16_mmr_diversify")(spark, dir)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mmr.size == 50, s"10 queries x 5 picks, got ${mmr.size}")
    val rel = SparkEntry.queries("s1_cosine_topk")(spark, dir)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mmr != rel,
      "MMR never deviated from the relevance top-5 — the diversity " +
        "penalty is a no-op on this corpus")
  }

  test("t39's shuffle chain is minimal: a map-side-combinable word " +
      "count, then the doc window and final agg REUSE one doc_id " +
      "partitioning — exactly two exchanges, no more") {
    val s = finalPlan(planOf("t39_unigram_entropy")).toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(exchanges == 2,
      s"expected (doc,word) + doc_id exchanges only, found $exchanges:\n$s")
    assert(s.contains("partial_count"),
      s"word count must have a map-side partial:\n$s")
  }

  test("q73 computes numerator and denominator in ONE pass — a " +
      "single lineitem scan feeding sum(CASE), with the part gate " +
      "and date window pushed down") {
    val s = planOf("q73_market_share").toString
    val factScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(factScans == 1,
      s"share must not re-walk the join per aggregate, found $factScans scans:\n$s")
    assert(s.contains("EqualTo(p_type,PROMO)"),
      s"part gate must push into the part scan:\n$s")
    assert(s.contains("GreaterThanOrEqual(o_orderdate"),
      s"date window must push into the orders scan:\n$s")
  }

  test("q74 pushes the p_name LIKE gate into the part scan as a " +
      "StringContains and keeps a single fact scan") {
    val s = planOf("q74_product_profit").toString
    assert(s.contains("StringContains(p_name,widget)"),
      s"LIKE gate must push into the part scan:\n$s")
    val factScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(factScans == 1, s"expected one lineitem scan:\n$s")
  }

  test("q75's count(DISTINCT) dedups (brand, size, suppkey) MAP-SIDE " +
      "before any exchange, the NOT IN is a broadcast anti join, and " +
      "both part gates push into the scan") {
    val s = planOf("q75_supplier_variety").toString
    assert(s.contains("partial_count(distinct l_suppkey"),
      s"distinct agg must be the two-level partial plan:\n$s")
    assert(s.contains("LeftAnti"),
      s"the exclusion list must plan as an anti join:\n$s")
    assert(s.contains("Not(EqualTo(p_type,PROMO))")
      && s.contains("In(p_brand"),
      s"part gates must push into the part scan:\n$s")
  }

  test("q76 is the pure-scan aggregate: all three range predicates " +
      "reach the parquet scan and the plan has NO joins") {
    val plan = finalPlan(planOf("q76_revenue_forecast"))
    // the plan's toString truncates long PushedFilters lists — read
    // the scan node's (untruncated) metadata instead
    val pushed = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate")
      && pushed.contains("GreaterThanOrEqual(l_discount,0.05")
      && pushed.contains("LessThan(l_quantity,25"),
      s"all three ranges must appear in PushedFilters: $pushed")
    val s = plan.toString
    assert(!s.contains("Join"), s"Q6 shape must not join:\n$s")
  }

  test("q77's row-vs-row lateness predicate keeps the orderkey join " +
      "a hash join and both CASE sums ride ONE aggregate pass") {
    val s = finalPlan(planOf("q77_late_priority_lines")).toString
    assert(!s.contains("BroadcastNestedLoopJoin")
      && !s.contains("CartesianProduct"),
      s"big-big join must stay a hash/sort-merge join:\n$s")
    val aggScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(aggScans == 1,
      s"both conditional counts must share one pass, found $aggScans scans:\n$s")
  }

  test("q78's correlated threshold de-correlates to a window over " +
      "the pair aggregate — ONE fact scan — and the qualifying set " +
      "lifts through a left-semi join") {
    val s = planOf("q78_excess_shipments").toString
    val factScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(factScans == 1,
      s"expected one lineitem scan, found $factScans:\n$s")
    assert(s.contains("Window"), s"per-part stats must be a window:\n$s")
    assert(s.contains("LeftSemi"),
      s"qualifying suppliers must lift via semi join:\n$s")
  }

  test("the exact cosine scan is a broadcast nested loop, not a " +
      "cartesian shuffle") {
    val s = planOf("s1_cosine_topk").toString
    assert(s.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast:\n$s")
  }

  test("contamination drill-down keeps the top-3-per-pair rank as a " +
      "WindowGroupLimit, never a full per-pair sort") {
    val s = planOf("t33_contamination_docs").toString
    assert(s.contains("WindowGroupLimit"),
      s"rk <= 3 must push into WindowGroupLimit:\n$s")
  }

  test("q38's single-row funnel-count stitch broadcasts both sides — " +
      "no cartesian shuffle") {
    val s = planOf("q38_funnel").toString
    assert(s.contains("BroadcastNestedLoopJoin"),
      s"single-row aggregates must stitch via broadcast:\n$s")
    assert(!s.contains("CartesianProduct"),
      s"no cartesian in the funnel stitch:\n$s")
  }

  test("PageRank rounds broadcast the rate table into the edges") {
    // checkpointing erases each round's join from the final plan —
    // observe the live round plans through the instrumentation hook
    import SparkTestSession.spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("s", "t")
    val rounds = scala.collection.mutable.Buffer[
      org.apache.spark.sql.DataFrame]()
    graft.operators.PageRank.run(edges, "s", "t", iterations = 2,
      inspectRound = rounds += _)
    assert(rounds.size == 2)
    // string match, not collect(): the join sits inside an AQE
    // ResultQueryStage whose children a plan collect cannot traverse
    val plans = rounds.map(_.queryExecution.executedPlan.toString)
    assert(plans.forall(_.contains("BroadcastHashJoin")),
      s"expected the per-round rate join to broadcast:\n${plans.mkString}")
  }

  test("connected-components rounds plan equi-joins only — no " +
      "cartesian or nested loop in any iteration") {
    import SparkTestSession.spark.implicits._
    // 6-node chain: takes several pointer-jumping rounds to converge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val rounds = scala.collection.mutable.Buffer[
      org.apache.spark.sql.DataFrame]()
    graft.operators.ConnectedComponents.run(edges, "a", "b",
      inspectRound = rounds += _)
    assert(rounds.nonEmpty)
    val plans = rounds.map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"CC round must plan equi-joins only:\n$p")
    }
  }

  test("near-dup verification gates the shingle explosion behind a " +
      "broadcast semi-join on the candidate set") {
    import SparkTestSession.spark.implicits._
    val cand = Seq(1L, 2L).toDF("doc_id")
    val plan = graft.queries.TextQueries
      .gatedShingleScan(SparkTestSession.spark,
        "/root/testdata/sf0.001", cand)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"shingle scan must semi-join-gate on candidates:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the candidate gate must broadcast:\n$plan")
  }

  test("the z-order key derivation is a zero-shuffle narrow map") {
    val s = planOf("q44_zorder_key").toString
    assert(!s.contains("Exchange"), s"key derivation must not shuffle:\n$s")
  }

  test("media dedup resolves its canonical mapping in one shuffle") {
    val s = planOf("m6_media_dedup").toString
    assert(s.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"one hash exchange (plus AQE read) is the whole cost:\n$s")
  }

  test("int8 quantization is a zero-shuffle narrow map") {
    val s = planOf("s8_int8_quantize").toString
    assert(!s.contains("Exchange"), s"quantization must not shuffle:\n$s")
  }

  test("triangle wedge enumeration and closing probe are equi-joins") {
    val s = finalPlan(planOf("p3_triangle_count")).toString
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"),
      s"degree-oriented counting must plan equi-joins only:\n$s")
  }

  test("incremental dedup admits through a (band, bucket) equi-join") {
    val s = finalPlan(planOf("d12_incremental_dedup")).toString
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"),
      s"the index probe must be an equi-join:\n$s")
  }

  test("edit-distance blocking is an equi-join, never a nested loop") {
    val s = finalPlan(planOf("d11_editdist_neardup")).toString
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"),
      s"blocking must plan as an equi-join:\n$s")
  }

  test("SRP banding retrieval joins on (band, value) — an equi-join") {
    val s = finalPlan(planOf("s7_srp_lsh")).toString
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"),
      s"band retrieval must plan as an equi-join:\n$s")
  }

  test("length bucketing is one hash aggregate — no sort, no join, " +
      "one exchange") {
    val s = planOf("t20_length_buckets").toString
    assert(s.contains("HashAggregate"), s)
    assert(!s.contains("Join") && !s.contains("Window"),
      s"bucketing needs no join or window:\n$s")
    assert(s.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"one hash exchange (plus AQE read) is the whole cost:\n$s")
  }

  test("adaptive quality gate: per-lang window stays partitioned and " +
      "the threshold join-back broadcasts") {
    val plan = finalPlan(planOf("t21_adaptive_quality_gate"))
    val s = plan.toString
    assert(!s.contains("SinglePartition"),
      s"the ranking window must stay lang-partitioned:\n$s")
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"the 5-row threshold table must broadcast back:\n$s")
  }

  test("the bloom gate probes with the codegen'd expression and keeps " +
      "the exact-candidate check an equi-join") {
    val s = finalPlan(planOf("d13_bloom_gate")).toString
    assert(s.contains("bloom_might_contain"),
      s"probe must be the native expression:\n$s")
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"),
      s"candidate check must plan as an equi-join:\n$s")
  }

  test("the bigram LM trains and scores through hash-partial aggregates " +
      "and equi-joins — no pair explosion, no global sort") {
    val plan = finalPlan(planOf("t22_bigram_lm"))
    val s = plan.toString
    assert(!s.contains("NestedLoop") && !s.contains("CartesianProduct"),
      s"count-table lookups must stay equi-joins:\n$s")
    assert(!s.contains("Sort "), s"nothing here needs a sort:\n$s")
    // the gram aggregates must combine map-side: partial_count before
    // the exchange, not a raw-row shuffle of every bigram occurrence
    assert(s.contains("partial_count"),
      s"gram counts must aggregate map-side:\n$s")
  }

  test("the PQ search scans codes with the fused ADC expression and " +
      "fetches rerank vectors through an equi-join") {
    val s = finalPlan(planOf("s9_pq_rerank")).toString
    assert(s.contains("pq_adc_distance"),
      s"ADC scan must be the native expression:\n$s")
    assert(!s.contains("CartesianProduct"),
      s"no cartesian anywhere in the PQ pipeline:\n$s")
  }

  test("t40's detect+redact pass is a zero-shuffle narrow map") {
    val s = planOf("t40_pii_redaction").toString
    assert(!s.contains("Exchange"),
      s"PII redaction must not shuffle:\n$s")
  }

  test("s17's label predicate pushes into the exact arm's parquet " +
      "scan — the filtered baseline reads only eligible rows") {
    val s = planOf("s17_filtered_ann").toString
    assert(s.contains("In(label"),
      s"label IN filter must reach a parquet scan:\n$s")
  }

  test("q79's correlated min de-correlates to a window over the " +
      "gated pair aggregate — ONE fact scan") {
    val s = planOf("q79_mincost_supplier").toString
    val factScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(factScans == 1,
      s"expected exactly one lineitem scan, found $factScans in:\n$s")
    assert(s.contains("Window"), s"per-part min must be a window:\n$s")
  }

  test("q80's global threshold joins as a ONE-row broadcast — the " +
      "per-part table re-aggregates, the fact never scans twice") {
    val s = finalPlan(planOf("q80_important_stock")).toString
    val factScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(factScans <= 2, // per-part agg + its re-aggregate lineage
      s"found $factScans lineitem scan mentions in:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin"),
      s"the one-row scalar must broadcast:\n$s")
  }

  test("s19's two rankings stay WindowGroupLimit-bounded — the " +
      "metric math never sees more than q x k rows per arm") {
    val s = planOf("s19_retrieval_metrics").toString
    assert(s.contains("WindowGroupLimit"),
      s"top-10 cuts must push the group limit:\n$s")
  }

  test("s21's distributed k-means joins every centroid table as a " +
      "broadcast and never degrades to a cartesian") {
    val plan = finalPlan(planOf("s21_kmeans_lloyd"))
    val s = plan.toString
    assert(!s.contains("CartesianProduct"),
      s"no cartesian anywhere in the Lloyd rounds:\n$s")
    val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 5,
      s"3 assigns + 2 updates + seeds should all broadcast-join, " +
        s"found ${bhj.size} in:\n$s")
  }

  test("q82's running share scans the fact ONCE — the part-sized " +
      "aggregate is materialized, so the final plan re-reads IT (an " +
      "ExistingRDD), never the fact, for its three consumers") {
    val s = finalPlan(planOf("q82_abc_inventory")).toString
    val factScans = "lineitem\\.parquet".r.findAllIn(s).size
    assert(factScans == 0,
      s"fact must only be read by the checkpointed aggregate, " +
        s"found $factScans scans in:\n$s")
    assert(s.contains("ExistingRDD"),
      s"expected the materialized part-sized aggregate in:\n$s")
  }

  test("s22's coded top-20 cut keeps the group-limit pushdown") {
    val s = planOf("s22_sq8_rerank").toString
    assert(s.contains("WindowGroupLimit"),
      s"candidate cut must push the group limit:\n$s")
  }

  test("q83's entity matching never degrades to all-pairs — every " +
      "candidate join is an equi-join on a blocking key") {
    val s = finalPlan(planOf("q83_entity_resolution")).toString
    assert(!s.contains("CartesianProduct")
        && !s.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep the self-joins equi:\n$s")
  }

  test("q84's three blocking passes (two substring + char-bag) all " +
      "stay equi-joins — the phonetic-rescue pass adds no pair scan") {
    val s = finalPlan(planOf("q84_entity_resolution_multipass")).toString
    assert(!s.contains("CartesianProduct")
        && !s.contains("BroadcastNestedLoopJoin"),
      s"multi-pass blocking must keep every self-join equi:\n$s")
  }

  test("d22's sweep plans no cartesian: the banded self-join is an " +
      "equi-join and the only nested loop is the ONE-row recall " +
      "denominator broadcast (the q80 scalar pattern)") {
    val s = finalPlan(planOf("d22_banding_sweep")).toString
    assert(!s.contains("CartesianProduct"),
      s"the (cfg, band, bh) self-join must stay equi:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin BuildRight"),
      s"the v_total scalar must join as a one-row broadcast:\n$s")
    // the verify arm's semi-join gate is inside the checkpointed
    // jaccardForPairsDf subplan — guarded directly by the shared
    // gatedShingleScan test above
  }

  test("s26's exact scan broadcasts the query block and cuts top-10 " +
      "with a WindowGroupLimit; the vote runs on q·k rows") {
    val s = planOf("s26_knn_classifier").toString
    assert(s.contains("BroadcastNestedLoopJoin"),
      s"the held-out block must broadcast over the corpus pass:\n$s")
    assert(s.contains("WindowGroupLimit"),
      s"the top-10 cut must push the group limit:\n$s")
  }

  test("t35 ships GlobalOrder's FLAT single-shuffle plan at bundled " +
      "scale — AutoSalts must not pay the salted second shuffle " +
      "where the heaviest length key fits one task") {
    val s = planOf("t35_length_curriculum").toString
    assert(!s.contains("__salt"),
      s"t35's plan carries the salted path's __salt column — " +
        s"AutoSalts escalated where flat is provably safe:\n$s")
  }

  test("s31's store scans PARTITION-PRUNE on the IVF cell: the ADC " +
      "pass reads codes (never the raw vec column) from the probed " +
      "cells' directories, and the rerank fetch carries the same " +
      "cell prune — the nprobe/k cost model is in the physical plan") {
    val s = planOf("s31_ivfpq_store").toString
    // the rerank fetch: an explicit cell IN (...) partition filter
    assert(s.contains("PartitionFilters: [cell#") ||
      s.contains("PartitionFilters: [isnotnull(cell#") ||
      ("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(s).nonEmpty),
      s"no cell partition filter reached a store scan:\n${s.take(4000)}")
    // the ADC scan's read schema must exclude the raw vec column —
    // column pruning is what makes the codes pass byte-light
    val adcScans = """ReadSchema: [^\n]*codes[^\n]*""".r
      .findAllIn(s).toList
    assert(adcScans.nonEmpty, s"no codes scan found:\n${s.take(4000)}")
    assert(adcScans.exists(sc => !sc.contains("vec:")),
      s"the ADC codes scan also reads the raw vec column — column " +
        s"pruning lost:\n$adcScans")
  }
}
