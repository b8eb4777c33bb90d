package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval post-processing: per-query rank cuts,
  * Reciprocal-Rank Fusion (Cormack et al.), and Maximal Marginal
  * Relevance diversification (Carbonell & Goldstein) — the three
  * list-algebra steps every multi-ranker retrieval stack composes
  * after its ANN/lexical arms produce candidates.
  *
  * Library contract shared by all three (and what makes them
  * oracle-hashable): candidate lists are frames keyed by
  * (`q_id`, `n_id`), every score that gets COMPARED is an integer
  * (ppm quantization happens before any ordering decision), and
  * every cut is (score desc, n_id) total-ordered — so the exact
  * output, not just its quality, is reproducible on any engine.
  *
  * Scale shape: these operators never touch the corpus — inputs are
  * per-query candidate lists (q·k rows), pair tables (q·k² rows),
  * and every step is a per-query window or equi-join. The ranker
  * passes that PRODUCE the candidates are the 100 TB cost; this
  * algebra is corpus-size-independent.
  */
object Retrieval {

  /** Cut a scored candidate frame to the per-query top-`k` by
    * (`sim` desc, `n_id`), emitting long rank column `rankName`.
    * The filter-on-row_number shape plans as WindowGroupLimit —
    * partition-local top-k heaps, never a full per-query sort.
    */
  def rankTopK(scored: DataFrame, sim: Column, k: Int,
      rankName: String): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(sim.desc, col("n_id"))
    scored
      .withColumn(rankName, row_number().over(w).cast("long"))
      .filter(col(rankName) <= k)
  }

  /** Reciprocal-Rank Fusion of two ranked lists: full-outer join on
    * (q_id, n_id), fused score Σ 1000000 div (`k0` + rank) with a
    * ranker contributing 0 where the candidate missed its list
    * (the standard RRF treatment), cut to the per-query top
    * `topK` as `fused_rank`. Contributions are integer ppm, so no
    * float summation order exists anywhere in the fusion.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, rankA: String,
      rankB: String, k0: Int, topK: Int): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(col("rrf_ppm").desc, col("n_id"))
    a.join(b, Seq("q_id", "n_id"), "full")
      .withColumn("rrf_ppm",
        expr(s"""coalesce(1000000L div (${k0}L + $rankA), 0L)
              + coalesce(1000000L div (${k0}L + $rankB), 0L)"""))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
  }

  /** Greedy MMR diversification: from `pool` (q_id, n_id, rel_ppm)
    * pick `k` items per query maximizing
    * `lamNum`·rel_ppm − `lamDen`·max-pair-sim-to-already-picked,
    * where `pairs` (q_id, a_id, b_id, pair_ppm) carries the
    * candidate-pair similarities (callers build it from the pool —
    * q·|pool|² rows, corpus-independent). Output: (q_id, n_id,
    * mmr_rank 1..k, mmr_score).
    *
    * The greedy trace is inherently sequential in k but each round
    * is fully distributed: an anti-join to drop picked items, a
    * broadcast-sized aggregate for the penalty, and a per-query
    * window argmax over ≤|pool| rows — no driver-side selection.
    * Each round localCheckpoints the (q·round)-row selection so the
    * unrolled plan stays linear in k rather than exponential.
    * Round 1 is the pure-relevance argmax (MMR's base case).
    */
  def mmrDiversify(pool: DataFrame, pairs: DataFrame, k: Int,
      lamNum: Int, lamDen: Int): DataFrame = {
    val rel = pool.select(col("q_id"), col("n_id"), col("rel_ppm"))
    val w1 = Window.partitionBy("q_id")
      .orderBy(col("rel_ppm").desc, col("n_id"))
    var selected = rel
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("n_id"), lit(1L).as("mmr_rank"),
        (col("rel_ppm") * lamNum).as("mmr_score"))
      .localCheckpoint()
    for (round <- 2 to k) {
      val pen = pairs
        .join(selected.select(col("q_id"), col("n_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy(col("q_id"), col("a_id"))
        .agg(max(col("pair_ppm")).as("pen_ppm"))
        .withColumnRenamed("a_id", "n_id")
      val wk = Window.partitionBy("q_id")
        .orderBy(col("mmr_score").desc, col("n_id"))
      // LEFT join + coalesce 0: a candidate with NO pair row to any
      // selected item takes the textbook zero penalty — an
      // incompletely-built pairs table must not silently DROP
      // candidates from contention (the inner-join footgun)
      val next = rel
        .join(selected.select(col("q_id"), col("n_id")),
          Seq("q_id", "n_id"), "left_anti")
        .join(pen, Seq("q_id", "n_id"), "left")
        .withColumn("mmr_score",
          col("rel_ppm") * lamNum
            - coalesce(col("pen_ppm"), lit(0L)) * lamDen)
        .withColumn("rn", row_number().over(wk))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("n_id"),
          lit(round.toLong).as("mmr_rank"), col("mmr_score"))
      selected = selected.unionByName(next).localCheckpoint()
    }
    selected
  }
}
