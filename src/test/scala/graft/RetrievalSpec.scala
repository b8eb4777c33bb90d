package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Semantics of the retrieval post-processing algebra on planted
  * fixtures — the properties the s15/s16 oracles exercise only
  * statistically are pinned here deterministically: RRF's
  * missing-ranker zero, the both-lists advantage, and MMR actually
  * skipping a near-clone in favor of a diverse pick.
  */
class RetrievalSpec extends SparkSpecBase {

  import spark.implicits._

  test("rankTopK cuts to exactly k per query with (sim desc, n_id) " +
      "total order — ties break toward the smaller id") {
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.8), (1L, 13L, 0.7),
      (2L, 20L, 0.5), (2L, 21L, 0.6)
    ).toDF("q_id", "n_id", "sim")
    val cut = Retrieval.rankTopK(scored, col("sim"), 2, "rank")
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cut == Set((1L, 10L, 1L), (1L, 11L, 2L),
      (2L, 21L, 1L), (2L, 20L, 2L)))
  }

  test("rrfFuse: a candidate present in BOTH lists outranks a " +
      "single-list candidate of equal rank, and the missing ranker " +
      "contributes exactly zero") {
    // list A: x rank 1, y rank 2; list B: y rank 1, z rank 2
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L))
      .toDF("q_id", "n_id", "rank_a")
    val b = Seq((1L, 101L, 1L), (1L, 102L, 2L))
      .toDF("q_id", "n_id", "rank_b")
    val fused = Retrieval.rrfFuse(a, b, "rank_a", "rank_b", 60, 3)
      .select("q_id", "n_id", "fused_rank", "rrf_ppm").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // y: 1e6/62 + 1e6/61 = 16129 + 16393; x: 1e6/61; z: 1e6/62
    assert(fused == Set((101L, 1L, 16129L + 16393L),
      (100L, 2L, 16393L), (102L, 3L, 16129L)))
  }

  test("mmrDiversify skips a near-clone of the first pick in favor " +
      "of a diverse lower-relevance candidate") {
    // A top relevance; B a near-clone of A (pair sim ~1); C diverse.
    // 7·rel − 3·pen: B scores 7·900000 − 3·999999 = 3300003,
    // C scores 7·500000 − 0 = 3500000 → round 2 must pick C.
    val pool = Seq(
      (1L, 1L, 1000000L), (1L, 2L, 900000L), (1L, 3L, 500000L)
    ).toDF("q_id", "n_id", "rel_ppm")
    val pairs = Seq(
      (1L, 1L, 2L, 999999L), (1L, 2L, 1L, 999999L),
      (1L, 1L, 3L, 0L), (1L, 3L, 1L, 0L),
      (1L, 2L, 3L, 0L), (1L, 3L, 2L, 0L)
    ).toDF("q_id", "a_id", "b_id", "pair_ppm")
    val picks = Retrieval.mmrDiversify(pool, pairs, 3, 7, 3)
      .orderBy("mmr_rank").select("n_id", "mmr_score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(picks.map(_._1) == Seq(1L, 3L, 2L),
      s"expected diverse pick order A,C,B — got $picks")
    assert(picks(0)._2 == 7000000L)
    assert(picks(1)._2 == 3500000L)
    // B's final score penalized by its max pair sim to {A, C} = A
    assert(picks(2)._2 == 7L * 900000L - 3L * 999999L)
  }

  test("mmrDiversify keeps a candidate with NO pair rows in " +
      "contention at the textbook zero penalty — an incomplete pairs " +
      "table must not silently drop it") {
    // B is a clone of A; C has no pair rows at all. Round 2 must
    // still consider C (penalty 0) and pick it over the penalized B.
    val pool = Seq(
      (1L, 1L, 1000000L), (1L, 2L, 900000L), (1L, 3L, 500000L)
    ).toDF("q_id", "n_id", "rel_ppm")
    val pairs = Seq(
      (1L, 1L, 2L, 999999L), (1L, 2L, 1L, 999999L)
    ).toDF("q_id", "a_id", "b_id", "pair_ppm")
    val picks = Retrieval.mmrDiversify(pool, pairs, 2, 7, 3)
      .orderBy("mmr_rank").select("n_id", "mmr_score").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(picks.map(_._1) == Seq(1L, 3L),
      s"C must survive with zero penalty — got $picks")
    assert(picks(1)._2 == 3500000L)
  }

  test("mmrDiversify with a zero diversity weight degenerates to " +
      "the pure relevance order — the λ=1 boundary") {
    val pool = Seq(
      (1L, 1L, 300L), (1L, 2L, 200L), (1L, 3L, 100L)
    ).toDF("q_id", "n_id", "rel_ppm")
    val pairs = Seq(
      (1L, 1L, 2L, 1000000L), (1L, 2L, 1L, 1000000L),
      (1L, 1L, 3L, 1000000L), (1L, 3L, 1L, 1000000L),
      (1L, 2L, 3L, 1000000L), (1L, 3L, 2L, 1000000L)
    ).toDF("q_id", "a_id", "b_id", "pair_ppm")
    val picks = Retrieval.mmrDiversify(pool, pairs, 3, 1, 0)
      .orderBy("mmr_rank").select("n_id").as[Long].collect().toSeq
    assert(picks == Seq(1L, 2L, 3L))
  }
}
