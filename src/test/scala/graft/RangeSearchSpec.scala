package graft

import org.apache.spark.sql.functions._

/** s13's prefix-bound prune: the Cauchy-Schwarz upper bound must be
  * SOUND (the pruned range search returns exactly the brute-force
  * rows — this is what lets s13 ship without a recall contract) and
  * USEFUL (it actually skips a meaningful share of full-cosine
  * evaluations on the bundled corpus).
  */
class RangeSearchSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.35

  private def pairs = {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    broadcast(q).crossJoin(c).filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
  }

  test("the pruned range search equals the unpruned brute force " +
      "row-for-row (bound soundness)") {
    val pruned = SparkEntry.queries("s13_range_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val brute = pairs.filter(col("sim") >= tau)
      .select(col("q_id"), col("n_id"), round(col("sim"), 6).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(brute.nonEmpty, "tau too high for this corpus — test is vacuous")
    assert(pruned == brute)
  }

  test("the bound prunes a meaningful share of full-cosine " +
      "evaluations at tau on this corpus") {
    val withBound = pairs
      .withColumn("qp", expr("slice(qv, 1, 32)"))
      .withColumn("np", expr("slice(nv, 1, 32)"))
      .withColumn("psim", graft.functions.VectorExprs
        .cosine_similarity(col("qp"), col("np")))
      .withColumn("qpn", sqrt(expr("aggregate(slice(qv, 1, 32), 0D," +
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .withColumn("qtn", sqrt(expr("aggregate(slice(qv, 33, 32), 0D," +
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .withColumn("qfn", sqrt(expr("aggregate(qv, 0D," +
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .withColumn("npn", sqrt(expr("aggregate(slice(nv, 1, 32), 0D," +
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .withColumn("ntn", sqrt(expr("aggregate(slice(nv, 33, 32), 0D," +
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .withColumn("nfn", sqrt(expr("aggregate(nv, 0D," +
        " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")))
      .withColumn("ub", (col("psim") * col("qpn") * col("npn") +
        col("qtn") * col("ntn")) / (col("qfn") * col("nfn")))
    // soundness per pair: ub must never sit below sim (beyond slack)
    val violations = withBound
      .filter(col("ub") < col("sim") - lit(1e-9)).count()
    assert(violations == 0L, s"$violations pairs had ub < sim")
    val total = withBound.count()
    // At τ=0.35 on near-orthogonal random embeddings the tail term
    // |q_T||n_T|/(|q||n|) ≈ 0.5 floors the bound, so only
    // anti-correlated prefixes prune (measured ~10% here) — the
    // bound's slack IS the data's orthogonality, not a bug.
    val atTau = withBound.filter(col("ub") < tau - 1e-9).count()
    assert(atTau > total / 20,
      s"bound pruned only $atTau of $total at tau=$tau")
    // The regime range search actually runs at scale is near-dup
    // retrieval (τ ≥ 0.9) — there the same bound must prune almost
    // the entire corpus before any full cosine is evaluated.
    val atNearDup = withBound.filter(col("ub") < 0.9 - 1e-9).count()
    assert(atNearDup > (total * 95) / 100,
      s"bound pruned only $atNearDup of $total at tau=0.9")
  }
}
