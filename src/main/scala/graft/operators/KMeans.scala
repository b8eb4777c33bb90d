package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fully distributed Lloyd k-means over integer-quantized vectors —
  * the semantic-clustering step LLM curation pipelines run between
  * embedding and SemDedup/curriculum (cluster-then-prune à la
  * SemDeDup, cluster-balanced sampling), expressed so EVERY phase is
  * a Spark aggregate:
  *
  *   - assign: exploded (vec_id, j, xq) ⋈ broadcast k×d centroid
  *     table on the dimension key, one map-side-combinable
  *     (vec_id, cid) sum for the squared distance, then a
  *     min-of-struct argmin per vector (ties → lowest cid) — another
  *     map-side-combinable aggregate, never a window;
  *   - update: assignment ⋈ exploded coords on vec_id (the only
  *     data-sized shuffle per round), per-(cid, j) sums, centroid =
  *     floor(sum / n).
  *
  * Contrast with [[IvfIndex]]'s trainer: that one k-means runs on a
  * sample-capped driver collect because IVF only needs APPROXIMATE
  * cells; this operator is for when the CLUSTERING ITSELF is the
  * product (per-cluster pruning budgets, balanced mixtures), so it
  * must see every row — and therefore never collects.
  *
  * Exactness discipline (the s20 rules): coordinates quantize to
  * integer MILLIS before any arithmetic, so distances are exact
  * int64 sums with no summation-order drift; the centroid mean is a
  * double-floor of an integer ratio whose quotient sits ≥ 1/n from
  * any integer — ~1e9× the double ulp at the magnitudes involved —
  * so Spark and an independent SQL replay agree bit-for-bit.
  * Determinism: seeds are the k lowest vec_ids' vectors (no RNG —
  * scripts can't use one, and the oracle must replay the run), and
  * distance ties assign to the lowest centroid id.
  *
  * 100 TB shape: the k×d centroid relation (k clusters × 64 dims) is
  * KB-sized and broadcast every round; per round the corpus shuffles
  * once on vec_id (update) plus the n·k·d-row assign expansion that
  * partial aggregation collapses map-side to n·k before any exchange.
  * Rounds are fixed (a pipeline hyperparameter), not convergence-
  * polled — no driver-side loop state beyond the plan itself.
  */
object KMeans {

  private val floorDiv =
    "CAST(floor(CAST(%s AS DOUBLE) / CAST(%s AS DOUBLE)) AS BIGINT)"

  /** Exploded integer-milli coordinates: (vec_id, j, xq). */
  private[graft] def coords(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("j", "x")))
      .select(col("vec_id"), col("j"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000D + 0.5D) AS BIGINT)")
          .as("xq"))

  /** One assignment pass: per vector, the centroid minimizing the
    * exact integer squared distance (ties → lowest cid).
    * Returns (vec_id, cid, d2).
    */
  private[graft] def assign(xq: DataFrame, cent: DataFrame): DataFrame =
    xq.join(broadcast(cent.select("cid", "j", "cj")), Seq("j"))
      .withColumn("t2", (col("xq") - col("cj")) * (col("xq") - col("cj")))
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum("t2").as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))

  /** One update pass: per-(cid, j) floored integer means. */
  private[graft] def update(xq: DataFrame, asg: DataFrame): DataFrame =
    xq.join(asg.select("vec_id", "cid"), Seq("vec_id"))
      .groupBy(col("cid"), col("j"))
      .agg(sum("xq").as("sj"), count(lit(1)).as("n"))
      .select(col("cid"), col("j"),
        expr(floorDiv.format("sj", "n")).as("cj"))

  /** `rounds` Lloyd iterations from the k-lowest-vec_id seeds; returns
    * the FINAL assignment (vec_id, cid, d2) against the last updated
    * centroids — d2 is each vector's exact integer-milli² residual,
    * so Σd2 per cid is the cluster inertia.
    *
    * DYING CLUSTERS (the [[StreamingKMeans]] caveat, batch edition):
    * `update` emits rows only for clusters that hold ≥ 1 member, so a
    * centroid that loses every member DISAPPEARS and k shrinks
    * silently for the remaining rounds — standard Lloyd behavior for
    * this formulation, acceptable here because the product is the
    * ASSIGNMENT (every vector still gets its nearest live centroid),
    * not a fixed-k codebook. Likewise, an input with fewer than k
    * rows seeds only row-count centroids. Callers that need exactly
    * k live cells (codebook training) should use [[IvfIndex.train]],
    * whose sampled trainer reseeds; callers here can detect shrink
    * from the output (`countDistinct(cid) < k`) and refit with
    * different k.
    */
  def fit(vecs: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"KMeans.fit: k must be >= 1, got $k")
    require(rounds >= 1, "KMeans.fit: need at least one round")
    val xq = coords(vecs)
    val seedIds = vecs.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(k)
    val c0 = xq.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("vec_id").as("cid"), col("j"), col("xq").as("cj"))
    val cFinal = (1 to rounds).foldLeft(c0) { (c, _) =>
      update(xq, assign(xq, c))
    }
    assign(xq, cFinal)
  }
}
