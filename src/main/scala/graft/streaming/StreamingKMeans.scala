package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online (streaming) k-means — the micro-batch companion of the
  * batch [[graft.operators.KMeans]]: a clustering that TRACKS a
  * drifting stream (topic drift in a crawl, shifting embedding
  * distributions) instead of re-fitting from scratch. The design is
  * the classic streaming-k-means one: the MODEL (k × dim sums and
  * counts) is driver-held — it is KB-sized by construction, the one
  * piece of state that is legal off-cluster — while every per-batch
  * step (assignment against the broadcast current centroids, the
  * per-cluster coordinate sums) is a distributed aggregate identical
  * in shape to the batch operator's rounds. Each micro-batch:
  *
  *   1. assign batch vectors to the nearest current centroid
  *      (broadcast k×d table, exact integer-milli distances,
  *      ties → lowest cid — the batch operator's rule);
  *   2. per-cluster (sum, count) aggregate (ONE shuffle of
  *      cluster-sized rows);
  *   3. decay the model's accumulated (sum, count) by the half-life
  *      factor and fold the batch in: sums halve with exact integer
  *      floor-halving (negative-safe: >> is floor division by 2 for
  *      longs), so the update is bit-deterministic and a spec can
  *      hand-compute it — no float EMA drift.
  *
  * Centroids are floor(sum/weight) per the batch operator's exactness
  * argument — and because decay halves sums and weight by the SAME
  * factor, a cluster that receives no data keeps its centroid
  * essentially unchanged (the ratio is decay-invariant up to the
  * integer floor) while its influence on future folds shrinks. Only
  * when the integer weight floors to 0 is the ratio undefined; the
  * model then reports the origin for that cluster — the documented
  * dying-cluster signal; re-seed from the batch operator's fit when
  * that matters.
  *
  * Drive it from foreachBatch (the FlightPipelineDemo micro-batch
  * pattern): `model = StreamingKMeans.updateBatch(model, batchDf)`.
  * updateBatch is PURE (model in, model out) — restart safety is the
  * caller persisting the model beside its checkpoint, and replaying a
  * batch replays the identical arithmetic.
  */
object StreamingKMeans {

  /** Driver-held model: per cluster, per dimension, the decayed
    * integer-milli coordinate sums and the decayed weight. KB-sized:
    * k × dim longs.
    */
  case class Model(k: Int, dim: Int,
      sums: Vector[Vector[Long]], weights: Vector[Long]) {
    /** Current centroids as floor(sum/weight); frozen (zero) weight
      * yields the origin-frozen centroid the scaladoc documents.
      */
    def centroids: Vector[Vector[Long]] =
      sums.zip(weights).map { case (s, w) =>
        if (w <= 0L) s.map(_ => 0L)
        else s.map(v => Math.floorDiv(v, w))
      }
  }

  /** Seed a model from explicit integer-milli centroids, each with
    * weight 1 (so the first batch dominates but division is defined).
    */
  def seed(centroids: Seq[Seq[Long]]): Model = {
    require(centroids.nonEmpty, "StreamingKMeans: need >= 1 centroid")
    val dim = centroids.head.size
    require(centroids.forall(_.size == dim), "ragged centroids")
    Model(centroids.size, dim,
      centroids.map(_.toVector).toVector,
      Vector.fill(centroids.size)(1L))
  }

  /** One micro-batch update: assign `batch` (vec_id, embedding) to
    * the model's current centroids, aggregate per-cluster sums
    * distributedly, then decay-and-fold on the driver. Pure.
    */
  def updateBatch(model: Model, batch: DataFrame): Model = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cent = model.centroids.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (v, j) => (cid.toLong, j, v) }
    }.toDF("cid", "j", "cj")
    val xq = graft.operators.KMeans.coords(batch)
    val asg = graft.operators.KMeans.assign(xq, cent)
    // per-(cid, j) batch sums + per-cid counts — cluster-sized rows
    val agg = xq.join(asg.select("vec_id", "cid"), Seq("vec_id"))
      .groupBy(col("cid"), col("j"))
      .agg(sum("xq").as("sj"), count(lit(1)).as("n"))
      .collect() // k × dim rows — the KB-sized model update
    val batchSums = Array.fill(model.k, model.dim)(0L)
    val batchN = Array.fill(model.k)(0L)
    agg.foreach { r =>
      val (cid, j) = (r.getLong(0).toInt, r.getInt(1))
      batchSums(cid)(j) = r.getLong(2)
      batchN(cid) = r.getLong(3)
    }
    // half-life decay: halve the accumulated state (exact integer
    // floor-halving), then fold the batch in
    Model(model.k, model.dim,
      Vector.tabulate(model.k)(c => Vector.tabulate(model.dim)(j =>
        (model.sums(c)(j) >> 1) + batchSums(c)(j))),
      Vector.tabulate(model.k)(c => (model.weights(c) >> 1) + batchN(c)))
  }
}
