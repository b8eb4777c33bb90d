package graft

import graft.streaming.StreamingKMeans

/** Online k-means: hand-computed fold arithmetic, decay-invariant
  * centroids for starving clusters, batch-operator tie discipline in
  * assignment, drift tracking across waves, and purity (same model +
  * same batch → same model).
  */
class StreamingKMeansSpec extends SparkSpecBase {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val session = spark
    import session.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  // seeds at (0,0) and (10,10) in millis
  private def freshModel = StreamingKMeans.seed(
    Seq(Seq(0L, 0L), Seq(10000L, 10000L)))

  test("one batch folds with hand-computed integer arithmetic") {
    val m1 = StreamingKMeans.updateBatch(freshModel,
      vecs(1L -> Seq(1f, 1f), 2L -> Seq(9f, 9f)))
    // assignment: (1,1)->c0, (9,9)->c1; decay halves seed state
    // (sums 0>>1=0 resp 10000>>1=5000, weights 1>>1=0), then folds
    assert(m1.sums == Vector(Vector(1000L, 1000L),
      Vector(5000L + 9000L, 5000L + 9000L)))
    assert(m1.weights == Vector(1L, 1L))
    assert(m1.centroids == Vector(Vector(1000L, 1000L),
      Vector(14000L, 14000L)))
  }

  test("a starving cluster's centroid is decay-invariant until its " +
      "weight floors to zero, then reports the origin") {
    var m = StreamingKMeans.updateBatch(freshModel,
      vecs(1L -> Seq(1f, 1f), 2L -> Seq(9f, 9f)))
    // cluster 1 never sees data again
    m = StreamingKMeans.updateBatch(m, vecs(3L -> Seq(1f, 1f)))
    // c1: sums 14000>>1=7000, weight 1>>1=0 -> origin signal
    assert(m.weights(1) == 0L)
    assert(m.centroids(1) == Vector(0L, 0L))
    // c0 is live and exact: sums (1000>>1)+1000, weight (1>>1)+1
    assert(m.centroids(0) == Vector(1500L, 1500L))
  }

  test("drift tracking: a stream whose second mode moves pulls its " +
      "centroid toward the new data with half-life weighting") {
    var m = freshModel
    m = StreamingKMeans.updateBatch(m,
      vecs((1L to 4L).map(i => i -> Seq(10f, 10f)): _*))
    m = StreamingKMeans.updateBatch(m,
      vecs((5L to 8L).map(i => i -> Seq(12f, 12f)): _*))
    // c1 after wave 1: sums (10000>>1)+40000=45000, w (1>>1)+4=4
    //   -> centroid 11250
    // after wave 2: sums (45000>>1)+48000=70500, w (4>>1)+4=6
    //   -> centroid 11750 — between the modes, biased to the new one
    assert(m.centroids(1) == Vector(11750L, 11750L))
    assert(m.weights(1) == 6L)
  }

  test("assignment ties go to the lowest cid — the batch operator's " +
      "rule carried over") {
    // (5,5) millis 5000 equidistant from seeds (0,0)/(10000,10000)
    val m = StreamingKMeans.updateBatch(freshModel,
      vecs(1L -> Seq(5f, 5f)))
    assert(m.weights == Vector(1L, 0L),
      s"tie must fold into cluster 0: ${m.weights}")
  }

  test("updateBatch is pure: same model + same batch => same model") {
    val b = vecs(1L -> Seq(2f, 3f), 2L -> Seq(8f, 7f))
    val m1 = StreamingKMeans.updateBatch(freshModel, b)
    val m2 = StreamingKMeans.updateBatch(freshModel, b)
    assert(m1 == m2)
  }
}
