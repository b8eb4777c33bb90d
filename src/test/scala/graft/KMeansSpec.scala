package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means: hand-computed fixture, the lowest-cid
  * tie rule (it changes downstream memberships, so it must be pinned),
  * seed selection on non-contiguous ids, and run-to-run determinism.
  */
class KMeansSpec extends SparkSpecBase {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val session = spark
    import session.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("two clear clusters converge to the hand-computed assignment " +
      "and exact integer inertia") {
    val df = vecs(
      0L -> Seq(0f, 0f), 1L -> Seq(10f, 10f),
      2L -> Seq(1f, 0f), 3L -> Seq(0f, 1f),
      4L -> Seq(9f, 10f), 5L -> Seq(10f, 9f))
    val asg = KMeans.fit(df, k = 2, rounds = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(asg.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(Seq(0L, 2L, 3L).forall(asg(_)._1 == 0L))
    assert(Seq(1L, 4L, 5L).forall(asg(_)._1 == 1L))
    // centroids after either update: c0 = (333, 333) millis (floor of
    // 1000/3), c1 = (9666, 9666) (floor of 29000/3); d2 is the exact
    // integer squared distance to them.
    assert(asg(0L)._2 == 333L * 333 * 2)
    assert(asg(2L)._2 == 667L * 667 + 333L * 333)
    assert(asg(1L)._2 == 334L * 334 * 2)
    assert(asg(4L)._2 == 666L * 666 + 334L * 334)
  }

  test("distance ties assign to the LOWEST centroid id — pinned " +
      "because it changes downstream memberships") {
    // v2 = (1,1) is exactly equidistant from the seeds (0,0) and
    // (2,2). Tie -> cid 0, so the round-1 update pulls c0 to
    // (500, 500) and v2 stays with it; the opposite rule would end
    // with v2 in cluster 1.
    val df = vecs(
      0L -> Seq(0f, 0f), 1L -> Seq(2f, 2f), 2L -> Seq(1f, 1f))
    val asg = KMeans.fit(df, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg(2L) == 0L, s"tie must go to the lowest cid: $asg")
    assert(asg(0L) == 0L && asg(1L) == 1L)
  }

  test("seeds are the k lowest vec_ids even when ids are sparse") {
    val df = vecs(
      9L -> Seq(0f, 0f), 5L -> Seq(10f, 10f), 7L -> Seq(0f, 1f))
    val cids = KMeans.fit(df, k = 2, rounds = 1).select("cid")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(cids == Set(5L, 7L), s"seed cids must be the lowest ids: $cids")
  }

  test("fit is deterministic run-to-run on real fixture data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run() = KMeans.fit(emb, k = 8, rounds = 2)
      .orderBy("vec_id").collect().toSeq
    assert(run() == run())
  }

  test("every vector is assigned exactly once and clusters are " +
      "non-degenerate on the fixture corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val asg = KMeans.fit(emb, k = 8, rounds = 2)
    assert(asg.count() == emb.count())
    assert(asg.select("vec_id").distinct().count() == emb.count())
    assert(asg.select("cid").distinct().count() >= 4)
  }
}
