package graft

import graft.operators.SemanticDedup

/** The DataFrame-first SemanticDedup API: planted near-identical
  * vectors are retrieved, verified, and clustered; dissimilar vectors
  * never share a cluster; the candidate stage is exactly the
  * oracle-verified s7 banding on the bundled corpus.
  */
class SemanticDedupSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planted = {
    import spark.implicits._
    // 8-dim vectors: (1, 2) near-identical, (3, 4) near-identical in a
    // different direction, 5 unrelated to both
    Seq(
      (1L, Array(1.0f, 0.02f, 0.01f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(0.99f, 0.03f, 0f, 0.01f, 0f, 0f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f, 0f, 0.01f, 1.0f, 0.02f, 0f)),
      (4L, Array(0.01f, 0f, 0f, 0f, 0f, 0.98f, 0.03f, 0f)),
      (5L, Array(0f, 0.5f, 0f, -0.9f, 0f, 0f, 0f, 0.4f)))
      .toDF("vec_id", "embedding")
  }

  test("planted near-identical vectors cluster; dissimilar ones do not") {
    val comps = SemanticDedup.clusters(planted, dims = 8, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.get(1L).contains(1L) && comps.get(2L).contains(1L),
      s"pair (1,2) must cluster: $comps")
    assert(comps.get(3L).contains(3L) && comps.get(4L).contains(3L),
      s"pair (3,4) must cluster: $comps")
    assert(!comps.contains(5L), s"unrelated vector clustered: $comps")
    // verified pairs carry the exact cosine, above the floor
    val vp = SemanticDedup.verifiedPairs(planted, dims = 8, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(vp.forall(_._3 >= 0.9))
    assert(vp.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (3L, 4L)))
  }

  test("signatures are deterministic and id-column-name agnostic") {
    val a = SemanticDedup.signatures(planted, dims = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SemanticDedup.signatures(
      planted.withColumnRenamed("vec_id", "pk")
        .withColumnRenamed("embedding", "v"),
      idCol = "pk", vecCol = "v", dims = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.size == 5)
  }

  test("candidate stage matches the oracle-verified s7 banding " +
      "on the bundled corpus") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val api = SemanticDedup.candidatePairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val s7 = SparkEntry.queries("s7_srp_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(api == s7)
  }

  test("a dims mismatch fails the job instead of degenerating to " +
      "all-zero signatures") {
    val e = intercept[Exception] {
      SemanticDedup.signatures(planted, dims = 64).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("expected 64-dimension")),
      s"wrong error: $e")
  }

  test("misuse fails fast") {
    intercept[IllegalArgumentException] {
      SemanticDedup.candidatePairs(planted, dims = 8, maxHamming = 40)
    }
    intercept[IllegalArgumentException] {
      SemanticDedup.verifiedPairs(planted, dims = 8, minCosine = 2.0)
    }
    intercept[IllegalArgumentException] {
      SemanticDedup.signatures(planted, dims = 0)
    }
  }
}
