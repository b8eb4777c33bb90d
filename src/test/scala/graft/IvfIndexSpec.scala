package graft

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF index: deterministic training, total assignment, probe-join
  * search whose plan broadcasts the query side, and recall against the
  * exact brute force — the meaningful correctness measure for an ANN.
  */
class IvfIndexSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private val cosine = graft.functions.VectorExprs
    .cosine_similarity(col("qv"), col("nv"))

  test("training is deterministic run-to-run") {
    val m1 = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 3)
    val m2 = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(m1.k == 8 && m1.dim == 64)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }

  test("assignment is total and in range; every vector lands in exactly one cell") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 3)
    val assigned = IvfIndex.assign(emb, "embedding", model)
    assert(assigned.count() == emb.count())
    val cells = assigned.groupBy("cell").count().collect()
    assert(cells.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    // Lloyd iterations should leave no trivially degenerate clustering.
    assert(cells.length >= 4, cells.mkString(","))
  }

  test("probe and normalization never clobber caller columns named " +
      "like their temporaries") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8, iters = 1)
    val withClash = emb.limit(5)
      .withColumn("__cells", lit("mine"))
      .withColumn("__unorm", lit(7))
    val out = IvfIndex.probe(withClash, "embedding", model, nprobe = 2)
    assert(out.columns.contains("__cells") && out.columns.contains("__unorm"))
    val r = out.select("__cells", "__unorm").head()
    assert(r.getString(0) == "mine" && r.getInt(1) == 7)
  }

  private def ivfTopK(
      k: Int, nprobe: Int, topk: Int,
      corpus: DataFrame = emb, nQueries: Int = 10): DataFrame = {
    val model = IvfIndex.train(corpus, "vec_id", "embedding", k = k, iters = 3)
    val index = IvfIndex.assign(
      corpus.select(col("vec_id").as("n_id"), col("embedding").as("nv")),
      "nv", model)
    val queries = IvfIndex.probe(
      corpus.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      "qv", model, nprobe)
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    broadcast(queries).join(index, col("probe_cell") === col("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select("q_id", "n_id", "rank")
  }

  private def exactTopK(
      topk: Int, corpus: DataFrame = emb, nQueries: Int = 10): DataFrame = {
    val q = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select("q_id", "n_id")
  }

  private def recallAt5(
      nprobe: Int, k: Int = 8,
      corpus: DataFrame = emb, nQueries: Int = 10): Double = {
    val ivf = ivfTopK(k, nprobe, topk = 5, corpus, nQueries)
      .select("q_id", "n_id")
    val exact = exactTopK(5, corpus, nQueries)
    ivf.intersect(exact).count().toDouble / exact.count()
  }

  test("recall@5 beats the probe budget's chance floor, and grows with nprobe") {
    // This corpus is nearly unstructured (labels carry no neighborhood
    // signal; pairwise cosines ≈ 0), so probing 2 of 8 cells gives a
    // chance recall of ~0.25 — the information-theoretic budget. The
    // trained cells deliver ≈0.52 (deterministic training → stable):
    // the index concentrates true neighbors ~2× over chance even with
    // no cluster structure to find.
    val r2 = recallAt5(nprobe = 2)
    assert(r2 >= 0.45, s"recall@5(nprobe=2) = $r2")
    assert(r2 >= 2 * (2.0 / 8) * 0.8, s"should beat chance clearly: $r2")
    // Probe sets are nested (sorted-distance prefixes), so candidate
    // sets grow with nprobe and aggregate recall is monotone.
    val r4 = recallAt5(nprobe = 4)
    assert(r4 >= r2, s"recall must not drop with a larger probe: $r4 < $r2")
  }

  // Planted-cluster fixture: 16 well-separated spherical clusters of 64
  // members each (Gaussian noise around random unit centers, re-normalized).
  // Unlike the near-random synthetic corpus above, true neighbors here
  // CO-LOCATE — this is the fixture where an IVF index should shine, and
  // the recall number that actually characterizes it.
  private lazy val planted: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 32
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(16)(
      normalize(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val rows = for (c <- 0 until 16; j <- 0 until 64) yield {
      val noisy = centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      ((c * 64 + j).toLong, normalize(noisy))
    }
    // queries must span several planted clusters: ids 0..9 would all sit
    // in cluster 0, so spread query ids across clusters via a shuffle of
    // the id space (deterministic seed)
    val shuffled = rnd.shuffle(rows.toVector)
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    shuffled.toDF("vec_id", "embedding")
  }

  test("recall@5 on planted clusters is near-perfect at a 2/16 probe budget") {
    // chance recall at nprobe=2 of k=16 is ~0.125; structure should
    // push it close to 1.0 — k-means recovers the planted cells and
    // each query's true neighbors live in its own cell.
    val r = recallAt5(nprobe = 2, k = 16, corpus = planted, nQueries = 20)
    assert(r >= 0.85, s"recall@5 on structured data = $r — the index is " +
      "not recovering planted neighborhoods")
  }

  test("probing more cells is monotonically better, full probe = exact") {
    val exact = exactTopK(5)
    val full = ivfTopK(k = 8, nprobe = 8, topk = 5).select("q_id", "n_id")
    assert(full.intersect(exact).count() == exact.count(),
      "nprobe=k must recover the exact result")
  }

  test("search plan broadcasts the probed query side; index is never shuffled") {
    val p = ivfTopK(k = 8, nprobe = 2, topk = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
