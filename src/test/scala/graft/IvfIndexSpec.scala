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

  private def ivfTopK(k: Int, nprobe: Int, topk: Int): DataFrame = {
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = k, iters = 3)
    val index = IvfIndex.assign(
      emb.select(col("vec_id").as("n_id"), col("embedding").as("nv")),
      "nv", model)
    val queries = IvfIndex.probe(
      emb.filter(col("vec_id") < 10)
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

  private def exactTopK(topk: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select("q_id", "n_id")
  }

  private def recallAt5(nprobe: Int): Double = {
    val ivf = ivfTopK(k = 8, nprobe = nprobe, topk = 5).select("q_id", "n_id")
    val exact = exactTopK(5)
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
