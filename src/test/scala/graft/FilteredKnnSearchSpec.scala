package graft

import graft.operators.KnnBeam
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Predicate-constrained beam search (searchFiltered): every result
  * satisfies the predicate, recall holds against the exact FILTERED
  * top-k even though the navigation beam traverses non-qualifying
  * nodes (the unfiltered graph must still route to filtered targets),
  * and the unfiltered search is the pred=true degenerate case.
  */
class FilteredKnnSearchSpec extends SparkSpecBase {

  private val cosine = graft.functions.VectorExprs
    .cosine_similarity(col("qv"), col("nv"))

  // KnnBeamSpec's planted fixture: 16 separated clusters × 64 members
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
    val shuffled = rnd.shuffle(rows.toVector)
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    shuffled.toDF("vec_id", "embedding").localCheckpoint(true)
  }

  private def exactFiltered(
      corpus: DataFrame, pred: org.apache.spark.sql.Column,
      topk: Int, nQueries: Int): DataFrame = {
    val q = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = corpus.filter(pred)
      .select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select("q_id", "n_id")
  }

  test("every filtered-search result satisfies the predicate, and " +
      "recall vs the filtered exact top-5 holds on planted clusters " +
      "even though only half the corpus qualifies") {
    val pred = col("vec_id") % 2 === 0
    val graph = KnnBeam.buildGraph(planted, dims = 32)
      .localCheckpoint(true)
    val qs = planted.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val entry = KnnBeam.seeds(planted, seedCount = 64)
    val got = KnnBeam.searchFiltered(graph, planted, qs, entry, pred,
        beam = 24, rounds = 4, topK = 5)
      .localCheckpoint(true)
    // predicate purity: no odd id may appear
    assert(got.filter(col("n_id") % 2 =!= 0).count() == 0L,
      "a non-qualifying node reached the filtered result")
    assert(got.groupBy("q_id").count()
      .filter(col("count") =!= 5L).count() == 0L,
      "a query returned fewer than topK qualifying results")
    val exact = exactFiltered(planted, pred, 5, 10)
      .localCheckpoint(true)
    val hits = got.select("q_id", "n_id")
      .join(exact, Seq("q_id", "n_id"), "left_semi").count()
    assert(hits >= 40, s"filtered recall $hits/50 below the planted " +
      "floor 40 — the unfiltered navigation should route to " +
      "qualifying cluster members")
  }

  test("pred = true degenerates to the unfiltered search exactly") {
    val graph = KnnBeam.buildGraph(planted, dims = 32)
      .localCheckpoint(true)
    val qs = planted.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val entry = KnnBeam.seeds(planted, seedCount = 64)
    val plain = KnnBeam.search(graph, planted, qs, entry,
        beam = 24, rounds = 3, topK = 5)
      .select("q_id", "n_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val degenerate = KnnBeam.searchFiltered(graph, planted, qs, entry,
        lit(true), beam = 24, rounds = 3, topK = 5)
      .select("q_id", "n_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(degenerate == plain,
      "searchFiltered(lit(true)) diverged from search()")
  }

  test("a highly selective predicate (one cluster's ids) still fills " +
      "top-5 from that cluster via unfiltered navigation") {
    // qualifying set: ids 640..703 under the ORIGINAL cluster layout
    // are shuffled — use a modulus band (~6% selectivity) instead
    val pred = col("vec_id") % 16 === 3
    val graph = KnnBeam.buildGraph(planted, dims = 32)
      .localCheckpoint(true)
    val qs = planted.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val entry = KnnBeam.seeds(planted, seedCount = 64)
    val got = KnnBeam.searchFiltered(graph, planted, qs, entry, pred,
        beam = 48, rounds = 6, topK = 5)
      .localCheckpoint(true)
    assert(got.filter(col("n_id") % 16 =!= 3).count() == 0L)
    val exact = exactFiltered(planted, pred, 5, 10)
    val hits = got.select("q_id", "n_id")
      .join(exact, Seq("q_id", "n_id"), "left_semi").count()
    // ~6% selectivity: the beam must widen to hold recall; 30/50 is
    // the measured planted floor with margin
    assert(hits >= 30, s"selective-filter recall $hits/50 below 30")
  }
}
