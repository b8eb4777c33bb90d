package graft

import graft.operators.KnnBeam
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-ANN beam search: graph-build contracts (degree cut,
  * determinism), beam monotonicity in the round budget, and recall
  * against the exact brute force on planted clusters — the fixture
  * where a navigable k-NN graph should shine (s14's corpus-level
  * recall floor covers the near-unclustered case).
  */
class KnnBeamSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private val cosine = graft.functions.VectorExprs
    .cosine_similarity(col("qv"), col("nv"))

  // the IvfIndexSpec planted fixture (same seed and shape, 32-d):
  // 16 well-separated spherical clusters × 64 members
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
    shuffled.toDF("vec_id", "embedding")
  }

  private def exactTopK(
      corpus: DataFrame, topk: Int, nQueries: Int): DataFrame = {
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

  private def beamTopK(
      corpus: DataFrame, dims: Int, rounds: Int,
      nQueries: Int): DataFrame = {
    val graph = KnnBeam.buildGraph(corpus, dims = dims)
    val qs = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    KnnBeam.search(graph, corpus, qs, KnnBeam.seeds(corpus),
        beam = 12, rounds = rounds, topK = 5)
      .select("q_id", "n_id")
  }

  private def recallAt5(
      corpus: DataFrame, dims: Int, rounds: Int,
      nQueries: Int): Double = {
    val exact = exactTopK(corpus, 5, nQueries)
    beamTopK(corpus, dims, rounds, nQueries)
      .intersect(exact).count().toDouble / exact.count()
  }

  test("graph degree is cut to graphDegree and edges are real ids") {
    val graph = KnnBeam.buildGraph(emb, graphDegree = 4)
    val tooFat = graph.groupBy("node").count()
      .filter(col("count") > 4).count()
    assert(tooFat == 0L, "a node exceeds the degree cut")
    val ids = emb.select(col("vec_id").as("nbr"))
    assert(graph.join(ids, Seq("nbr"), "left_anti").count() == 0L,
      "an edge points at a non-corpus id")
    assert(graph.filter(col("node") === col("nbr")).count() == 0L,
      "self-loop in the k-NN graph")
  }

  test("graph build and search are deterministic run-to-run") {
    val a = beamTopK(emb, 64, rounds = 2, nQueries = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = beamTopK(emb, 64, rounds = 2, nQueries = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("recall@5 on planted clusters is near-perfect, and rounds only " +
      "help: the beam is monotone in its round budget") {
    val r0 = recallAt5(planted, 32, rounds = 0, nQueries = 20)
    val r3 = recallAt5(planted, 32, rounds = 3, nQueries = 20)
    assert(r3 >= r0,
      s"recall dropped with more rounds: $r3 < $r0")
    assert(r3 >= 0.85, s"recall@5 on structured data = $r3 — the beam " +
      "is not navigating to planted neighborhoods")
  }

  test("search rejects a beam narrower than topK") {
    intercept[IllegalArgumentException] {
      KnnBeam.search(emb.limit(0), emb, emb.limit(0), emb.limit(0),
        beam = 3, rounds = 1, topK = 5)
    }
  }

  private def hitsOf(corpus: DataFrame, graph: DataFrame): Long = {
    val exact = exactTopK(corpus, 5, 10).localCheckpoint(true)
    val qs = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    KnnBeam.search(graph, corpus, qs, KnnBeam.seeds(corpus),
        beam = 24, rounds = 4, topK = 5)
      .select("q_id", "n_id")
      .join(exact, Seq("q_id", "n_id"), "left_semi").count()
  }

  test("insertBatch maintains the graph contracts: degree cut holds, " +
      "batch nodes are searchable, untouched nodes' edges pass " +
      "through byte-identical, and the result is deterministic") {
    val base = emb.filter(col("vec_id") % 10 < 8)
    val batch = emb.filter(col("vec_id") % 10 >= 8)
    val g0 = KnnBeam.buildGraph(base).localCheckpoint(true)
    val g1 = KnnBeam.insertBatch(g0, base, batch)
    // degree cut
    assert(g1.groupBy("node").count().filter(col("count") > 8)
      .count() == 0L, "a node exceeds the degree cut after insert")
    // batch nodes with any LSH candidate have edges (on this corpus
    // every batch node collides somewhere)
    val batchWithEdges = g1.join(
      batch.select(col("vec_id").as("node")), Seq("node"), "left_semi")
      .select("node").distinct().count()
    assert(batchWithEdges > 0L, "no batch node entered the graph")
    // untouched base nodes keep their exact edge rows
    val affected = g1.join(g0, Seq("node", "nbr"), "left_anti")
      .select("node").distinct()
    val untouched = g0.join(affected, Seq("node"), "left_anti")
      .join(batch.select(col("vec_id").as("node")),
        Seq("node"), "left_anti")
    assert(untouched.join(g1, Seq("node", "nbr"), "left_anti")
      .count() == 0L, "an untouched node lost an edge")
    // determinism
    val a = KnnBeam.insertBatch(g0, base, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = KnnBeam.insertBatch(g0, base, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("one NN-descent round is bit-identical to the inline reference " +
      "formulation — any future reformulation (e.g. stored-cosine " +
      "reuse, measured-and-rejected in round 16) must stay bit-exact") {
    // reference: ONE descent round spelled out inline — candidates =
    // edges ∪ reverse ∪ wedges, all re-scored from vectors —
    // applied to the same deterministic refine-0 base
    val g0 = KnnBeam.buildGraph(emb, refineRounds = 0)
      .localCheckpoint(true)
    val c = emb.select(col("vec_id").as("__cid"),
      col("embedding").as("__cv"))
    val w = Window.partitionBy("node")
      .orderBy(col("cosine").desc, col("nbr"))
    def score(cand: DataFrame): DataFrame = cand
      .join(c, cand("node") === c("__cid"))
      .withColumnRenamed("__cv", "qv").drop("__cid")
      .join(c, cand("nbr") === c("__cid"))
      .withColumnRenamed("__cv", "nv").drop("__cid")
      .withColumn("cosine", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
      .select("node", "nbr", "cosine")
    val edges = g0.select("node", "nbr")
    val hop2 = edges.as("a")
      .join(edges.as("b"), col("a.nbr") === col("b.node"))
      .select(col("a.node").as("node"), col("b.nbr").as("nbr"))
      .filter(col("node") =!= col("nbr"))
    val cands = edges
      .unionByName(edges.select(col("nbr").as("node"),
        col("node").as("nbr")))
      .unionByName(hop2)
      .distinct()
    val reference = score(cands)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 8)
      .select("node", "nbr", "cosine")
    def bits(g: DataFrame): Set[(Long, Long, Long)] =
      g.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    val optimized = KnnBeam.buildGraph(emb, refineRounds = 1)
    assert(bits(optimized) == bits(reference),
      "stored-edge descent diverged from the full re-score — the " +
        "optimization must be bit-exact, not approximately equal")
  }

  test("serveBudget matches both measured pins: (32, 4) at every " +
      "bundled corpus (degree 8 — beam 32 is s28's calibrated " +
      "filtered config), (128, 8) at the 200k decade (degree 32 — " +
      "the cheapest swept config holding the 20/50 floor)") {
    assert(KnnBeam.serveBudget(500L) == (32, 4))
    assert(KnnBeam.serveBudget(2000L) == (32, 4))
    assert(KnnBeam.serveBudget(4096L) == (32, 4))
    assert(KnnBeam.serveBudget(200000L) == (128, 8))
    assert(KnnBeam.serveBudget(200000000L) == (128, 8))
  }

  test("seeds is O(seedCount) and deterministic on a SPARSE id space " +
      "where an id-stride filter degenerates (round-15 verdict item)") {
    // spread the contiguous ids across a huge sparse range: the old
    // `id % stride == 0` rule selects every multiplied id (the odd
    // factor is coprime to small strides) — a corpus-sized entry set
    val sparse = emb.select((col("vec_id") * 1000003L).as("vec_id"),
      col("embedding"))
    val n = sparse.count()
    val got = KnnBeam.seeds(sparse, seedCount = 64)
    val k = got.count()
    assert(k >= 16 && k <= 4 * 64,
      s"hash-threshold seeds selected $k of $n sparse ids — " +
        "expected ~64 (O(seedCount), not O(n) and not zero)")
    val again = KnnBeam.seeds(sparse, seedCount = 64)
      .collect().map(_.getLong(0)).toSet
    assert(again == got.collect().map(_.getLong(0)).toSet,
      "seeds must be deterministic")
  }

  test("insertBatch recall delta vs a full rebuild is bounded on the " +
      "bundled corpus (measured 42 vs 41 of 50 at sf0.001; the " +
      "contract is >= rebuild - 6, the max tri-scale delta + 1)") {
    val base = emb.filter(col("vec_id") % 10 < 8)
    val batch = emb.filter(col("vec_id") % 10 >= 8)
    val inc = KnnBeam.insertBatch(
      KnnBeam.buildGraph(base), base, batch)
    val rebuilt = KnnBeam.buildGraph(emb)
    val (hInc, hRe) = (hitsOf(emb, inc), hitsOf(emb, rebuilt))
    assert(hInc >= hRe - 6,
      s"incremental recall fell too far below rebuild: $hInc vs $hRe")
    assert(hInc >= 20, s"incremental graph recall floor: $hInc")
  }
}
