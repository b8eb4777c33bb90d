package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate-nearest-neighbor search — the fourth ANN
  * architecture beside IVF (IvfIndex), PQ (PqIndex), and LSH
  * (SemanticDedup), and the one most production vector stores
  * actually deploy (NSW/HNSW family: Malkov & Yashunin 2018). Two
  * phases, both DataFrame-native:
  *
  * **Graph build** — a k-NN graph from the SemanticDedup SRP-LSH
  * candidate machinery (banded signature equi-joins, never an
  * all-pairs scan): candidate pairs within `maxHamming` signature
  * bits are scored with the codegen'd exact cosine, SYMMETRIZED
  * (NSW graphs are navigable in both directions), and cut to each
  * node's `graphDegree` best neighbors with a per-node window — edge
  * rows (node, nbr), ~n·degree of them, the index that replaces the
  * corpus cross join.
  *
  * **Beam search** — the BfsHops fixed-round unroll applied to
  * best-first navigation: seed each query with a deterministic
  * strided entry set scored exactly, then per round expand the
  * current beam's out-neighbors (an equi-join of the q·beam frontier
  * into the edge table), fetch candidate vectors with an id
  * equi-join against the corpus, score, merge, and keep the `beam`
  * best per query (window over q·(beam·degree) rows — query-sized,
  * never corpus-sized). A fixed `rounds` budget replaces HNSW's
  * greedy convergence test so the whole search is a static plan;
  * dedup across rounds is the merge window itself.
  *
  * Scale shape: graph build is the LSH-join cost (the d4/s7 family's
  * banded equi-join, linear in collisions); search cost per round is
  * q·beam·degree candidate rows joined against the corpus on id — at
  * 100 TB that fetch runs against an id-bucketed corpus layout, so
  * it is a co-located lookup join, and NO round touches more than
  * beam·degree vectors per query. Every step is deterministic (ties
  * break on id everywhere), so results are reproducible and the
  * s5-style recall-floor contract is hash-checkable.
  */
object KnnBeam {

  /** (node, nbr) edge rows: each node's `graphDegree` nearest LSH
    * candidates by exact cosine, symmetrized THEN cut (so a hub can
    * still be entered from the nodes that chose it), then improved by
    * `refineRounds` of NN-DESCENT (Dong, Moses & Li 2011): per round,
    * each node's candidate set grows by its neighbors' neighbors (the
    * wedge join — bounded at degree² candidates per node by the cut,
    * so n·degree² rows total, linear in n at fixed degree), scores
    * exactly, and re-cuts to the `graphDegree` best. On corpora where
    * LSH collisions are weakly informative (high-dim near-random
    * vectors), a couple of descent rounds is what turns the graph
    * from "random candidates" into a navigable k-NN graph — the
    * published construction real NSW stacks use at scale.
    *
    * Isolated nodes (no band collision within `maxHamming`) have no
    * edges — entry seeds, not graph repair, are what bounds their
    * recall cost.
    */
  def buildGraph(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dims: Int = 64,
      graphDegree: Int = 8,
      maxHamming: Int = 16,
      refineRounds: Int = 2): DataFrame = {
    require(graphDegree >= 1, s"graphDegree must be positive: $graphDegree")
    require(refineRounds >= 0, s"negative refineRounds: $refineRounds")
    val c = emb.select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    val w = Window.partitionBy("node")
      .orderBy(col("cosine").desc, col("nbr"))
    def cut(scored: DataFrame): DataFrame = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= graphDegree)
      .select("node", "nbr")
    def score(cand: DataFrame): DataFrame = cand
      .join(c, cand("node") === c("__cid"))
      .withColumnRenamed("__cv", "qv").drop("__cid")
      .join(c, cand("nbr") === c("__cid"))
      .withColumnRenamed("__cv", "nv").drop("__cid")
      .withColumn("cosine", graft.functions.VectorExprs
        .cosine_similarity(col("qv"), col("nv")))
      .select("node", "nbr", "cosine")

    val pairs = SemanticDedup
      .verifiedPairs(emb, idCol, vecCol, dims, maxHamming,
        minCosine = -1.0)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
    val sym = pairs
      .select(col("vec_a").as("node"), col("vec_b").as("nbr"),
        col("cosine"))
      .unionByName(pairs.select(col("vec_b").as("node"),
        col("vec_a").as("nbr"), col("cosine")))
    var graph = cut(sym).localCheckpoint(true)
    for (_ <- 1 to refineRounds) {
      // wedge candidates: neighbors-of-neighbors through the CURRENT
      // graph, both orientations (an undirected descent step), capped
      // at degree² per node by construction
      val hop2 = graph.as("a")
        .join(graph.as("b"), col("a.nbr") === col("b.node"))
        .select(col("a.node").as("node"), col("b.nbr").as("nbr"))
        .filter(col("node") =!= col("nbr"))
      val cands = graph
        .unionByName(graph.select(col("nbr").as("node"),
          col("node").as("nbr")))
        .unionByName(hop2)
        .distinct()
      val next = cut(score(cands)).localCheckpoint(true)
      org.apache.spark.sql.graft.bridge.checkpointedRdd(graph)
        .foreach(_.unpersist(blocking = false))
      graph = next
    }
    graph
  }

  /** Deterministic entry points: every `seedStride`-th id. A narrow
    * filter over the corpus — no sort, no sample action — and spread
    * uniformly over the id space so every region of the graph has a
    * nearby entry.
    */
  def seeds(
      emb: DataFrame, idCol: String = "vec_id",
      seedStride: Int = 31): DataFrame = {
    require(seedStride >= 1, s"seedStride must be positive: $seedStride")
    emb.filter(pmod(col(idCol), lit(seedStride.toLong)) === 0L)
      .select(col(idCol).as("node"))
  }

  /** Beam-search `topK` cosine neighbors of each query over a
    * pre-built graph. `queries` = (qIdCol, qVecCol); `corpus` =
    * (idCol, vecCol); output (q_id, n_id, rank, sim) with rank 1 the
    * best. Self-matches (q_id == n_id) are excluded, mirroring the
    * exact top-k definition the recall contract compares against.
    */
  def search(
      graph: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      entry: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      qIdCol: String = "q_id",
      qVecCol: String = "qv",
      beam: Int = 12,
      rounds: Int = 3,
      topK: Int = 5): DataFrame = {
    require(beam >= topK, s"beam $beam must cover topK $topK")
    require(rounds >= 0, s"negative rounds: $rounds")
    val q = queries
      .select(col(qIdCol).as("q_id"), col(qVecCol).as("qv"))
      .localCheckpoint(true)
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("nv"))
    val sim = graft.functions.VectorExprs
      .cosine_similarity(col("qv"), col("nv"))
    val wBeam = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id"))

    def keepBest(scored: DataFrame, limit: Int): DataFrame = scored
      .withColumn("__rn", row_number().over(wBeam))
      .filter(col("__rn") <= limit)
      .drop("__rn")

    // round 0: score the strided entry set against every query — the
    // seed table is tiny by construction, so this cross product is
    // q·seeds rows with the query side broadcast
    var cur = keepBest(
      broadcast(q)
        .crossJoin(entry.join(c, entry("node") === c("n_id")).drop("node"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", sim)
        .select("q_id", "n_id", "sim"), beam)
      .localCheckpoint(true)

    for (_ <- 1 to rounds) {
      // expand the beam's out-neighbors; the (q_id, n_id) frontier is
      // query-sized (q·beam rows) and joins INTO the stationary edge
      // table, then fetches exactly the candidate vectors by id
      val cand = cur.select(col("q_id"), col("n_id").as("node"))
        .join(graph, "node")
        .select(col("q_id"), col("nbr").as("n_id"))
        .distinct()
      val scored = cand
        .join(c, "n_id")
        .join(broadcast(q), "q_id")
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("sim", sim)
        .select("q_id", "n_id", "sim")
      // merge + dedup: a candidate already in the beam re-scores to
      // the identical sim (cosine is deterministic), so max() per
      // (q_id, n_id) collapses duplicates without a distinct pass
      val next = keepBest(
        cur.unionByName(scored)
          .groupBy("q_id", "n_id").agg(max("sim").as("sim")), beam)
        .localCheckpoint(true)
      org.apache.spark.sql.graft.bridge.checkpointedRdd(cur)
        .foreach(_.unpersist(blocking = false))
      cur = next
    }
    keepBest(cur, topK)
      .withColumn("rank", row_number().over(wBeam).cast("long"))
  }
}
