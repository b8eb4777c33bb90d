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
  * FIXED-SIZE entry set scored exactly (an absolute seed count, NOT a
  * corpus fraction — the round-13 lesson: a fractional stride made
  * round 0 an O(n) scan per query, a constant-factor saving over the
  * exact scan rather than an index; HNSW bounds the same entry
  * problem with its O(1)-entry top layer), then per round expand the
  * current beam's out-neighbors (an equi-join of the q·beam frontier
  * into the edge table), fetch candidate vectors with an id
  * equi-join against the corpus, score, merge, and keep the `beam`
  * best per query (window over q·(beam·degree) rows — query-sized,
  * never corpus-sized). A fixed `rounds` budget replaces HNSW's
  * greedy convergence test so the whole search is a static plan;
  * dedup across rounds is the merge window itself.
  *
  * Scale shape: graph build is the LSH-join cost (the d4/s7 family's
  * banded equi-join, linear in collisions) plus the bounded
  * n·degree² NN-descent rounds; search SCORES O(seeds + rounds·beam·
  * degree) vectors per query — corpus-independent — while the
  * per-round candidate FETCH is an id equi-join against the corpus
  * (locally a narrow scan + tiny-side broadcast probe; at 100 TB an
  * id-bucketed corpus layout makes it a co-located lookup join).
  * Every step is deterministic (ties break on id everywhere), so
  * results are reproducible and the s5-style recall-floor contract
  * is hash-checkable.
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

  /** Deterministic entry points: a FIXED ABSOLUTE number of seeds
    * (~`seedCount`, independent of corpus size), spread uniformly
    * over the id space — the stride is derived from the corpus count
    * at build time (one cheap count action, amortized over every
    * query the index serves), so round 0 of [[search]] scores
    * O(seedCount) vectors per query at ANY corpus size. This is the
    * flat stand-in for HNSW's top layer: a bounded entry set the
    * greedy descent starts from. seedCount trades entry coverage
    * (recall on isolated graph regions) against round-0 cost —
    * recalibrate the recall floor when changing it.
    *
    * The count is approximate for SPARSE id spaces (stride filtering
    * keeps ids ≡ 0 mod stride, exact only when ids are contiguous
    * from 0 — the embeddings contract); any deterministic O(seedCount)
    * node set works as an entry table, so callers with sparse ids can
    * supply their own.
    */
  def seeds(
      emb: DataFrame, idCol: String = "vec_id",
      seedCount: Int = 128): DataFrame = {
    require(seedCount >= 1, s"seedCount must be positive: $seedCount")
    val n = emb.count()
    val stride = math.max(1L, n / seedCount.toLong)
    emb.filter(pmod(col(idCol), lit(stride)) === 0L)
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

    // round 0: score the entry set against every query — the seed
    // table is a fixed ABSOLUTE size (seeds() derives its stride from
    // the corpus count), so this cross product is q·O(seedCount) rows
    // at any corpus size, with the query side broadcast
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
