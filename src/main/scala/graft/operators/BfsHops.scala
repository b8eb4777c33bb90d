package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS: exact hop distance from a SEED SET through a
  * directed edge table, unrolled to a fixed round budget — the graph
  * primitive behind "how far is this node from the topic/brand/spam
  * cluster" features (PageRank p2/p4 ranks proximity softly; this is
  * the hard distance).
  *
  * Per round the frontier relaxes one hop:
  *
  *   dist_i(v) = min(dist_{i-1}(v), 1 + min over edges u→v of dist_{i-1}(u))
  *
  * implemented as ONE equi-join (current distances ⋈ edges on src) +
  * union + min-aggregate. All-integer distances make the operator
  * value-oracle-checkable: DuckDB unrolls the identical rounds as
  * CTEs and must byte-match (the PageRank pattern, applied to
  * distances).
  *
  * Scale shape: the distance table is at most node-sized while the
  * edge table is |E|, so each round joins the distances INTO the
  * stationary checkpointed edges — BROADCAST while the graph's node
  * count fits `broadcastNodeLimit` (the PageRank rate-into-edges
  * shape: the edges are never shuffled), shuffled equi-join past it.
  * The min-aggregate shuffles only node-sized rows. Lineage is
  * localCheckpoint-bounded every `checkpointEvery` rounds (the
  * ConnectedComponents/PageRank hygiene: a 10-round unroll must not
  * re-derive round 1 ten times, and superseded checkpoint blocks are
  * dropped as soon as the next one materializes).
  */
object BfsHops {

  /** @param inspectRound instrumentation hook (the PageRank pattern):
    *        called with each round's un-checkpointed distance plan
    *        before it executes — checkpointing erases the round's join
    *        shape from the final plan, so plan-shape tests observe it
    *        here.
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      rounds: Int, checkpointEvery: Int = 2,
      broadcastNodeLimit: Long = 5000000L,
      inspectRound: DataFrame => Unit = _ => ()): DataFrame = {
    require(rounds >= 0, s"negative rounds: $rounds")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    // dist can only grow to the reachable node count; checkpointed
    // frames report no size stats, so Spark would never choose the
    // broadcast on its own (the PageRank rule). Count src UNION dst:
    // on a directed graph the reached set includes dst-only sinks, so
    // a src-only count would undercount what actually gets broadcast.
    val nNodes = e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct().count()
    val maybeBroadcast: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeLimit) broadcast _ else identity _
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("d", lit(0L))
    // FRONTIER relaxation: with unit weights a node's first assigned
    // distance is final, so only the nodes reached LAST round (d =
    // i-1) can relax anything new this round — the edges join the
    // frontier, not the whole reached set. Identical fixed point (the
    // oracle's full-table unroll must byte-match), but the joined /
    // broadcast side shrinks from |reached| to |frontier|, which on a
    // dense graph collapses after the first rounds.
    var frontier = dist
    var prior: Option[DataFrame] = None
    for (i <- 1 to rounds) {
      val relaxed = e.as("ee").join(
          maybeBroadcast(frontier.as("dd")), col("dd.node") === col("ee.src"))
        .select(col("ee.dst").as("node"), (col("dd.d") + 1L).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min(col("d")).as("d"))
      inspectRound(dist)
      if (i % checkpointEvery == 0 || i == rounds) {
        val cp = dist.localCheckpoint(true)
        prior.foreach(p =>
          org.apache.spark.sql.graft.bridge.checkpointedRdd(p)
            .foreach(_.unpersist(blocking = false)))
        prior = Some(cp)
        dist = cp
      }
      // derive the next frontier from the (possibly checkpointed)
      // dist so its lineage never re-derives earlier rounds
      frontier = dist.filter(col("d") === i)
    }
    dist.select(col("node"), col("d").as("hops"))
  }
}
