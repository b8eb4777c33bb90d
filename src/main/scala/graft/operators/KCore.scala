package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman 1983) — the 7th
  * graph primitive, and the graph-CLEANING workhorse: the k-core is
  * the maximal subgraph where every node keeps degree ≥ k after all
  * lower-degree nodes are removed, the standard prune before
  * community/centrality work on noisy graphs (a high-degree node
  * whose neighbors are all degree-1 spam drops out of the 3-core even
  * though a plain degree filter would keep it).
  *
  * Peeling is monotone — nodes only ever leave — so a fixed round
  * budget unrolls deterministically and DuckDB can replay identical
  * rounds as CTEs (the PageRank/BfsHops oracle pattern): each round
  * recomputes degrees over the SURVIVING edge set and drops nodes
  * below k; when a round drops nobody the remaining rounds are no-ops
  * and the result is the true k-core.
  *
  * Per round: one map-side-combinable degree aggregate over surviving
  * edges, and the survivor set (node-cardinality) applied back to the
  * edges as two BROADCAST semi-joins while it fits
  * `broadcastNodeLimit` (shuffled semi-joins past it) — the edges are
  * never shuffled. The edge set only shrinks, so round cost is
  * non-increasing. Lineage is localCheckpoint-bounded every
  * `checkpointEvery` rounds with the shared unpersist hygiene.
  *
  * Pass both directions of an undirected graph (degree = in-degree of
  * the symmetric table).
  */
object KCore {

  /** @param inspectRound instrumentation hook (the PageRank pattern):
    *        called with each round's un-checkpointed surviving-edge
    *        plan before it executes, so plan-shape tests can observe
    *        the semi-join shape checkpointing would erase.
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String, k: Long,
      rounds: Int, checkpointEvery: Int = 2,
      broadcastNodeLimit: Long = 5000000L,
      inspectRound: DataFrame => Unit = _ => ()): DataFrame = {
    require(k >= 1, s"k must be at least 1: $k")
    require(rounds >= 0, s"negative rounds: $rounds")
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    // src UNION dst: the alive set is degree-filtered dst nodes, but a
    // caller passing an asymmetric table would make a src-only count
    // understate the broadcast size (the semantics want a symmetric
    // table either way — see scaladoc — but the size gate must not
    // depend on the caller honoring that).
    val nNodes = e.select(col("src").as("n"))
      .unionByName(e.select(col("dst").as("n"))).distinct().count()
    val maybeBroadcast: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeLimit) broadcast _ else identity _
    var prior: Option[DataFrame] = Some(e)
    for (i <- 1 to rounds) {
      val alive = e.groupBy(col("dst").as("node"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("node")
      e = e
        .join(maybeBroadcast(alive.withColumnRenamed("node", "src")),
          Seq("src"), "leftsemi")
        .join(maybeBroadcast(alive.withColumnRenamed("node", "dst")),
          Seq("dst"), "leftsemi")
        .select("src", "dst")
      inspectRound(e)
      if (i % checkpointEvery == 0 || i == rounds) {
        val cp = e.localCheckpoint(true)
        prior.foreach(p =>
          org.apache.spark.sql.graft.bridge.checkpointedRdd(p)
            .foreach(_.unpersist(blocking = false)))
        prior = Some(cp)
        e = cp
      }
    }
    // surviving nodes with their core-subgraph degree
    e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("core_deg"))
  }
}
