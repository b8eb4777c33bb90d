package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — the second iterative-graph operator
  * (ConnectedComponents handles reachability; this handles
  * influence/centrality, the ranking a data-curation pipeline uses to
  * weight documents by citation/link structure).
  *
  * All arithmetic is integer: ranks live in micro-units (1.0 ≡
  * 1,000,000), every division is integer division, and the damping
  * update is `150000 + (85 * Σ contrib) div 100` — so the result is
  * bit-identical on ANY engine, which is what makes an iterative
  * floating-point-free oracle possible (the DuckDB side unrolls the
  * same iterations as CTEs).
  *
  * Scale shape: each iteration is one equi-join (edges × ranks,
  * shuffled on the join key) and one aggregation — the standard
  * distributed PageRank round. No driver-side state beyond the loop
  * counter; each round is `localCheckpoint`ed so lineage (and
  * planning time) stays constant across iterations.
  */
object PageRank {

  /** @param edges directed edge list; dangling nodes (no out-edges)
    *              contribute nothing — with symmetric edges every
    *              node has out-degree ≥ 1
    * @return (node, rank) for every node with at least one out-edge,
    *         rank in micro-units after `iterations` damped rounds
    */
  /** @param inspectRound instrumentation hook: called with each
    *        round's (un-checkpointed) rank plan before it executes —
    *        checkpointing erases the round's join shape from the final
    *        plan, so plan-shape tests observe it here
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      broadcastNodeLimit: Long = 5000000L,
      inspectRound: DataFrame => Unit = _ => ()): DataFrame = {
    require(iterations >= 0, "iterations must be non-negative")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
      .localCheckpoint(true)
    // node set = sources (with symmetric input this is all nodes);
    // re-materialized once, reused every round on both sides
    val nodes = deg.select("node").localCheckpoint(true)

    // The rank/degree table is |nodes| rows; the edge table is |E| —
    // usually orders of magnitude bigger. When the node table fits a
    // broadcast, each round joins the (tiny) per-node contribution
    // rate INTO the stationary checkpointed edges — no edge shuffle,
    // ever; the only shuffle left is the map-side-combined contrib
    // aggregation. Past the limit it degrades to a plain shuffled
    // equi-join (checkpointed DataFrames report no size stats, so
    // Spark would never choose the broadcast on its own).
    val nNodes = nodes.count()
    val maybeBroadcast: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeLimit) broadcast _ else identity _

    var rank = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iterations) {
      val rate = rank.join(deg, "node")
        .select(col("node").as("src"), expr("rank div deg").as("c"))
      val contrib = e
        .join(maybeBroadcast(rate), "src")
        .select(col("dst").as("node"), col("c"))
        .groupBy("node")
        .agg(sum("c").as("s"))
      val next = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(s, 0L) div 100"))
            .as("rank"))
      inspectRound(next)
      rank = next.localCheckpoint(true)
    }
    rank
  }
}
