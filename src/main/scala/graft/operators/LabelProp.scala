package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synchronous label propagation (Raghavan et al. 2007)
  * — community detection by majority vote, the 5th graph primitive
  * beside centrality (PageRank), components (ConnectedComponents),
  * triangles (TriangleCount), and distances (BfsHops). Communities
  * differ from connected components: a component can contain several
  * densely-knit communities bridged by a few edges, and LPA's
  * majority rule finds the dense cores where min-label propagation
  * would flood the whole component with one id.
  *
  * Each node starts labeled with itself; per round every node adopts
  * the MOST FREQUENT label among its in-neighbors, ties broken by the
  * SMALLEST label — the deterministic variant of classic LPA (the
  * randomized original is not oracle-checkable), unrolled to a fixed
  * round budget like PageRank/BfsHops so DuckDB can replay identical
  * rounds as CTEs and byte-match.
  *
  * Per round the node-sized label table joins INTO the stationary
  * checkpointed edge table — broadcast while |nodes| fits
  * `broadcastNodeLimit` (the PageRank rate-into-edges shape: the
  * edges are never shuffled), degrading to a plain shuffled
  * equi-join past it. The vote count is a map-side-combinable
  * (node, label) aggregate and the argmax is `max_by(label,
  * (cnt, -label))` — a second aggregate, not a rank window (a window
  * would sort every node partition). State is one (node, label) row
  * per node. Lineage is localCheckpoint-bounded every
  * `checkpointEvery` rounds with the shared unpersist hygiene.
  *
  * On an undirected graph pass both edge directions (the co-purchase
  * edge table already is symmetric). Nodes without in-edges drop out
  * — callers wanting isolates keep them by unioning afterwards.
  */
object LabelProp {

  /** @param inspectRound instrumentation hook (the PageRank pattern):
    *        called with each round's un-checkpointed label plan before
    *        it executes, so plan-shape tests can observe the vote-join
    *        shape checkpointing would erase.
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, checkpointEvery: Int = 2,
      broadcastNodeLimit: Long = 5000000L,
      inspectRound: DataFrame => Unit = _ => ()): DataFrame = {
    require(rounds >= 0, s"negative rounds: $rounds")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    // checkpointed frames report no size stats — Spark would never
    // choose the broadcast on its own (the PageRank rule)
    val nNodes = labels.count()
    val maybeBroadcast: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeLimit) broadcast _ else identity _
    var prior: Option[DataFrame] = Some(labels)
    for (i <- 1 to rounds) {
      labels = e.join(
          maybeBroadcast(labels.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        // argmax by (cnt asc, -lbl asc) == most frequent, then
        // smallest label — lexicographic struct ordering
        .agg(expr("max_by(lbl, struct(cnt, -lbl))").as("lbl"))
      inspectRound(labels)
      if (i % checkpointEvery == 0 || i == rounds) {
        val cp = labels.localCheckpoint(true)
        prior.foreach(p =>
          org.apache.spark.sql.graft.bridge.checkpointedRdd(p)
            .foreach(_.unpersist(blocking = false)))
        prior = Some(cp)
        labels = cp
      }
    }
    labels.select(col("node"), col("lbl").as("label"))
  }
}
