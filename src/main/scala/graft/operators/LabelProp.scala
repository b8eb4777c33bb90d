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
  * FRONTIER-STABILIZED, HYBRID (the BfsHops lesson): a node's next
  * state is a pure function of its in-neighbors' current states, so
  * once no in-neighbor changed between rounds, the node's vote is
  * provably identical and need not be recomputed. Per round we track
  * the CHANGED set (label flipped, node entered, or node dropped out
  * of the labeled domain — all three are state changes an
  * in-neighbor can observe); while it is LARGE (> `frontierFraction`
  * of the nodes — every early round on a fresh graph, where the
  * frontier bookkeeping would only add two edge scans on top of a
  * vote it cannot shrink) the round is the plain full vote, and once
  * it is small the round marks as AFFECTED only the out-neighbors of
  * changed nodes, re-votes exactly those over their FULL
  * in-neighborhood, and carries every other node's state forward
  * untouched. Round 1 is always a full vote: the initial self-labels
  * are not a product of the transition function, so the fixed-point
  * argument does not apply to them (a pure source node must DROP in
  * round 1 even though none of its — zero — in-neighbors changed).
  * When the changed set empties the labeling is a fixed point and
  * the remaining rounds are skipped outright; the final round skips
  * the diff bookkeeping entirely (it only steers future rounds). The
  * unrolled-round output is bit-identical to the naive unroll by
  * induction in every mode mix.
  *
  * Vote mechanics are unchanged: the node-sized label/frontier tables
  * join INTO the stationary checkpointed edge table — broadcast while
  * |nodes| fits `broadcastNodeLimit` (the PageRank rate-into-edges
  * shape), degrading to plain shuffled equi-joins past it. The vote
  * count is a map-side-combinable (node, label) aggregate and the
  * argmax is `max_by(label, (cnt, -label))` — a second aggregate, not
  * a rank window. Labels (and the changed set, on every non-final
  * round) are node-sized and eagerly localCheckpoint-ed per round:
  * the frontier plan references the prior labels three times (vote
  * join, carry-forward anti-join, change diff), so per-round
  * materialization is what keeps the lineage linear instead of
  * exponential; `checkpointEvery` is retained for API compatibility
  * but the per-round cadence supersedes it.
  *
  * On an undirected graph pass both edge directions (the co-purchase
  * edge table already is symmetric). Nodes without in-edges drop out
  * — callers wanting isolates keep them by unioning afterwards.
  */
object LabelProp {

  /** @param inspectRound instrumentation hook (the PageRank pattern):
    *        called once per round with the round's label plan before
    *        it executes, so plan-shape tests can observe the vote-join
    *        shape checkpointing would erase. After the fixed point is
    *        reached it is called with the (stable, checkpointed)
    *        label table so the per-round call count stays `rounds`.
    */
  /** @param frontierFraction changed-set fraction (of the initial node
    *        count) below which a round switches from the full vote to
    *        the frontier recompute; 0 disables the frontier path, 1
    *        forces it from round 2 on.
    */
  def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, checkpointEvery: Int = 2,
      broadcastNodeLimit: Long = 5000000L,
      inspectRound: DataFrame => Unit = _ => (),
      frontierFraction: Double = 0.3): DataFrame = {
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

    def unpersistCp(df: DataFrame): Unit =
      org.apache.spark.sql.graft.bridge.checkpointedRdd(df)
        .foreach(_.unpersist(blocking = false))

    // full mode-vote over the given edge subset, keyed by dst
    def vote(edgeSet: DataFrame): DataFrame = edgeSet
      .join(maybeBroadcast(labels.withColumnRenamed("node", "src")), "src")
      .groupBy(col("dst").as("node"), col("lbl"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("node")
      // argmax by (cnt asc, -lbl asc) == most frequent, then
      // smallest label — lexicographic struct ordering
      .agg(expr("max_by(lbl, struct(cnt, -lbl))").as("lbl"))

    // symmetric state difference between two label tables, restricted
    // to `within` when given (flip, entry, and drop all count)
    def stateDiff(
        oldL: DataFrame, newL: DataFrame,
        within: Option[DataFrame]): DataFrame = {
      def slice(df: DataFrame) = within match {
        case Some(w) => df.join(maybeBroadcast(w), Seq("node"))
        case None => df
      }
      slice(oldL).withColumnRenamed("lbl", "oldLbl")
        .join(slice(newL).withColumnRenamed("lbl", "newLbl"),
          Seq("node"), "full_outer")
        .where(col("oldLbl").isNull || col("newLbl").isNull ||
          col("oldLbl") =!= col("newLbl"))
        .select("node")
    }

    var changed: DataFrame = null // nodes whose state changed last round
    var changedCount = Long.MaxValue
    for (i <- 1 to rounds) {
      if (changedCount == 0L) {
        inspectRound(labels) // stable fixed point: the round is a no-op
      } else {
        // HYBRID round choice: the frontier machinery (2 extra edge
        // scans + carry-forward joins) only pays once the changed set
        // is small — while most nodes are still flipping (every early
        // round on a fresh graph), a plain full vote is cheaper.
        // Round 1 is ALWAYS full: the initial self-labels are not a
        // product of the transition function, so the carry-forward
        // fixed-point argument does not apply (a pure source must
        // drop in round 1 even though none of its zero in-neighbors
        // changed).
        val frontierPays = i > 1 &&
          changedCount <= (frontierFraction * nNodes).toLong
        val (newLabels, affectedOpt) =
          if (!frontierPays) (vote(e), None)
          else {
            // affected = out-neighbors of last round's changed nodes;
            // only they can observe a changed input. Everyone else's
            // vote is provably identical and is carried forward
            // without touching their in-edges.
            val affected = e
              .join(
                maybeBroadcast(changed.withColumnRenamed("node", "src")),
                "src")
              .select(col("dst").as("node")).distinct()
              .localCheckpoint(true)
            val eAffected = e.join(
              maybeBroadcast(affected.withColumnRenamed("node", "dst")),
              "dst")
            val votes = vote(eAffected) // affected nodes with no
            // labeled in-neighbor get no vote row and drop, as in
            // the full vote
            (labels
              .join(maybeBroadcast(affected), Seq("node"), "left_anti")
              .union(votes.select("node", "lbl")), Some(affected))
          }
        inspectRound(newLabels)
        val cpLabels = newLabels.localCheckpoint(true)
        if (i < rounds) {
          // the diff only steers FUTURE rounds — the last round skips
          // it (and its checkpoint) outright
          val newChanged = stateDiff(labels, cpLabels, affectedOpt)
            .localCheckpoint(true)
          if (changed != null) unpersistCp(changed)
          changed = newChanged
          changedCount = changed.count()
        }
        unpersistCp(labels)
        affectedOpt.foreach(unpersistCp)
        labels = cpLabels
      }
    }
    if (changed != null) unpersistCp(changed)
    labels.select(col("node"), col("lbl").as("label"))
  }
}
