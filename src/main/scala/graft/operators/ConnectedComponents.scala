package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation with pointer
  * jumping — the operator that turns near-duplicate PAIRS (LSH +
  * verification) into duplicate CLUSTERS, so each cluster keeps one
  * canonical document.
  *
  * Each round does two shuffle steps:
  *   1. neighbor min — every node takes the minimum component id among
  *      itself and its neighbors (one hop of propagation);
  *   2. pointer jumping — every node re-reads the component of its
  *      current component (`comp ← comp(comp)`), which squares the
  *      effective propagation distance.
  * Together they converge in O(log diameter) rounds (a 40-hop chain
  * resolves in ~6), each round costing two hash shuffles over the
  * label table. The label sum is monotonically non-increasing and
  * gives an exact convergence test.
  *
  * Iterative DataFrames grow their lineage every round; each round's
  * result is `localCheckpoint`ed so the plan stays constant-size and
  * the optimizer never re-plans the full history (without this, 20+
  * rounds take minutes just in planning and can overflow the stack).
  *
  * Deterministic: min() over ids, no randomness.
  */
object ConnectedComponents {

  /** @param edges undirected edge list (one row per edge, any order)
    * @param inspectRound instrumentation hook: called with each
    *        round's (un-checkpointed) label plan before it executes —
    *        checkpointing erases the round's join shape from the final
    *        plan, so plan-shape tests observe it here
    * @return (id, component) for every node appearing in `edges`,
    *         component = minimum node id reachable from the node
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 25,
      inspectRound: DataFrame => Unit = _ => ()): DataFrame = {
    // localCheckpoint (not persist): the union references `edges`
    // twice, so an un-truncated lineage would compute the caller's
    // (possibly expensive — d8 feeds a whole LSH pipeline) plan twice,
    // and every iteration would re-plan it.
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)

    // coalesce to 0: sum over an empty labels frame is null, and LSH can
    // legitimately produce zero candidate pairs on a clean corpus.
    // ONE job per round: the frame is marked for LAZY local
    // checkpointing, so the convergence-sum action both materializes
    // the round's blocks and returns the sum — running the sum as a
    // separate job on an eager checkpoint doubled the per-round driver
    // round-trips, which dominated wall time once ~90 plans' worth of
    // block-manager state had accumulated in a long bench sweep.
    // INVARIANT: because the checkpoint is lazy, the probe action MUST
    // be a full-scan aggregate that computes EVERY partition (the
    // global sum below is). A partial action (isEmpty/head/limit on
    // the labels frame) would leave some partitions unmaterialized,
    // and later rounds would silently recompute the full untruncated
    // lineage for them.
    def checkpointAndSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val cp = df.localCheckpoint(false)
      val s = cp.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head()
        .getDecimal(0)
      (cp, s)
    }
    // Deterministic block hygiene: once a round's labels are
    // materialized, the PREVIOUS round's checkpoint blocks can never
    // be read again — free them now instead of leaving it to the
    // GC-driven ContextCleaner (whose lag across a 90-query sweep
    // shows up as multi-second inflation of late-running queries).
    def free(df: DataFrame): Unit =
      org.apache.spark.sql.graft.bridge.checkpointedRdd(df)
        .foreach(_.unpersist(blocking = false))

    var (labels, oldSum) = checkpointAndSum(
      sym.select(col("a").as("id")).distinct()
        .withColumn("component", col("id")))

    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // 1. neighbor min
      val viaNeighbors = sym
        .join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("component"))
      val afterMin = labels.select("id", "component").union(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
      // 2. pointer jumping: comp ← comp(comp). Every component value is
      // itself a node id (min over node ids), so the inner self-join is
      // total.
      val mapping = afterMin
        .select(col("id").as("cid"), col("component").as("ccomp"))
      val roundPlan = afterMin
        .join(mapping, afterMin("component") === col("cid"))
        .select(afterMin("id"), col("ccomp").as("component"))
      inspectRound(roundPlan)
      val (next, newSum) = checkpointAndSum(roundPlan)
      free(labels)
      labels = next
      converged = newSum.compareTo(oldSum) == 0
      oldSum = newSum
      it += 1
    }
    // The final labels are self-contained checkpoint blocks — the
    // symmetrized edge table is no longer reachable from any consumer.
    free(sym)
    labels
  }
}
